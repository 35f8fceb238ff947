"""Export a checkpoint's scoring program as a serialized StableHLO artifact.

    python -m coskad_tpu.cli.export --ckpt best.ckpt --out model.czip
    python -m coskad_tpu.cli.export --ckpt best.ckpt --out model.czip \
        --batch-size 512 --platforms cpu,tpu

The artifact (export_hlo.py) is self-contained: parameters, BN statistics
and geometry state are baked into the program, so deployment loads it with
`coskad_tpu.export_hlo.load_artifact` (jax + that module only — no model
code, no checkpoint parsing) and gets scores bit-identical to
serve.AnomalyScorer. The reference has no deployment format at all; this
is TPU-build serving infrastructure (reference eval_COSKAD.py:115 is its
only inference path).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Serialize a COSKAD-TPU scoring program (jax.export)")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", required=True, help="artifact zip to write")
    parser.add_argument("--config", default=None,
                        help="config YAML (default: the <ckpt>.config.json "
                             "snapshot written at train time)")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="fixed batch dimension; default exports a "
                             "symbolic batch (any request size)")
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="comma-separated lowering targets "
                             "(default: cpu,tpu — one artifact for both)")
    parser.add_argument("--in-channels", type=int, default=None,
                        help="input channels (default: the training window "
                             "layout, num_coords + confidence)")
    args = parser.parse_args(argv)

    from ..export_hlo import export_scorer
    from ..serve import AnomalyScorer

    cfg = None
    if args.config is not None:
        from .common import load_config

        cfg = load_config(args.config)
    scorer = AnomalyScorer.from_checkpoint(args.ckpt, cfg=cfg)
    meta = export_scorer(
        scorer,
        args.out,
        batch_size=args.batch_size,
        platforms=[p.strip() for p in args.platforms.split(",") if p.strip()],
        in_channels=args.in_channels,
    )
    print(json.dumps({
        "artifact": args.out,
        "variant": meta["variant"],
        "platforms": meta["platforms"],
        "batch_size": meta["batch_size"],
        "in_channels": meta["in_channels"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
