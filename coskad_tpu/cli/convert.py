"""Convert checkpoints between the reference (PyTorch-Lightning) format and
coskad_tpu, in either direction.

Import (default):

    python -m coskad_tpu.cli.convert --config <yaml> --ckpt <lightning.ckpt> \
        [--scaler robust.pkl] [--out converted.ckpt]

Export (a TPU-trained checkpoint back to the reference torch ecosystem):

    python -m coskad_tpu.cli.convert --config <yaml> --to-torch \
        --ckpt <coskad.ckpt> --out <lightning_style.ckpt>

The config is the same reference-format YAML the other CLIs take (it tells
the converter which model variant/shape to build); --scaler ingests the
reference's fitted-RobustScaler pickle for robust-normalized datasets
(utils/dataset.py:176-179). The imported output is a standard coskad_tpu
msgpack checkpoint: evaluate it with ``cli.eval --ckpt <out>`` or fine-tune
with ``cli.train --resume`` after placing it at <ckpt_dir>/last.ckpt. See
coskad_tpu/interop.py for the weight-layout translation rules.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert checkpoints between the reference Lightning "
                    "format and coskad_tpu (default: import; --to-torch: "
                    "export)")
    parser.add_argument("-c", "--config", required=True,
                        help="reference-format YAML describing the model")
    parser.add_argument("--ckpt", required=True,
                        help="reference PyTorch-Lightning .ckpt path")
    parser.add_argument("--scaler", default=None,
                        help="reference robust.pkl (fitted sklearn "
                             "RobustScaler pickle) to embed")
    parser.add_argument("--out", default=None,
                        help="output path (default <ckpt_dir>/converted.ckpt)")
    parser.add_argument("--allow-missing-scaler", action="store_true",
                        help="convert a robust-normalized config without its "
                             "robust.pkl (eval will re-fit on the test split "
                             "— scores will NOT match the reference run)")
    parser.add_argument("--to-torch", action="store_true",
                        help="reverse direction: --ckpt is a coskad_tpu "
                             "checkpoint, --out a reference-format torch file")
    args = parser.parse_args(argv)

    from ..interop import convert_checkpoint, export_checkpoint
    from .common import load_config

    cfg = load_config(args.config)
    if args.to_torch:
        if not args.out:
            parser.error("--to-torch requires --out")
        out = export_checkpoint(args.ckpt, cfg, args.out)
        print(f"[coskad] exported {args.ckpt} -> {out} (reference format)")
        if args.scaler:
            # The reference keeps the fitted scaler as a SEPARATE pickle
            # next to its checkpoints (exp_dir/robust.pkl,
            # utils/dataset.py:176-179); --scaler was previously accepted
            # and silently dropped in this direction (round-5 review).
            import shutil

            dst = os.path.join(os.path.dirname(os.path.abspath(out)),
                               "robust.pkl")
            shutil.copyfile(args.scaler, dst)
            print(f"[coskad] copied scaler pickle -> {dst} (the reference "
                  "loads it from the experiment directory)")
        return out
    out = convert_checkpoint(args.ckpt, cfg, out_path=args.out,
                             scaler_path=args.scaler,
                             allow_missing_scaler=args.allow_missing_scaler)
    print(f"[coskad] converted {args.ckpt} -> {out}")
    print(f"[coskad] evaluate with: python -m coskad_tpu.cli.eval "
          f"--config {args.config} --ckpt {out}")
    return out


if __name__ == "__main__":
    main()
