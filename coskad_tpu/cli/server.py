"""Long-running scoring server.

    python -m coskad_tpu.cli.server --ckpt exp/UBnormal/run/best.ckpt
    python -m coskad_tpu.cli.server --artifact scorer.zip --port 8800

Backends: a training checkpoint (full surface: windows/raw windows/clip
JSON/streaming sessions) or a `cli.export` StableHLO artifact (windows-only
scoring with NO model code on the serving host). Routes and the request
formats are documented in coskad_tpu/http_server.py.

The reference repo has nothing comparable — its only inference path is
re-running eval_COSKAD.py with the whole dataset tree on disk.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="coskad-server", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt", help="training checkpoint (.ckpt)")
    src.add_argument("--artifact",
                     help="serialized scoring artifact (cli.export zip)")
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (default loopback; set 0.0.0.0 "
                        "explicitly to expose the server)")
    p.add_argument("--port", type=int, default=8800)
    p.add_argument("--min-batch", type=int, default=256,
                   help="default device-batch threshold for new streaming "
                        "sessions (amortizes the per-dispatch RTT)")
    p.add_argument("--max-streams", type=int, default=64)
    p.add_argument("--verbose", action="store_true",
                   help="log one line per request to stderr")
    args = p.parse_args(argv)

    # Persistent compile cache: without it every server START recompiles
    # the scoring programs, and every request-size bucket compiles live
    # while HOLDING the device lock — observed wedging the soak for
    # minutes per new bucket (scripts/soak_server.py; RESULTS.md round 5).
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()

    from ..http_server import ScoringService, build_server

    if args.ckpt:
        from ..serve import AnomalyScorer

        backend = {"scorer": AnomalyScorer.from_checkpoint(args.ckpt)}
        source = args.ckpt
    else:
        from ..export_hlo import load_artifact

        backend = {"artifact": load_artifact(args.artifact)}
        source = args.artifact

    service = ScoringService(source=source, min_batch=args.min_batch,
                             max_streams=args.max_streams, **backend)
    server = build_server(service, args.host, args.port,
                          verbose=args.verbose)
    host, port = server.server_address[:2]
    print(f"[server] {service.model_info()['backend']} backend from "
          f"{source}", flush=True)
    print(f"[server] listening on http://{host}:{port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
