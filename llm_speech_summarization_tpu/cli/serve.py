"""Serving CLI: batched HTTP inference server.

Usage:
  python -m llm_speech_summarization_tpu.cli.serve -c <yaml> \
      [-p <encoder_ckpt>] [--port 8080]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-p", "--audio_encoder_checkpoint", type=str, default=None)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip the admission-shape compile warmup "
                        "(first requests of each batch shape then stall)")
    parser.add_argument("--repetition_penalty", type=float, default=1.0)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree: shard the frozen LLM "
                        "over a 'model' mesh axis of this size (e.g. --tp 8 "
                        "on a v5e-8). 1 = single-device serving.")
    args = parser.parse_args(argv)

    from ..configs import load_config
    from ..serve.server import serve

    mesh = None
    if args.tp > 1:
        from ..parallel.mesh import distributed_init, mesh_from_devices

        distributed_init()  # no-op single-process; joins a pod if configured
        # data=-1: leftover devices form a (replicated) data axis; the
        # intended deploy shape is tp == visible devices (docs/DESIGN.md
        # "Serving on a mesh" — per-chip replicas beat tp<n here)
        mesh = mesh_from_devices(data=-1, model=args.tp)

    serve(
        load_config(args.config),
        host=args.host,
        port=args.port,
        warmup=not args.no_warmup,
        audio_encoder_checkpoint=args.audio_encoder_checkpoint,
        repetition_penalty=args.repetition_penalty,
        mesh=mesh,
    )


if __name__ == "__main__":
    main()
