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
    args = parser.parse_args(argv)

    from ..configs import load_config
    from ..serve.server import serve

    serve(
        load_config(args.config),
        host=args.host,
        port=args.port,
        warmup=not args.no_warmup,
        audio_encoder_checkpoint=args.audio_encoder_checkpoint,
        repetition_penalty=args.repetition_penalty,
    )


if __name__ == "__main__":
    main()
