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
    parser.add_argument("--scheduler", choices=["auto", "continuous", "request"],
                        default="auto",
                        help="decode-level continuous batching vs request-level "
                        "batching; auto picks by measured dispatch latency")
    parser.add_argument("--paged", action="store_true",
                        help="paged KV cache for the continuous scheduler "
                        "(with int8 kv_cache_dtype this is the fastest AND "
                        "highest-capacity configuration — PERF.md)")
    parser.add_argument("--slots", type=int, default=32,
                        help="continuous scheduler: persistent KV slots")
    parser.add_argument("--max_new_tokens", type=int, default=256,
                        help="continuous scheduler: per-request token budget cap")
    parser.add_argument("--speculative_k", type=int, default=0,
                        help="self-speculative decoding lookahead (greedy "
                        "requests; 0 = off). Drives the engine's one-shot "
                        "path AND the continuous scheduler's speculative "
                        "decode chunks (infer/slots.py spec_k)")
    parser.add_argument("--drain_timeout", type=float, default=30.0,
                        help="SIGTERM/SIGINT: seconds to let in-flight "
                        "requests finish (new requests get 503) before exit")
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

    continuous = {"auto": "auto", "continuous": True, "request": False}[args.scheduler]
    serve(
        load_config(args.config),
        host=args.host,
        port=args.port,
        warmup=not args.no_warmup,
        server_kwargs=dict(
            continuous=continuous,
            paged=args.paged,
            n_slots=args.slots,
            max_new_tokens=args.max_new_tokens,
            spec_k=args.speculative_k,
        ),
        drain_timeout=args.drain_timeout,
        audio_encoder_checkpoint=args.audio_encoder_checkpoint,
        repetition_penalty=args.repetition_penalty,
        speculative_k=args.speculative_k,
        mesh=mesh,
    )


if __name__ == "__main__":
    main()
