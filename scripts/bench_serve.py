"""Serving load test on the real chip (PERF.md serving section).

Spins up SummarizationServer (continuous batching by default; pass
--request-level for the round-1 batcher) with the full-size llama3_hubert
config, fires N concurrent audio POSTs with MIXED token budgets, and
reports req/s plus per-budget latency percentiles — the short-budget
p50 finishing well before the long-budget p50 is the continuous-batching
signature (a request-level batcher holds shorts hostage to the longest
co-batched budget).
"""

from __future__ import annotations

import argparse
import base64
import http.client
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")
from llm_speech_summarization_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--short-tokens", type=int, default=16)
    p.add_argument("--long-tokens", type=int, default=64)
    p.add_argument("--port", type=int, default=8123)
    p.add_argument("--request-level", action="store_true")
    p.add_argument("--paged", action="store_true",
                   help="continuous mode with the paged KV cache")
    p.add_argument("--n-slots", type=int, default=64)
    p.add_argument("--spec-k", type=int, default=0,
                   help="continuous mode: speculative decode chunks "
                   "(infer/slots.py spec_k; greedy loads only)")
    p.add_argument("--arrival-rate", type=float, default=0.0,
                   help="sustained mode: Poisson arrivals at this req/s "
                   "for --duration seconds instead of one burst — the "
                   "steady-state regime where per-request early return "
                   "(continuous batching) shows up as latency, not just "
                   "wall time")
    p.add_argument("--duration", type=float, default=60.0)
    args = p.parse_args()

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.serve.server import SummarizationServer

    cfg = load_config("llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml")
    engine = LLMSpeechTextInference(cfg)
    server = SummarizationServer(
        engine, host="127.0.0.1", port=args.port,
        continuous=not args.request_level, n_slots=args.n_slots,
        max_new_tokens=args.long_tokens, paged=args.paged,
        spec_k=args.spec_k,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    time.sleep(1)

    rng = np.random.RandomState(0)
    pcm = (0.05 * rng.randn(int(args.seconds * 16000)) * 32767).astype(np.int16)
    audio_b64 = base64.b64encode(pcm.tobytes()).decode()

    # warmup: compile every program shape (both budgets)
    def post(budget):
        conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=600)
        body = json.dumps(
            {"audio_b64": audio_b64, "sample_rate": 16000, "max_new_tokens": budget}
        )
        conn.request("POST", "/v1/audio_summary", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        assert resp.status == 200, out
        return out

    lat = {args.short_tokens: [], args.long_tokens: []}
    budgets = [args.short_tokens if i % 2 == 0 else args.long_tokens
               for i in range(args.n)]
    errs = []

    def worker(i, record=True):
        t0 = time.perf_counter()
        try:
            post(budgets[i])
            if record:
                lat[budgets[i]].append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            errs.append(repr(e))

    def wave(record):
        threads = [
            threading.Thread(target=worker, args=(i, record)) for i in range(args.n)
        ]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        return time.perf_counter() - t0

    # warmup: pre-compile every admission batch shape (continuous mode has a
    # dedicated hook; the request-level batcher warms via a full dummy wave).
    # Per-shape compiles are 20-40 s on this backend and would otherwise
    # stall the measured wave.
    print("[warmup]", file=sys.stderr)
    server.warmup()
    wave(record=False)
    errs.clear()

    if args.arrival_rate > 0:
        # sustained mode: exponential inter-arrival times at the offered
        # rate; each arrival grabs the next budget from the mixed cycle.
        # Latency per class is the signal — under sustained mixed load a
        # request-level batcher holds shorts hostage to co-batched longs,
        # while the slot scheduler returns them at their own pace.
        arr = np.random.RandomState(1)
        threads, i = [], 0
        t0 = time.perf_counter()
        deadline = t0 + args.duration
        while time.perf_counter() < deadline:
            time.sleep(float(arr.exponential(1.0 / args.arrival_rate)))
            th = threading.Thread(target=worker, args=(i % args.n, True))
            th.start()
            threads.append(th)
            i += 1
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        offered = i
        served = offered - len(errs)
        lats = lat[args.short_tokens] + lat[args.long_tokens]
        out = {
            "mode": ("request-level" if args.request_level else
                     ("continuous-paged" if args.paged else "continuous"))
            + (f"-spec{args.spec_k}" if args.spec_k and not args.request_level
               else "") + "-sustained",
            "offered_req_s": round(args.arrival_rate, 2),
            "achieved_req_s": round(served / wall, 2),
            "served": served,
            "errors": len(errs),
            "wall_s": round(wall, 2),
            f"p50_short_{args.short_tokens}tok_s": round(float(np.percentile(lat[args.short_tokens], 50)), 2) if lat[args.short_tokens] else None,
            f"p95_short_{args.short_tokens}tok_s": round(float(np.percentile(lat[args.short_tokens], 95)), 2) if lat[args.short_tokens] else None,
            f"p50_long_{args.long_tokens}tok_s": round(float(np.percentile(lat[args.long_tokens], 50)), 2) if lat[args.long_tokens] else None,
            f"p95_long_{args.long_tokens}tok_s": round(float(np.percentile(lat[args.long_tokens], 95)), 2) if lat[args.long_tokens] else None,
        }
        print(json.dumps(out), flush=True)
        if errs:
            print(errs[:3], file=sys.stderr)
        import os

        os._exit(0)

    wall = wave(record=True)

    served = args.n - len(errs)
    mode = "request-level" if args.request_level else (
        "continuous-paged" if args.paged else "continuous")
    if args.spec_k and not args.request_level:
        mode += f"-spec{args.spec_k}"
    out = {
        "mode": mode,
        "served": served,
        "errors": len(errs),
        "wall_s": round(wall, 2),
        "req_per_s": round(served / wall, 2),
        f"p50_short_{args.short_tokens}tok_s": round(float(np.percentile(lat[args.short_tokens], 50)), 2) if lat[args.short_tokens] else None,
        f"p50_long_{args.long_tokens}tok_s": round(float(np.percentile(lat[args.long_tokens], 50)), 2) if lat[args.long_tokens] else None,
    }
    print(json.dumps(out), flush=True)
    if errs:
        print(errs[:3], file=sys.stderr)
    # skip interpreter teardown: daemon scheduler threads + the axon client
    # abort noisily on exit (the JSON line above is the result of record)
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
