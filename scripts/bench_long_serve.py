"""Long-audio serving row (VERDICT r4 #9): llama3_hubert_long served over
/v1/audio_summary with a 120 s clip on the real chip.

The reference cannot represent this request at all — it filters >20 s
clips at preprocessing (reference: preprocess_data/utils.py:130). Here a
120 s clip is an ordinary serving request: the engine's dynamic 100 ms
audio buckets and 64-granular prefill buckets admit it, the continuous
scheduler decodes it next to short traffic. This script measures the
product surface: p50 request wall + end-to-end tokens/s over N streamed
requests, plus a TTFT proxy (a one-chunk 16-token request: prefill + the
first decode chunk — what a streaming client would see as its first
delta). The proxy exists because with random-init weights the byte-level
token stream rarely decodes to clean UTF-8, so the server's
hold-until-clean delta rule (serve/server.py::_stream_deltas) suppresses
mid-stream deltas; with real weights deltas flow at every
chunk_steps=16 boundary.

Run: timeout 1800 python scripts/bench_long_serve.py   (real TPU)
"""

from __future__ import annotations

import http.client
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")
from llm_speech_summarization_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

N_REQ = 4
SECONDS = 120.0
MAX_NEW = 64
PORT = 8139


def main():
    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.serve.server import SummarizationServer

    cfg = load_config(
        "llm_speech_summarization_tpu/configs/yaml/llama3_hubert_long.yaml"
    )
    engine = LLMSpeechTextInference(cfg)
    # 120 s -> ~1500 audio embeds + prompt tokens; the continuous
    # scheduler's prompt budget must admit the 64-granular bucket
    server = SummarizationServer(
        engine, host="127.0.0.1", port=PORT, continuous=True, n_slots=8,
        max_new_tokens=MAX_NEW, max_prompt_len=2048,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    time.sleep(1)

    rng = np.random.RandomState(0)
    wav = (0.05 * rng.randn(int(SECONDS * 16000))).astype(np.float32)
    body = json.dumps(
        {"audio": wav.tolist(), "max_new_tokens": MAX_NEW, "stream": True}
    )
    body_1chunk = json.dumps(
        {"audio": wav.tolist(), "max_new_tokens": 16, "stream": True}
    )

    def stream_once(payload=None):
        conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=1800)
        t0 = time.perf_counter()
        conn.request(
            "POST", "/v1/audio_summary", payload or body,
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()[:200]
        ttft = None
        n_tokens = 0
        buf = b""
        while True:
            chunk = resp.read1(65536)
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                if not line.strip():
                    continue
                msg = json.loads(line)
                if msg.get("error"):
                    raise RuntimeError(f"server stream error: {msg['error']}")
                if ttft is None and (msg.get("delta") or msg.get("done")):
                    ttft = time.perf_counter() - t0
                if msg.get("done"):
                    n_tokens = msg.get("num_tokens", MAX_NEW)
        total = time.perf_counter() - t0
        conn.close()
        if ttft is None:
            raise RuntimeError("stream closed without any delta/done message")
        return ttft, total, n_tokens

    print("[warmup]", file=sys.stderr)
    stream_once()  # compile prefill + decode shapes for the 120 s bucket

    walls, e2e = [], []
    for i in range(N_REQ):
        _, total, n_tok = stream_once()
        walls.append(total)
        e2e.append((n_tok or MAX_NEW) / total)
        print(f"req {i}: wall {total:.2f}s e2e {e2e[-1]:.1f} tok/s",
              file=sys.stderr, flush=True)

    # TTFT proxy: prefill + ONE 16-step decode chunk = what a streaming
    # client sees as its first delta (see module docstring)
    stream_once(body_1chunk)  # warm the 16-token budget shape
    ttfts = []
    for i in range(N_REQ):
        _, total, _ = stream_once(body_1chunk)
        ttfts.append(total)
        print(f"ttft-proxy {i}: {total:.2f}s", file=sys.stderr, flush=True)

    out = {
        "config": "llama3_hubert_long",
        "clip_s": SECONDS,
        "max_new_tokens": MAX_NEW,
        "n": N_REQ,
        "p50_wall_s": round(float(np.percentile(walls, 50)), 2),
        "p50_e2e_tok_s": round(float(np.percentile(e2e, 50)), 1),
        "p50_ttft_proxy_s": round(float(np.percentile(ttfts, 50)), 2),
    }
    print(json.dumps(out), flush=True)
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
