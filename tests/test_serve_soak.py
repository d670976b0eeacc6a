"""Serving soak: sustained mixed load through the paged continuous
scheduler with constant slot churn — every response must equal its
one-shot result (content-correct under admission/harvest/recycling
pressure, not just 200s). Exercises the round-3 scheduler end to end:
fused flag readback, adaptive chunks, depth-1 pipelining + staleness
guard, page reservation/recycling, streaming deltas."""

import http.client
import json
import os
import threading

import pytest

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
from llm_speech_summarization_tpu.serve.server import SummarizationServer

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)

N_REQUESTS = 18
BUDGETS = (4, 8, 16)


@pytest.mark.parametrize(
    "paged,spec_k", [(False, 0), (True, 0), (False, 3), (True, 3)],
    ids=["dense", "paged", "spec", "paged-spec"],
)
def test_sustained_mixed_load_soak(paged, spec_k):
    cfg = load_config(TINY_YAML)
    engine = LLMSpeechTextInference(cfg)
    texts = [f"soak prompt {i} topic {(i * 13) % 7}" for i in range(N_REQUESTS)]
    budgets = [BUDGETS[i % len(BUDGETS)] for i in range(N_REQUESTS)]
    want = [
        engine.generate_text_response_batch([t], max_new_tokens=b)[0]
        for t, b in zip(texts, budgets)
    ]

    srv = SummarizationServer(
        engine, host="127.0.0.1", port=0, continuous=True, paged=paged,
        n_slots=3, chunk_steps=2, max_new_tokens=24, spec_k=spec_k,
    )
    srv.start_background()
    try:
        results = {}
        errors = []

        def post(i, stream):
            try:
                conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=300)
                body = json.dumps({"text": texts[i], "max_new_tokens": budgets[i],
                                   "stream": stream})
                conn.request("POST", "/v1/text_response", body,
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                raw = resp.read()
                conn.close()
                assert resp.status == 200, raw[:200]
                if stream:
                    lines = [json.loads(x) for x in raw.splitlines() if x.strip()]
                    assert lines[-1].get("done") is True, lines[-1]
                    deltas = "".join(x.get("delta", "") for x in lines[:-1])
                    assert deltas == lines[-1]["response"]
                    results[i] = lines[-1]["response"]
                else:
                    results[i] = json.loads(raw)["response"]
            except Exception as e:  # noqa: BLE001
                errors.append((i, repr(e)))

        import time

        threads = []
        for i in range(N_REQUESTS):
            t = threading.Thread(target=post, args=(i, i % 4 == 1))
            t.start()
            threads.append(t)
            time.sleep(0.02 * (i % 3))  # staggered arrival pattern
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors[:4]
        assert len(results) == N_REQUESTS
        for i in range(N_REQUESTS):
            assert results[i] == want[i], (i, results[i], want[i])

        with __import__("urllib.request", fromlist=["request"]).urlopen(
            f"http://127.0.0.1:{srv.port}/metrics"
        ) as r:
            m = json.loads(r.read())
        assert m["requests_served"] >= N_REQUESTS
        if paged:
            # every request's reservation was returned to the pool
            assert m["free_pages"] == m["num_pages"] - 1  # minus the null page
    finally:
        srv.shutdown()
