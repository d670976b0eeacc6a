"""Serving stack: HTTP endpoints + dynamic batching, driven over localhost."""

import base64
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
from llm_speech_summarization_tpu.serve.server import SummarizationServer

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)


@pytest.fixture(scope="module")
def server():
    cfg = load_config(TINY_YAML)
    engine = LLMSpeechTextInference(cfg)
    srv = SummarizationServer(engine, host="127.0.0.1", port=0, max_wait_ms=50)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/healthz") as resp:
        assert resp.status == 200
        assert json.loads(resp.read())["status"] == "ok"


def test_text_endpoint(server):
    status, body = _post(server.port, "/v1/text_response",
                         {"text": "summarize this", "max_new_tokens": 8})
    assert status == 200
    assert isinstance(body["response"], str)


def test_audio_endpoint_float_and_b64(server):
    rng = np.random.RandomState(0)
    wav = (0.05 * rng.randn(12000)).astype(np.float32)
    status, body = _post(server.port, "/v1/audio_summary",
                         {"audio": wav.tolist(), "max_new_tokens": 8})
    assert status == 200 and isinstance(body["response"], str)

    pcm = (wav * 32767).astype(np.int16)
    status, body2 = _post(server.port, "/v1/audio_summary", {
        "audio_b64": base64.b64encode(pcm.tobytes()).decode(),
        "sample_rate": 16000,
        "max_new_tokens": 8,
    })
    assert status == 200 and isinstance(body2["response"], str)


def test_bad_request(server):
    status, body = _post(server.port, "/v1/audio_summary", {"max_new_tokens": 8})
    assert status == 400 and "error" in body
    status, _ = _post(server.port, "/v1/nope", {})
    assert status == 404


def test_concurrent_requests_are_batched(server):
    rng = np.random.RandomState(1)
    wavs = [(0.05 * rng.randn(8000)).astype(np.float32) for _ in range(6)]
    results = [None] * 6
    before = server.batcher.batches_run

    def call(i):
        status, body = _post(server.port, "/v1/audio_summary",
                             {"audio": wavs[i].tolist(), "max_new_tokens": 8})
        results[i] = (status, body)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    # 6 concurrent compatible requests must run in fewer engine calls
    assert server.batcher.batches_run - before < 6
    assert server.batcher.requests_served >= 6


def test_streaming_response():
    """"stream": true returns chunked ndjson deltas that concatenate to the
    exact non-streamed response (continuous scheduler's per-chunk partials)."""
    import http.client
    import json as json_

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.serve.server import SummarizationServer

    cfg = load_config(TINY_YAML)
    eng = LLMSpeechTextInference(cfg)
    server = SummarizationServer(eng, host="127.0.0.1", port=0, continuous=True,
                                 chunk_steps=4, max_new_tokens=32)
    server.start_background()
    try:
        def post(stream):
            conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
            body = json_.dumps({"text": "summarize: the cat sat on the mat",
                                "max_new_tokens": 24, "stream": stream})
            conn.request("POST", "/v1/text_response", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            raw = resp.read()
            conn.close()
            assert resp.status == 200
            return raw

        plain = json_.loads(post(False))["response"]

        lines = [json_.loads(x) for x in post(True).splitlines() if x.strip()]
        assert lines, "no ndjson chunks"
        final = lines[-1]
        assert final.get("done") is True
        deltas = "".join(x.get("delta", "") for x in lines[:-1])
        # the final message carries the authoritative full response; the
        # streamed deltas must be a prefix-consistent reconstruction of it
        assert final["response"] == plain
        assert deltas == plain, (deltas, plain)
        assert len(lines) >= 2  # at least one delta before the final
    finally:
        server.shutdown()


def test_long_audio_clip_served():
    """Long-audio clips are a first-class serving surface (VERDICT r4 #9):
    a 30 s clip — past the reference's 20 s preprocessing cap
    (reference: preprocess_data/utils.py:130) — flows through
    /v1/audio_summary unchanged; the engine's dynamic 100 ms audio buckets
    and 64-granular prefill buckets mean no config-level length gate
    exists on the inference path. Full-size 120 s numbers: PERF.md
    long-audio serving row (scripts/bench_long_serve.py)."""
    cfg = load_config(TINY_YAML)
    eng = LLMSpeechTextInference(cfg)
    srv = SummarizationServer(eng, host="127.0.0.1", port=0, continuous=True,
                              max_new_tokens=16, max_prompt_len=640)
    srv.start_background()
    try:
        rng = np.random.RandomState(3)
        wav = (0.05 * rng.randn(30 * 16000)).astype(np.float32)
        status, body = _post(srv.port, "/v1/audio_summary",
                             {"audio": wav.tolist(), "max_new_tokens": 8})
        assert status == 200 and isinstance(body["response"], str)
        # the clip really went through at full length: the engine's audio
        # calculus for 30 s yields ~375 embeds (tiny pool k8 s4), far past
        # any 20 s-cap truncation
        from llm_speech_summarization_tpu.utils.prompts import (
            compute_num_audio_embeds,
        )

        assert compute_num_audio_embeds(len(wav), downsample_factor=4) > 370
    finally:
        srv.shutdown()


def test_over_budget_request_rejected_clearly():
    """A request whose max_new_tokens exceeds the server's decode budget
    gets an explicit error (the scheduler used to clamp silently and
    truncate the response)."""
    import http.client
    import json as json_

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.serve.server import SummarizationServer

    cfg = load_config(TINY_YAML)
    eng = LLMSpeechTextInference(cfg)
    server = SummarizationServer(eng, host="127.0.0.1", port=0, continuous=True,
                                 max_new_tokens=32)
    server.start_background()
    try:
        def post(max_new):
            conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
            body = json_.dumps({"text": "hi", "max_new_tokens": max_new})
            conn.request("POST", "/v1/text_response", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            out = json_.loads(resp.read())
            conn.close()
            return resp.status, out

        status, out = post(999)
        assert status == 400
        assert "outside" in out["error"] and "budget" in out["error"], out
        # max_new_tokens < 1 must also be rejected: a budget-0 slot is done
        # but never harvested (harvest requires budgets>0) — a permanent
        # slot leak (ADVICE r2)
        status, out = post(0)
        assert status == 400 and "budget" in out["error"], out
    finally:
        server.shutdown()


def test_paged_wave_splits_under_pool_pressure():
    """A coalesced admission wave whose WHOLE page reservation overflows an
    otherwise-empty pool must split and serve every request, not fail the
    wave (found by driving warmup live on the real chip: a 4-wide wave
    errored 4 requests on a pool that held 3 of them fine). Pool sized so
    TWO requests fit but a 4-request wave reserves double the pool — it
    must split to 2+2, the second half waiting for the first to harvest."""
    import http.client
    import json as json_
    import threading as threading_

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.infer.paged import pages_needed
    from llm_speech_summarization_tpu.serve.server import SummarizationServer

    cfg = load_config(TINY_YAML)
    eng = LLMSpeechTextInference(cfg)
    embeds, _ = eng.build_text_prompt_batch(["split me"])
    need = pages_needed(embeds.shape[1] + 8, 64)  # per-request reservation
    server = SummarizationServer(
        eng, host="127.0.0.1", port=0, continuous=True, paged=True,
        n_slots=4, chunk_steps=2, max_new_tokens=16, num_pages=1 + 2 * need,
    )
    server.start_background()
    try:
        want = eng.generate_text_response_batch(["split me"], max_new_tokens=8)[0]
        results, errors = {}, []

        def post(i):
            try:
                conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                                  timeout=300)
                body = json_.dumps({"text": "split me", "max_new_tokens": 8})
                conn.request("POST", "/v1/text_response", body,
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                raw = resp.read()
                conn.close()
                assert resp.status == 200, raw[:200]
                results[i] = json_.loads(raw)["response"]
            except Exception as e:  # noqa: BLE001
                errors.append((i, repr(e)))

        threads = [threading_.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert len(results) == 4
        for i in range(4):
            assert results[i] == want, (i, results[i], want)
        # every reservation returned to the pool
        assert len(server.batcher.decoder.allocator._free) == 2 * need
    finally:
        server.shutdown()


def test_single_request_too_big_for_pool_fails_loudly():
    """A SINGLE request whose reservation can never fit the pool must get
    an explicit MemoryError response, not deadlock the scheduler."""
    import http.client
    import json as json_

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.serve.server import SummarizationServer

    cfg = load_config(TINY_YAML)
    eng = LLMSpeechTextInference(cfg)
    from llm_speech_summarization_tpu.infer.paged import pages_needed

    embeds, _ = eng.build_text_prompt_batch(["too big"])
    T = embeds.shape[1]
    small_need = pages_needed(T + 4, 64)
    big_need = pages_needed(T + 200, 64)
    assert big_need > small_need
    server = SummarizationServer(
        eng, host="127.0.0.1", port=0, continuous=True, paged=True,
        n_slots=4, chunk_steps=2, max_new_tokens=256,
        num_pages=1 + small_need,  # small fits, big never can
    )
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
        # budget 200 → prompt+budget spans several 64-token pages > 1 free
        body = json_.dumps({"text": "too big", "max_new_tokens": 200})
        conn.request("POST", "/v1/text_response", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json_.loads(resp.read())
        conn.close()
        assert resp.status == 400, out
        assert "MemoryError" in out["error"], out
        # and the server still serves afterwards (no wedged scheduler)
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
        conn.request("POST", "/v1/text_response",
                     json_.dumps({"text": "small", "max_new_tokens": 4}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        ok = json_.loads(resp.read())
        conn.close()
        assert resp.status == 200 and isinstance(ok["response"], str), ok
    finally:
        server.shutdown()


def test_request_level_pipelined_waves():
    """The request-level batcher's depth-1 build pipeline: waves with
    different group keys run back-to-back with wave i+1's prompt build
    overlapped under wave i's generate — results must equal direct engine
    calls, and a wave whose BUILD fails errors only its own requests."""
    from llm_speech_summarization_tpu.serve.server import BatchingEngine, _Request

    cfg = load_config(TINY_YAML)
    engine = LLMSpeechTextInference(cfg)
    be = BatchingEngine(engine, max_batch=4, max_wait_ms=40)
    try:
        rng = np.random.RandomState(5)
        wavs = [(0.05 * rng.randn(8000 + 400 * i)).astype(np.float32)
                for i in range(4)]
        # two incompatible groups (different budget buckets) → two waves
        reqs = [
            _Request(kind="audio", payload=w, text_prompt="",
                     max_new_tokens=8 if i < 2 else 72)
            for i, w in enumerate(wavs)
        ]
        outs = [None] * 4
        threads = [
            threading.Thread(target=lambda i=i, r=r: outs.__setitem__(
                i, be.submit(r, timeout=600)))
            for i, r in enumerate(reqs)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        want_short = engine.generate_audio_response_batch(wavs[:2], max_new_tokens=8)
        want_long = engine.generate_audio_response_batch(wavs[2:], max_new_tokens=72)
        assert outs == want_short + want_long

        # a build failure fails ITS wave's requests and the loop survives
        orig = engine.build_audio_prompt_batch
        engine.build_audio_prompt_batch = lambda *a, **k: (_ for _ in ()).throw(
            ValueError("boom")
        )
        bad = _Request(kind="audio", payload=wavs[0], text_prompt="",
                       max_new_tokens=8)
        with pytest.raises(RuntimeError, match="boom"):
            be.submit(bad, timeout=600)
        engine.build_audio_prompt_batch = orig
        ok = _Request(kind="audio", payload=wavs[0], text_prompt="",
                      max_new_tokens=8)
        assert be.submit(ok, timeout=600) == want_short[0]
    finally:
        be.shutdown()


def test_request_level_warmup_walks_batch_ladder():
    """BatchingEngine.warmup must pre-compile EVERY power-of-two wave
    size up to max_batch (waves pad to power-of-two rows, each size is
    its own XLA program pair) — and the SummarizationServer warmup
    binding must resolve to it, not the silent no-op fallback that let
    request-level bursts meet 20-40 s compiles mid-wave (round 4)."""
    from llm_speech_summarization_tpu.serve.server import BatchingEngine

    cfg = load_config(TINY_YAML)
    engine = LLMSpeechTextInference(cfg)
    be = BatchingEngine(engine, max_batch=4, max_wait_ms=10)
    try:
        built, generated = [], []
        orig_build = engine.build_audio_prompt_batch
        orig_gen = engine._generate_from_embeds

        def spy_build(audios, *a, **k):
            built.append(len(audios))
            return orig_build(audios, *a, **k)

        def spy_gen(embeds, mask, budget, *a, **k):
            generated.append((int(embeds.shape[0]), budget))
            return orig_gen(embeds, mask, budget, *a, **k)

        engine.build_audio_prompt_batch = spy_build
        engine._generate_from_embeds = spy_gen
        be.warmup(audio_seconds=(0.5,))
        assert built == [1, 2, 4]
        assert [g[0] for g in generated] == [1, 2, 4]
        assert all(g[1] == engine.decode_bucket for g in generated)
    finally:
        engine.build_audio_prompt_batch = orig_build
        engine._generate_from_embeds = orig_gen
        be.shutdown()

    srv = SummarizationServer(engine, host="127.0.0.1", port=0,
                              continuous=False)
    try:
        assert srv.warmup.__func__ is BatchingEngine.warmup
    finally:
        srv.batcher.shutdown()


def test_graceful_drain():
    """drain(): /healthz flips to 503 'draining', new POSTs get 503, an
    in-flight request still completes, and the server shuts down idle."""
    import time

    cfg = load_config(TINY_YAML)
    engine = LLMSpeechTextInference(cfg)
    srv = SummarizationServer(engine, host="127.0.0.1", port=0, continuous=True,
                              n_slots=2, max_new_tokens=64, max_prompt_len=256)
    srv.start_background()
    rng = np.random.RandomState(9)
    wav = (0.05 * rng.randn(8000)).astype(np.float32)

    inflight = {}

    def long_req():
        inflight["r"] = _post(srv.port, "/v1/audio_summary",
                              {"audio": wav.tolist(), "max_new_tokens": 48})

    t = threading.Thread(target=long_req)
    t.start()
    # wait until the request is actually admitted (live slot), then drain
    for _ in range(200):
        if srv.batcher._by_slot or not srv.batcher._queue.empty():
            break
        time.sleep(0.05)
    done = {}
    dt = threading.Thread(target=lambda: done.setdefault(
        "drained", srv.drain(timeout=120)))
    dt.start()
    time.sleep(0.2)
    # GET /healthz while draining
    import urllib.error
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as r:
            raise AssertionError("healthz should 503 while draining")
    except urllib.error.HTTPError as e:
        assert e.code == 503 and json.loads(e.read())["status"] == "draining"
    # new POST refused
    status, body = _post(srv.port, "/v1/audio_summary",
                         {"audio": wav.tolist(), "max_new_tokens": 4})
    assert status == 503 and "draining" in body["error"]
    # the in-flight request still finishes, then drain() completes idle
    t.join(timeout=300)
    dt.join(timeout=300)
    assert inflight["r"][0] == 200 and inflight["r"][1]["response"]
    assert done["drained"] is True


def test_metrics_endpoint(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/metrics") as resp:
        assert resp.status == 200
        m = json.loads(resp.read())
    assert m["scheduler"] in ("ContinuousBatchingEngine", "BatchingEngine")
    assert "scheduler_reason" in m and "uptime_s" in m
    assert m["requests_served"] >= 0 and m["queue_depth"] >= 0
    if m["scheduler"] == "ContinuousBatchingEngine":
        assert 0 <= m["live_slots"] <= m["n_slots"]
