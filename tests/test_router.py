"""Replica router (serve/router.py): least-loaded pick, health/drain
ejection, streaming pass-through — driven over real HTTP against two real
replica servers sharing one tiny engine."""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
from llm_speech_summarization_tpu.serve.router import ReplicaRouter
from llm_speech_summarization_tpu.serve.server import SummarizationServer

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)


@pytest.fixture(scope="module")
def stack():
    cfg = load_config(TINY_YAML)
    engine = LLMSpeechTextInference(cfg)
    replicas = [
        SummarizationServer(engine, host="127.0.0.1", port=0, continuous=True,
                            n_slots=2, max_new_tokens=32, max_prompt_len=256)
        for _ in range(2)
    ]
    for r in replicas:
        r.start_background()
    router = ReplicaRouter(
        [f"http://127.0.0.1:{r.port}" for r in replicas],
        host="127.0.0.1", port=0, health_interval_s=3600,  # probe manually
    )
    router.start_background()
    yield router, replicas
    router.shutdown()
    for r in replicas:
        r.shutdown()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_router_balances_and_matches_direct(stack):
    router, replicas = stack
    rng = np.random.RandomState(11)
    wavs = [(0.05 * rng.randn(8000 + 300 * i)).astype(np.float32)
            for i in range(6)]
    # direct answers from a replica (shared engine → identical streams)
    want = [
        _post(replicas[0].port, "/v1/audio_summary",
              {"audio": w.tolist(), "max_new_tokens": 8})[1]["response"]
        for w in wavs
    ]
    results = [None] * 6

    def call(i):
        results[i] = _post(router.port, "/v1/audio_summary",
                           {"audio": wavs[i].tolist(), "max_new_tokens": 8})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    assert [r[1]["response"] for r in results] == want
    m = router.metrics()
    assert m["served_total"] >= 6
    # concurrent load reached BOTH replicas (least-loaded spill)
    assert all(b["served"] > 0 for b in m["backends"])


def test_router_streaming_passthrough(stack):
    router, replicas = stack
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", router.port, timeout=300)
    conn.request(
        "POST", "/v1/text_response",
        json.dumps({"text": "route me", "max_new_tokens": 8, "stream": True}),
        {"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    raw = resp.read()
    conn.close()
    assert resp.status == 200
    lines = [json.loads(x) for x in raw.splitlines() if x.strip()]
    assert lines[-1]["done"] is True
    assert "".join(x.get("delta", "") for x in lines[:-1]) == lines[-1]["response"]


def test_router_ejects_draining_replica_and_recovers(stack):
    router, replicas = stack
    # drain replica 0: healthz flips to 503 → router ejects it
    replicas[0]._draining = True
    router.check_health_now()
    assert [b.healthy for b in router.backends] == [False, True]
    rng = np.random.RandomState(3)
    wav = (0.05 * rng.randn(8000)).astype(np.float32)
    before0, before1 = (b.served for b in router.backends)
    status, body = _post(router.port, "/v1/audio_summary",
                         {"audio": wav.tolist(), "max_new_tokens": 4})
    # >=: a prior streamed request's served bump can land a beat after its
    # client finished reading (counted post-terminator on the router thread)
    assert status == 200 and router.backends[1].served >= before1 + 1
    assert router.backends[0].served == before0  # ejected replica untouched
    # recovery re-admits
    replicas[0]._draining = False
    router.check_health_now()
    assert [b.healthy for b in router.backends] == [True, True]
    # every replica draining → router healthz 503 and POST 503
    for r in replicas:
        r._draining = True
    router.check_health_now()
    status, body = _post(router.port, "/v1/audio_summary",
                         {"audio": wav.tolist(), "max_new_tokens": 4})
    assert status == 503 and "no healthy backends" in body["error"]
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{router.port}/healthz", timeout=30
        ):
            raise AssertionError("router healthz should 503")
    except urllib.error.HTTPError as e:
        assert e.code == 503
    for r in replicas:
        r._draining = False
    router.check_health_now()


def test_router_flags_truncated_stream():
    """A replica dying mid-stream (connection closed without a done/error
    record) must surface as an {"error"} record and eject the backend —
    not as a clean-looking truncated stream."""
    import http.client
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class DyingHandler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            pass

        def do_GET(self):  # healthz: healthy until it dies
            body = b'{"status": "ok"}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for delta in (b'{"delta": "par"}\n', b'{"delta": "tial"}\n'):
                self.wfile.write(f"{len(delta):x}\r\n".encode() + delta + b"\r\n")
                self.wfile.flush()
            # die without the final {"done": ...} record or terminator
            self.connection.close()

    backend = ThreadingHTTPServer(("127.0.0.1", 0), DyingHandler)
    threading.Thread(target=backend.serve_forever, daemon=True).start()
    router = ReplicaRouter(
        [f"http://127.0.0.1:{backend.server_address[1]}"],
        host="127.0.0.1", port=0, health_interval_s=3600,
    )
    router.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", router.port, timeout=60)
        conn.request("POST", "/v1/text_response",
                     json.dumps({"text": "x", "max_new_tokens": 8,
                                 "stream": True}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        raw = resp.read()
        conn.close()
        lines = [json.loads(x) for x in raw.splitlines() if x.strip()]
        assert lines[-1].get("error", "").startswith("upstream stream truncated")
        assert [x.get("delta") for x in lines[:-1]] == ["par", "tial"]
        b = router.backends[0]
        assert not b.healthy and b.errors == 1 and b.served == 0
    finally:
        router.shutdown()
        backend.shutdown()
