"""TP serving on the virtual 8-device CPU mesh (VERDICT r2 #1).

The frozen LLM decodes tensor-parallel over the mesh "model" axis: engine
params shard per llama_param_spec, the SlotDecoder's KV cache shards on its
KV-head axis (slot_state_spec), and the whole continuous-batching lifecycle
— admission prefill, chunked decode, harvest — runs sharded. The same code
runs unchanged on a v5e-8 (SURVEY.md §4).
"""

import json
import os
import threading

import jax
import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
from llm_speech_summarization_tpu.infer.slots import SlotDecoder
from llm_speech_summarization_tpu.parallel import mesh_from_devices

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)

needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def engines():
    cfg = load_config(TINY_YAML)
    ref = LLMSpeechTextInference(cfg)
    if jax.device_count() < 8:
        return ref, None, None
    # tp=2 divides the tiny model's num_kv_heads=2, so the cache shards too
    mesh = mesh_from_devices(data=4, model=2)
    tp = LLMSpeechTextInference(cfg, mesh=mesh)
    return ref, tp, mesh


def _decode_all(engine, decoder, embeds, mask, slots, budget):
    decoder.admit(embeds, mask, slots, [budget] * len(slots))
    for _ in range(budget // 4 + 1):
        if decoder.live_count() == 0:
            break
        decoder.decode_chunk(4)
    out = {}
    for slot, tokens, cnt in decoder.harvest():
        out[slot] = engine.tokenizer.decode(
            tokens[: min(cnt, budget)].tolist(), skip_special_tokens=True
        )
    return out


@needs_8_devices
def test_tp_slot_decode_token_identical(engines):
    """TP-sharded slot decode must emit the same tokens as the unsharded
    decoder AND the one-shot generate path (same weights, greedy)."""
    ref, tp, mesh = engines
    texts = ["hello tensor parallel world", "the quick brown fox"]
    budget = 16

    want = ref.generate_text_response_batch(texts, max_new_tokens=budget)

    def make_decoder(engine):
        return SlotDecoder(
            engine.llm_params, engine.llm_cfg,
            eos_id=engine.tokenizer.eos_id, n_slots=4,
            max_prompt_len=256, max_new_tokens=32,
            cache_dtype=engine.cache_dtype, mesh=engine.mesh,
        )

    embeds, mask = tp.build_text_prompt_batch(texts)
    got_tp = _decode_all(tp, make_decoder(tp), embeds[:2], mask[:2], [0, 1], budget)
    assert [got_tp[0], got_tp[1]] == want

    # the sharded cache really is sharded (not silently replicated)
    dec = make_decoder(tp)
    spec = dec.state.cache.k.sharding.spec
    assert "model" in tuple(spec), spec


@needs_8_devices
def test_tp_quantized_fused_params_shard_and_generate(engines):
    """int8 weight-only + fused-QKV serving layout shards under the same
    spec (scale vectors follow their weight's out-feature axis) and
    generates identically to the unsharded quantized engine."""
    cfg = load_config(TINY_YAML)
    cfg.model.llm_weight_dtype = "int8"
    ref = LLMSpeechTextInference(cfg)
    mesh = mesh_from_devices(data=4, model=2)
    tp = LLMSpeechTextInference(cfg, mesh=mesh)
    assert "wqkv" in tp.llm_params["layers"], "fused layout expected"
    texts = ["alpha beta", "gamma delta epsilon"]
    want = ref.generate_text_response_batch(texts, max_new_tokens=12)
    got = tp.generate_text_response_batch(texts, max_new_tokens=12)
    assert got == want


@needs_8_devices
def test_tp_paged_slot_decode_token_identical(engines):
    """TP + paged KV: the page-major pools shard on their head axis
    (slot_state_spec) and the full admit/decode/harvest cycle stays
    token-identical to the unsharded paged decoder."""
    ref, tp, mesh = engines
    texts = ["paged tensor parallel", "the slow green turtle"]
    budget = 12

    def make(engine):
        return SlotDecoder(
            engine.llm_params, engine.llm_cfg,
            eos_id=engine.tokenizer.eos_id, n_slots=4,
            max_prompt_len=256, max_new_tokens=32,
            cache_dtype=engine.cache_dtype, mesh=engine.mesh,
            paged=True, page_size=64,
        )

    embeds, mask = ref.build_text_prompt_batch(texts)
    want = _decode_all(ref, make(ref), embeds[:2], mask[:2], [0, 1], budget)
    embeds_tp, mask_tp = tp.build_text_prompt_batch(texts)
    got = _decode_all(tp, make(tp), embeds_tp[:2], mask_tp[:2], [0, 1], budget)
    assert got == want
    dec = make(tp)
    spec = dec.state.cache.k_pool.sharding.spec
    assert "model" in tuple(spec), spec


@needs_8_devices
def test_tp_spec_chunks_token_identical(engines):
    """TP serving × speculative decode chunks (a real v5e-8 deploy combo):
    the T=k+1 verification forward runs sharded on the KV-head axis and
    spec chunks stay token-identical to the unsharded plain decoder."""
    ref, tp, mesh = engines
    texts = ["speculative tensor parallel", "the quick brown fox jumps"]
    budget = 14

    want = ref.generate_text_response_batch(texts, max_new_tokens=budget)

    dec = SlotDecoder(
        tp.llm_params, tp.llm_cfg, eos_id=tp.tokenizer.eos_id, n_slots=4,
        max_prompt_len=256, max_new_tokens=32,
        cache_dtype=tp.cache_dtype, mesh=tp.mesh, spec_k=3,
    )
    embeds, mask = tp.build_text_prompt_batch(texts)
    dec.admit(embeds[:2], mask[:2], [0, 1], [budget, budget])
    for _ in range(budget):
        if dec.live_count() == 0:
            break
        dec.decode_chunk(3, spec=True)
    got = {}
    for slot, tokens, cnt in dec.harvest():
        got[slot] = tp.tokenizer.decode(
            tokens[: min(cnt, budget)].tolist(), skip_special_tokens=True
        )
    assert [got[0], got[1]] == want


@needs_8_devices
def test_tp_paged_spec_chunks_token_identical(engines):
    """The full deploy triple — TP × paged KV × speculative chunks: the
    (k+1)-token verification forward attends through head-sharded
    page-major pools, write_tokens scatters sharded, and tokens match the
    unsharded dense plain decoder exactly."""
    ref, tp, mesh = engines
    texts = ["triple composition serving", "a quiet mountain stream"]
    budget = 12

    want = ref.generate_text_response_batch(texts, max_new_tokens=budget)

    dec = SlotDecoder(
        tp.llm_params, tp.llm_cfg, eos_id=tp.tokenizer.eos_id, n_slots=4,
        max_prompt_len=256, max_new_tokens=32,
        cache_dtype=tp.cache_dtype, mesh=tp.mesh, spec_k=3,
        paged=True, page_size=64,
    )
    embeds, mask = tp.build_text_prompt_batch(texts)
    dec.admit(embeds[:2], mask[:2], [0, 1], [budget, budget])
    for _ in range(budget):
        if dec.live_count() == 0:
            break
        dec.decode_chunk(3, spec=True)
    got = {}
    for slot, tokens, cnt in dec.harvest():
        got[slot] = tp.tokenizer.decode(
            tokens[: min(cnt, budget)].tolist(), skip_special_tokens=True
        )
    assert [got[0], got[1]] == want


@needs_8_devices
def test_tp_selects_fused_decode(engines):
    """VERDICT r4 #3: under a model-sharded mesh the decoder must route
    decode through the FUSED kernels (shard_map over "model"), not the old
    blanket XLA fallback — and LSS_FUSED_DECODE=0 must still revert."""
    ref, tp, mesh = engines
    dec = SlotDecoder(
        tp.llm_params, tp.llm_cfg, eos_id=tp.tokenizer.eos_id, n_slots=4,
        max_prompt_len=256, max_new_tokens=32,
        cache_dtype=tp.cache_dtype, mesh=tp.mesh,
    )
    assert dec._attn_impl == "fused" and dec._tp_mesh is mesh
    os.environ["LSS_FUSED_DECODE"] = "0"
    try:
        dec2 = SlotDecoder(
            tp.llm_params, tp.llm_cfg, eos_id=tp.tokenizer.eos_id, n_slots=4,
            max_prompt_len=256, max_new_tokens=32,
            cache_dtype=tp.cache_dtype, mesh=tp.mesh,
        )
        assert dec2._attn_impl == "xla"
    finally:
        os.environ.pop("LSS_FUSED_DECODE", None)


@needs_8_devices
def test_tp_http_e2e_on_mesh(engines):
    """Full HTTP serving (continuous scheduler + streaming) with the engine
    on the mesh: audio and text endpoints answer; streamed deltas
    reconstruct the final response."""
    from llm_speech_summarization_tpu.serve.server import SummarizationServer

    ref, tp, mesh = engines
    srv = SummarizationServer(tp, host="127.0.0.1", port=0, continuous=True,
                              chunk_steps=4, max_new_tokens=32)
    srv.start_background()
    try:
        import http.client

        def post(path, body):
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=300)
            conn.request("POST", path, json.dumps(body),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            raw = r.read()
            conn.close()
            return r.status, raw

        status, raw = post("/v1/text_response",
                           {"text": "summarize the meeting", "max_new_tokens": 8})
        assert status == 200 and isinstance(json.loads(raw)["response"], str)

        rng = np.random.RandomState(0)
        wav = (0.05 * rng.randn(12000)).astype(np.float32)
        status, raw = post("/v1/audio_summary",
                           {"audio": wav.tolist(), "max_new_tokens": 8})
        assert status == 200 and isinstance(json.loads(raw)["response"], str)

        status, raw = post("/v1/text_response",
                           {"text": "stream me", "max_new_tokens": 16,
                            "stream": True})
        lines = [json.loads(x) for x in raw.splitlines() if x.strip()]
        assert status == 200 and lines[-1].get("done") is True
        deltas = "".join(x.get("delta", "") for x in lines[:-1])
        assert deltas == lines[-1]["response"]
    finally:
        srv.shutdown()
