"""Decode-level continuous batching (VERDICT r1 #5): slot decoder
correctness vs the one-shot generate path, mid-decode admission, and the
short-request-returns-first property."""

import os
import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
from llm_speech_summarization_tpu.infer.slots import SlotDecoder
from llm_speech_summarization_tpu.serve.server import (
    ContinuousBatchingEngine,
    _Request,
)

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)


@pytest.fixture(scope="module")
def engine():
    return LLMSpeechTextInference(load_config(TINY_YAML))


@pytest.fixture(scope="module")
def decoder(engine):
    return SlotDecoder(
        engine.llm_params,
        engine.llm_cfg,
        eos_id=engine.tokenizer.eos_id,
        n_slots=8,
        max_prompt_len=256,
        max_new_tokens=32,
        cache_dtype=engine.cache_dtype,
    )


def _drain(decoder, budget_steps=64, chunk=4):
    for _ in range(budget_steps // chunk):
        if decoder.live_count() == 0:
            break
        decoder.decode_chunk(chunk)


def test_slot_decoder_matches_one_shot_generate(engine, decoder):
    """Tokens from the slot decoder must EQUAL the one-shot jitted
    prefill+decode path (greedy, same weights, same prompts)."""
    texts = ["hello world", "the quick brown fox jumps over the lazy dog"]
    embeds, mask = engine.build_text_prompt_batch(texts)
    n = len(texts)

    want = engine.generate_text_response_batch(texts, max_new_tokens=16)

    decoder.admit(embeds[:n], mask[:n], [0, 1], [16, 16])
    _drain(decoder)
    got = {}
    for slot, tokens, cnt in decoder.harvest():
        cnt = min(cnt, 16)
        got[slot] = engine.tokenizer.decode(
            tokens[:cnt].tolist(), skip_special_tokens=True
        )
    assert [got[0], got[1]] == want


def test_mid_decode_admission(engine, decoder):
    """A request admitted after decoding started produces the same output
    as one admitted fresh — cache rows are fully isolated per slot."""
    texts = ["alpha beta gamma", "delta epsilon"]
    embeds, mask = engine.build_text_prompt_batch(texts)
    want = engine.generate_text_response_batch(texts, max_new_tokens=12)

    decoder.admit(embeds[:1], mask[:1], [2], [12])
    decoder.decode_chunk(4)  # request 0 is mid-flight...
    decoder.admit(embeds[1:2], mask[1:2], [3], [12])  # ...when 1 joins
    _drain(decoder)
    got = {}
    for slot, tokens, cnt in decoder.harvest():
        got[slot] = engine.tokenizer.decode(
            tokens[: min(cnt, 12)].tolist(), skip_special_tokens=True
        )
    assert got[2] == want[0]
    assert got[3] == want[1]


def test_short_request_returns_before_long(engine):
    """The headline property: a 4-token request co-batched with a 64-token
    request completes without waiting for the long one."""
    cb = ContinuousBatchingEngine(
        engine, n_slots=4, chunk_steps=2, max_prompt_len=256, max_new_tokens=64
    )
    try:
        done_times = {}

        def run(name, text, budget):
            req = _Request("text", text, "", budget)
            cb.submit(req, timeout=120)
            done_times[name] = time.monotonic()

        t_long = threading.Thread(target=run, args=("long", "a story about ships", 64))
        t_short = threading.Thread(target=run, args=("short", "hi", 4))
        t_long.start()
        time.sleep(0.05)
        t_short.start()
        t_long.join(timeout=120)
        t_short.join(timeout=120)
        assert "short" in done_times and "long" in done_times
        assert done_times["short"] < done_times["long"]
    finally:
        cb.shutdown()


def test_rapid_slot_reuse_returns_correct_tokens(engine):
    """Many distinct prompts through TWO slots: every response must equal
    its one-shot result. Regression for the pipelined-scheduler staleness
    race (round 3): a slot harvested from the lagged chunk flags and
    immediately re-admitted showed its OLD request 'ready' in the next
    read — without the admission-generation guard the new request got the
    old request's tokens and its budget zeroed."""
    texts = [f"prompt number {i} about topic {i * 7}" for i in range(10)]
    want = [engine.generate_text_response_batch([t], max_new_tokens=6)[0]
            for t in texts]

    cb = ContinuousBatchingEngine(
        engine, n_slots=2, chunk_steps=2, max_prompt_len=256,
        max_new_tokens=16, max_admit=2, admit_wait_ms=5.0,
    )
    try:
        results = {}

        def run(i):
            results[i] = cb.submit(_Request("text", texts[i], "", 6), timeout=180)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(len(texts))]
        for t in threads:
            t.start()
            time.sleep(0.01)  # staggered arrivals → constant slot churn
        for t in threads:
            t.join(timeout=180)
        assert len(results) == len(texts)
        for i, w in enumerate(want):
            assert results[i] == w, (i, results[i], w)
    finally:
        cb.shutdown()


def test_pipelined_stale_read_would_corrupt_without_guard(engine):
    """Deterministic reconstruction of the pipelined-scheduler staleness
    race: chunk B is dispatched BEFORE req1's harvest zeroes the slot, so
    B's fused flags still show slot 0 'ready' with req1's budget — after
    req2 is admitted there, harvesting from B's flags unguarded returns
    req1's stale tokens and zeroes req2's device budget. The scheduler's
    admission-generation guard masks exactly this read (serve/server.py
    _loop); here we drive the decoder directly through the same sequence
    and assert both the corruption (unguarded) and the fix (masked)."""
    from llm_speech_summarization_tpu.infer.slots import SlotDecoder

    texts = ["first request text", "second very different request"]
    want2 = engine.generate_text_response_batch([texts[1]], max_new_tokens=6)[0]
    e, m = engine.build_text_prompt_batch([texts[0]])
    e2, m2 = engine.build_text_prompt_batch([texts[1]])

    def sequence(guarded):
        dec = SlotDecoder(
            engine.llm_params, engine.llm_cfg, eos_id=engine.tokenizer.eos_id,
            n_slots=1, max_prompt_len=256, max_new_tokens=16,
            cache_dtype=engine.cache_dtype,
        )
        dec.admit(e[:1], m[:1], [0], [2])
        devA = dec.decode_chunk(4, return_flags=True, sync=False)  # req1 finishes
        devB = dec.decode_chunk(4, return_flags=True, sync=False)  # pipelined
        fA = dec.to_host_flags(devA)
        got1 = dec.harvest(fA)  # req1 out; budget zeroing queued AFTER chunk B
        assert [s for s, _, _ in got1] == [0]
        dec.admit(e2[:1], m2[:1], [0], [6])  # req2 reuses slot 0
        dec.decode_chunk(4)
        fB = dec.to_host_flags(devB)  # STALE: still shows req1 ready
        if guarded:
            fB[1][0] = 0  # the scheduler's mask for freshly-admitted slots
            fB[0][0] = True
        stale = dec.harvest(fB)
        for _ in range(3):
            dec.decode_chunk(4)
        final = dec.harvest()
        return stale, final

    stale, final = sequence(guarded=False)
    # unguarded: the stale read re-harvests slot 0 (req1's leftovers) and
    # its device-side budget zeroing kills req2 — no (or truncated) harvest
    corrupted = bool(stale) and not (
        final
        and engine.tokenizer.decode(
            final[0][1][: min(final[0][2], 6)].tolist(), skip_special_tokens=True
        ) == want2
    )
    assert corrupted, "expected the unguarded sequence to corrupt req2"

    stale, final = sequence(guarded=True)
    assert stale == [] and len(final) == 1
    got2 = engine.tokenizer.decode(
        final[0][1][: min(final[0][2], 6)].tolist(), skip_special_tokens=True
    )
    assert got2 == want2


def test_continuous_audio_requests(engine):
    """Audio requests run through the same slot scheduler end-to-end and
    match the one-shot audio path."""
    rng = np.random.RandomState(0)
    audios = [(0.05 * rng.randn(16000)).astype(np.float32) for _ in range(2)]
    want = engine.generate_audio_response_batch(audios, max_new_tokens=8)

    cb = ContinuousBatchingEngine(
        engine, n_slots=4, chunk_steps=2, max_prompt_len=512, max_new_tokens=16
    )
    try:
        results = {}

        def run(i):
            req = _Request("audio", audios[i], "", 8)
            results[i] = cb.submit(req, timeout=120)

        ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert results[0] == want[0] and results[1] == want[1]
    finally:
        cb.shutdown()


def test_cancel_releases_slot_and_discards_output(engine):
    """SlotDecoder.cancel: the cancelled row frees immediately with NO
    pending output, co-batched rows are untouched, and the slot is safely
    re-admissible (cache isolation survives the cancel)."""
    texts = ["cancel me please", "but keep decoding this one"]
    embeds, mask = engine.build_text_prompt_batch(texts)
    want1 = engine.generate_text_response_batch([texts[1]], max_new_tokens=12)[0]

    dec = SlotDecoder(
        engine.llm_params, engine.llm_cfg, eos_id=engine.tokenizer.eos_id,
        n_slots=4, max_prompt_len=256, max_new_tokens=16,
        cache_dtype=engine.cache_dtype,
    )
    dec.admit(embeds[:2], mask[:2], [0, 1], [12, 12])
    dec.decode_chunk(4)  # both mid-flight
    dec.cancel([0])
    assert 0 in dec.free_slots()  # immediately reusable
    _drain(dec)
    got = dec.harvest()
    assert [s for s, _, _ in got] == [1]  # cancelled row never harvests
    tokens = got[0][1][: min(got[0][2], 12)]
    assert engine.tokenizer.decode(
        tokens.tolist(), skip_special_tokens=True
    ) == want1

    # the freed slot serves a NEW request correctly
    texts2 = ["a fresh request in the recycled slot"]
    want2 = engine.generate_text_response_batch(texts2, max_new_tokens=8)[0]
    e2, m2 = engine.build_text_prompt_batch(texts2)
    dec.admit(e2[:1], m2[:1], [0], [8])
    _drain(dec)
    got2 = dec.harvest()
    assert [s for s, _, _ in got2] == [0]
    assert engine.tokenizer.decode(
        got2[0][1][: min(got2[0][2], 8)].tolist(), skip_special_tokens=True
    ) == want2


def test_cancel_paged_returns_pages(engine):
    """Paged decoder: cancel returns the row's whole reservation to the
    pool right away (not at slot reuse), so a waiting wave can admit."""
    texts = ["paged cancel target", "paged survivor row"]
    embeds, mask = engine.build_text_prompt_batch(texts)
    want1 = engine.generate_text_response_batch([texts[1]], max_new_tokens=8)[0]

    dec = SlotDecoder(
        engine.llm_params, engine.llm_cfg, eos_id=engine.tokenizer.eos_id,
        n_slots=4, max_prompt_len=256, max_new_tokens=16,
        cache_dtype=engine.cache_dtype, paged=True, page_size=64,
    )
    free0 = dec.allocator.free_pages
    dec.admit(embeds[:2], mask[:2], [0, 1], [8, 8])
    taken = free0 - dec.allocator.free_pages
    assert taken > 0
    dec.decode_chunk(2)
    dec.cancel([0])
    # slot 0's full reservation came back; slot 1 still holds its pages
    held1 = int(np.count_nonzero(dec._host_table[1]))
    assert dec.allocator.free_pages == free0 - held1
    assert np.count_nonzero(dec._host_table[0]) == 0
    _drain(dec)
    got = dec.harvest()
    assert [s for s, _, _ in got] == [1]
    assert engine.tokenizer.decode(
        got[0][1][: min(got[0][2], 8)].tolist(), skip_special_tokens=True
    ) == want1
    assert dec.allocator.free_pages == free0  # everything back after harvest


def test_submit_timeout_cancels_and_frees_slot(engine):
    """Scheduler-level: a request whose submitter times out (or whose
    streaming client disconnects — same flag) is cancelled at the next
    chunk boundary; its slot serves later requests and nothing leaks."""
    cb = ContinuousBatchingEngine(
        engine, n_slots=1, chunk_steps=2, max_prompt_len=256,
        max_new_tokens=256, max_admit=1, admit_wait_ms=5.0,
    )
    try:
        long_req = _Request("text", "an epic poem about the sea", "", 256)
        with pytest.raises(TimeoutError):
            cb.submit(long_req, timeout=0.05)
        assert long_req.cancelled.is_set()

        # the single slot must come back for the next request
        want = engine.generate_text_response_batch(["hello there"],
                                                   max_new_tokens=6)[0]
        got = cb.submit(_Request("text", "hello there", "", 6), timeout=120)
        assert got == want
        deadline = time.monotonic() + 10
        while cb._by_slot and time.monotonic() < deadline:
            time.sleep(0.02)
        assert not cb._by_slot  # no leaked slots
    finally:
        cb.shutdown()


def test_slot_decoder_int8_cache_donation():
    """int8 slot caches must survive donating jitted calls — round 2's
    init_kv_cache aliased ONE zeros buffer as both k_scale and v_scale,
    so the first donated decode_chunk raised 'attempt to donate the same
    buffer twice' (only on int8: bf16 caches have no scale fields)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_speech_summarization_tpu.infer.slots import SlotDecoder
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    dec = SlotDecoder(params, cfg, eos_id=0, n_slots=4, max_prompt_len=64,
                      max_new_tokens=8, cache_dtype=jnp.int8)
    rng = np.random.RandomState(0)
    ids = rng.randint(1, cfg.vocab_size, (2, 16))
    embeds = params["embed_tokens"][jnp.asarray(ids)]
    dec.admit(embeds, jnp.ones((2, 16), bool), [0, 1], [8, 8])
    dec.decode_chunk(4)
    dec.decode_chunk(4)
    got = dec.harvest()
    assert sorted(s for s, _, _ in got) == [0, 1]
    assert all(n == 8 for _, _, n in got)


def test_slot_decoder_repetition_penalty():
    """The serving decoder mirrors generate.py's repetition penalty: a
    flattened model greedy-loops one token; a huge penalty forbids repeats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_speech_summarization_tpu.infer.slots import SlotDecoder
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = jax.tree_util.tree_map(lambda x: x * 1e-3, params)
    rng = np.random.RandomState(0)
    ids = rng.randint(1, cfg.vocab_size, (2, 16))
    embeds = params["embed_tokens"][jnp.asarray(ids)]

    def run(penalty):
        dec = SlotDecoder(params, cfg, eos_id=0, n_slots=4, max_prompt_len=64,
                          max_new_tokens=12, cache_dtype=jnp.float32,
                          repetition_penalty=penalty)
        dec.admit(embeds, jnp.ones((2, 16), bool), [0, 1], [12, 12])
        dec.decode_chunk(11)
        return {s: t[:n] for s, t, n in dec.harvest()}

    plain = run(1.0)
    assert any(len(np.unique(t)) <= 3 for t in plain.values())  # it loops
    pen = run(1e6)
    for t in pen.values():
        non_eos = t[t != 0]
        assert len(np.unique(non_eos)) == len(non_eos), t


def test_scheduler_survives_transient_decode_failure():
    """One transient device/RPC failure inside the scheduler loop must fail
    the in-flight requests loudly and keep serving — not wedge the thread
    with /healthz green (review finding)."""
    import time

    from llm_speech_summarization_tpu.serve.server import ContinuousBatchingEngine, _Request

    cfg = load_config(TINY_YAML)
    engine = LLMSpeechTextInference(cfg)
    cb = ContinuousBatchingEngine(engine, n_slots=2, max_prompt_len=256,
                                  max_new_tokens=16, chunk_steps=2)
    try:
        orig = cb.decoder.decode_chunk
        boom = {"n": 0}

        def flaky(*a, **k):
            if boom["n"] == 0:
                boom["n"] += 1
                raise RuntimeError("transient RPC failure (injected)")
            return orig(*a, **k)

        cb.decoder.decode_chunk = flaky
        bad = _Request(kind="text", payload="will fail", text_prompt="",
                       max_new_tokens=8)
        with pytest.raises(RuntimeError, match="scheduler error"):
            cb.submit(bad, timeout=120)
        assert cb._loop_errors == 1
        # loop alive: the next request serves normally and matches one-shot
        ok = _Request(kind="text", payload="still alive", text_prompt="",
                      max_new_tokens=8)
        got = cb.submit(ok, timeout=300)
        want = engine.generate_text_response_batch(["still alive"],
                                                   max_new_tokens=8)[0]
        assert got == want
    finally:
        cb.shutdown()


def test_admit_prepadded_wave_matches_exact(engine):
    """Serving waves arrive power-of-two PRE-PADDED from the builder and
    admit() treats rows beyond len(slot_ids) as drop-slot padding — token
    streams must equal an exact-count admit, and (paged) the drop rows
    must reserve zero pages. Pins the zero-eager-op admission contract
    (PERF.md round 5: the slice-then-re-pad round trip compiled a fresh
    per-wave-size program mid-traffic)."""
    texts = ["prepadded wave row one", "row two", "row three"]
    embeds, mask = engine.build_text_prompt_batch(texts)  # pads 3 -> 4 rows
    assert embeds.shape[0] == 4
    want = engine.generate_text_response_batch(texts, max_new_tokens=12)

    for paged in (False, True):
        dec = SlotDecoder(
            engine.llm_params, engine.llm_cfg, eos_id=engine.tokenizer.eos_id,
            n_slots=6, max_prompt_len=256, max_new_tokens=16,
            cache_dtype=engine.cache_dtype, paged=paged, page_size=64,
        )
        free0 = dec.allocator.free_pages if paged else None
        # 3 slot_ids for 4 embed rows: row 3 is builder padding
        dec.admit(embeds, mask, [0, 1, 2], [12, 12, 12])
        if paged:
            held = sum(
                int(np.count_nonzero(dec._host_table[s])) for s in (0, 1, 2)
            )
            # ONLY the real rows reserved pages; the pad row took none
            assert dec.allocator.free_pages == free0 - held
            assert np.count_nonzero(dec._host_table[3:]) == 0
        _drain(dec)
        got = {}
        for slot, tokens, cnt in dec.harvest():
            got[slot] = engine.tokenizer.decode(
                tokens[: min(cnt, 12)].tolist(), skip_special_tokens=True
            )
        assert [got[0], got[1], got[2]] == want, f"paged={paged}"
        if paged:
            assert dec.allocator.free_pages == free0


def test_admit_rejects_more_slots_than_rows(engine):
    texts = ["one"]
    embeds, mask = engine.build_text_prompt_batch(texts)
    dec = SlotDecoder(
        engine.llm_params, engine.llm_cfg, eos_id=engine.tokenizer.eos_id,
        n_slots=4, max_prompt_len=256, max_new_tokens=8,
        cache_dtype=engine.cache_dtype,
    )
    with pytest.raises(ValueError, match="slot_ids"):
        dec.admit(embeds, mask, [0, 1], [8, 8])
    with pytest.raises(ValueError, match="equal length"):
        dec.admit(embeds, mask, [0], [8, 8])
