"""Speculative decode chunks in the serving slot decoder (VERDICT r2 #10,
serving side). Contract: spec chunks are an ACCELERATION of the plain
greedy chunk path — identical tokens and counts for any mix of budgets,
EOS timing, and mid-decode admission. (Reference decode loop:
inference.py:55-74 — one token per forward, no speculative path.)"""

import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.infer.slots import SlotDecoder
from llm_speech_summarization_tpu.models.llama import (
    init_llama_params,
    llama_preset,
)

TINY = llama_preset("tiny")
TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs",
    "yaml", "tiny_test.yaml",
)


@pytest.fixture(scope="module")
def params():
    return init_llama_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)


def _prompts(params, seed=3, B=3, L=16, pads=(0, 5, 2)):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, TINY.vocab_size, (B, L))
    mask = np.arange(L)[None, :] >= np.asarray(pads)[:, None]
    emb = np.asarray(params["embed_tokens"])[ids] * mask[..., None]
    return jnp.asarray(emb), jnp.asarray(mask)


def _make(params, eos, spec_k=0, n_slots=4, max_new=24, paged=False,
          cache_dtype=jnp.float32):
    return SlotDecoder(
        params, TINY, eos_id=eos, n_slots=n_slots, max_prompt_len=64,
        max_new_tokens=max_new, cache_dtype=cache_dtype, spec_k=spec_k,
        paged=paged,
    )


def _drain(dec, spec, chunk=3, limit=40):
    for _ in range(limit):
        if dec.live_count() == 0:
            break
        dec.decode_chunk(chunk, spec=spec)


def _run(dec, embeds, mask, slots, budgets, spec):
    dec.admit(embeds, mask, list(slots), list(budgets))
    _drain(dec, spec)
    return {s: (t, n) for s, t, n in dec.harvest()}


def _assert_same(got, want):
    assert set(got) == set(want)
    for s in want:
        tw, nw = want[s]
        tg, ng = got[s]
        assert ng == nw, (s, ng, nw)
        np.testing.assert_array_equal(tg[:ng], tw[:nw], err_msg=f"slot {s}")


def test_spec_chunks_match_plain_greedy(params):
    """Budget-capped rows (EOS never fires): spec chunks at k=2 and k=4
    emit exactly the plain chunk path's tokens, including mixed budgets."""
    embeds, mask = _prompts(params)
    budgets = [24, 7, 16]
    want = _run(_make(params, eos=511), embeds, mask, [0, 1, 2], budgets, False)
    for k in (2, 4):
        got = _run(
            _make(params, eos=511, spec_k=k), embeds, mask, [0, 1, 2],
            budgets, True,
        )
        _assert_same(got, want)


def test_spec_eos_mid_round_matches_plain(params):
    """An EOS landing inside a committed draft window truncates the round
    exactly like stepwise greedy: pick an eos id that actually occurs
    mid-stream in the free-running output."""
    embeds, mask = _prompts(params, seed=11, pads=(0, 0, 0))
    free = _run(_make(params, eos=-1), embeds, mask, [0, 1, 2], [24] * 3, False)
    eos = int(free[0][0][7])  # a token emitted mid-stream by row 0
    want = _run(_make(params, eos=eos), embeds, mask, [0, 1, 2], [24] * 3, False)
    assert min(n for _, n in want.values()) < 24, "eos must actually trigger"
    for k in (2, 4):
        got = _run(
            _make(params, eos=eos, spec_k=k), embeds, mask, [0, 1, 2],
            [24] * 3, True,
        )
        _assert_same(got, want)


def test_spec_mid_decode_admission(params):
    """A row admitted while others are mid-speculation gets the same
    output as a fresh plain run — per-row offsets keep the rejected-tail
    overwrites inside each slot's own cache row."""
    embeds, mask = _prompts(params, seed=7)
    want = _run(_make(params, eos=511), embeds, mask, [0, 1, 2], [20] * 3, False)

    dec = _make(params, eos=511, spec_k=3)
    dec.admit(embeds[:2], mask[:2], [0, 1], [20, 20])
    dec.decode_chunk(2, spec=True)  # rows 0/1 mid-flight with rejected tails
    dec.admit(embeds[2:3], mask[2:3], [2], [20])
    _drain(dec, spec=True)
    got = {s: (t, n) for s, t, n in dec.harvest()}
    _assert_same(got, want)


def test_spec_slot_reuse_after_harvest(params):
    """A slot freed by a spec-chunk harvest serves a new request
    correctly (the verification headroom writes never leak across
    admissions)."""
    embeds, mask = _prompts(params, seed=5)
    want = _run(_make(params, eos=511), embeds, mask, [0, 1, 2], [10] * 3, False)

    dec = _make(params, eos=511, spec_k=4, n_slots=2)
    got = _run(dec, embeds[:2], mask[:2], [0, 1], [10, 10], True)
    got.update(
        {2 if s == 0 else s: (t, n) for s, (t, n) in
         _run(dec, embeds[2:3], mask[2:3], [0], [10], True).items()}
    )
    _assert_same(got, want)


def test_spec_contract_errors(params):
    with pytest.raises(ValueError, match="repetition_penalty"):
        SlotDecoder(params, TINY, eos_id=0, spec_k=2,
                    repetition_penalty=1.2, cache_dtype=jnp.float32)


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_spec_paged_chunks_match_paged_plain(params, cache_dtype):
    """spec × paged composes: speculative chunks over the PAGED cache emit
    exactly the plain paged chunk path's tokens (the verification forward
    attends [pad, offset) through the page tables + the fresh block
    causally; write_tokens scatters the k+1 fresh K/V through the tables;
    rejected tails are overwritten in place on reserved pages). int8 pools
    exercise the quantized write_tokens path."""
    embeds, mask = _prompts(params, seed=9)
    budgets = [24, 7, 16]
    want = _run(
        _make(params, eos=511, paged=True, cache_dtype=cache_dtype),
        embeds, mask, [0, 1, 2], budgets, False,
    )
    for k in (2, 4):
        got = _run(
            _make(params, eos=511, spec_k=k, paged=True, cache_dtype=cache_dtype),
            embeds, mask, [0, 1, 2], budgets, True,
        )
        _assert_same(got, want)


def test_spec_paged_matches_dense_spec(params):
    """Paged spec chunks == dense spec chunks == dense plain chunks at
    matched (f32) precision — one three-way token identity."""
    embeds, mask = _prompts(params, seed=13)
    budgets = [20, 9, 20]
    want = _run(_make(params, eos=511), embeds, mask, [0, 1, 2], budgets, False)
    dense_spec = _run(
        _make(params, eos=511, spec_k=3), embeds, mask, [0, 1, 2], budgets, True
    )
    paged_spec = _run(
        _make(params, eos=511, spec_k=3, paged=True), embeds, mask,
        [0, 1, 2], budgets, True,
    )
    _assert_same(dense_spec, want)
    _assert_same(paged_spec, want)


def test_spec_paged_slot_reuse_and_eos(params):
    """Paged spec lifecycle: EOS mid-draft truncates exactly like plain
    paged, and a harvested slot's pages serve a new request (verification
    headroom writes stay on the row's reserved pages)."""
    embeds, mask = _prompts(params, seed=11, pads=(0, 0, 0))
    free = _run(
        _make(params, eos=-1, paged=True), embeds, mask, [0, 1, 2], [24] * 3,
        False,
    )
    eos = int(free[0][0][7])
    want = _run(
        _make(params, eos=eos, paged=True), embeds, mask, [0, 1, 2], [24] * 3,
        False,
    )
    assert min(n for _, n in want.values()) < 24, "eos must actually trigger"
    dec = _make(params, eos=eos, spec_k=3, paged=True, n_slots=2)
    got = _run(dec, embeds[:2], mask[:2], [0, 1], [24, 24], True)
    got.update(
        {2 if s == 0 else s: (t, n) for s, (t, n) in
         _run(dec, embeds[2:3], mask[2:3], [0], [24], True).items()}
    )
    _assert_same(got, want)


def test_spec_governor_demotes_and_probes():
    """α≈0 observations drive the governor below threshold (spec chunks
    become pure overhead → plain chunks), it keeps probing periodically,
    and real acceptance re-enables spec."""
    from llm_speech_summarization_tpu.serve.server import _SpecGovernor

    gov = _SpecGovernor(spec_k=4, threshold=0.05, probe_every=8, ema_decay=0.7)
    assert gov.want_spec()  # optimistic start
    for _ in range(10):  # α=0: every live row emits exactly 1/round
        gov.observe(rounds=8, deltas=[8, 8, 8])
    assert gov.acceptance < gov.threshold
    # demoted: mostly plain, but probes exactly every probe_every chunks
    picks = [gov.want_spec() for _ in range(24)]
    assert picks.count(True) == 3 and not picks[0]
    assert picks[7] and picks[15] and picks[23]
    # high acceptance on a probe re-enables spec immediately
    for _ in range(4):  # rows emit ~3 bonus tokens/round at k=4 (α≈0.75)
        gov.observe(rounds=8, deltas=[32, 28, 30])
    assert gov.acceptance >= gov.threshold
    assert gov.want_spec()
    # truncated rows (done mid-chunk → delta < rounds) never go negative
    gov2 = _SpecGovernor(spec_k=4)
    gov2.observe(rounds=8, deltas=[3])
    assert gov2.acceptance >= 0.0


def test_spec_flag_demotes_gracefully_with_incompatible_modes():
    """--speculative_k with a repetition penalty must SERVE (spec silently
    disabled, like the engine's own gate), not die on the SlotDecoder
    library-contract ValueError at startup — while --speculative_k with
    --paged now COMPOSES (paged verification forwards + write_tokens)."""
    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.serve.server import (
        ContinuousBatchingEngine,
    )

    engine = LLMSpeechTextInference(load_config(TINY_YAML))
    cb = ContinuousBatchingEngine(engine, n_slots=2, spec_k=3, paged=True,
                                  max_prompt_len=128, max_new_tokens=16)
    try:
        assert cb.decoder.spec_k == 3 and cb.decoder.paged
        assert cb.spec_governor is not None
    finally:
        cb.shutdown()

    engine.repetition_penalty = 1.1
    cb = ContinuousBatchingEngine(engine, n_slots=2, spec_k=3,
                                  max_prompt_len=128, max_new_tokens=16)
    try:
        assert cb.decoder.spec_k == 0
    finally:
        cb.shutdown()
    engine.repetition_penalty = 1.0


def test_spec_governor_observes_single_chunk_requests():
    """Requests that complete within their FIRST chunk must still feed the
    governor (seeded at admission): with α≈0 all-short traffic the
    acceptance estimate must fall, not stay frozen at the optimistic
    start."""
    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.serve.server import (
        ContinuousBatchingEngine,
        _Request,
    )

    engine = LLMSpeechTextInference(load_config(TINY_YAML))
    cb = ContinuousBatchingEngine(
        engine, n_slots=4, chunk_steps=8, max_prompt_len=256,
        max_new_tokens=16, spec_k=3,
    )
    start = cb.spec_governor.acceptance
    try:
        results = {}

        def run(i):
            # budget 6 < chunk_steps: finishes within one chunk
            results[i] = cb.submit(
                _Request("text", f"short request {i}", "", 6), timeout=180
            )

        threads = [threading.Thread(target=run, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert len(results) == 6
        assert cb.spec_governor.acceptance != start, (
            "governor never observed single-chunk requests"
        )
    finally:
        cb.shutdown()


def test_spec_continuous_engine_e2e():
    """The continuous scheduler with spec_k: greedy requests match the
    one-shot engine exactly; a live sampling request makes the scheduler
    fall back to plain chunks (and still completes)."""
    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.serve.server import (
        ContinuousBatchingEngine,
        _Request,
    )

    engine = LLMSpeechTextInference(load_config(TINY_YAML))
    texts = ["speculate about turtles", "another prompt entirely", "third one"]
    want = engine.generate_text_response_batch(texts, max_new_tokens=12)

    cb = ContinuousBatchingEngine(
        engine, n_slots=4, chunk_steps=2, max_prompt_len=256,
        max_new_tokens=16, spec_k=3,
    )
    assert cb.decoder.spec_k == 3
    try:
        results = {}

        def run(i):
            results[i] = cb.submit(_Request("text", texts[i], "", 12), timeout=180)

        def run_sampled():
            req = _Request("text", "sampled request", "", 8)
            req.temperature = 0.9
            req.seed = 7
            results["sampled"] = cb.submit(req, timeout=180)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        threads.append(threading.Thread(target=run_sampled))
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for i in range(3):
            assert results[i] == want[i], (i, results[i], want[i])
        assert isinstance(results["sampled"], str)
    finally:
        cb.shutdown()
