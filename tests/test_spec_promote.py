"""Spec governor PROMOTE path (VERDICT r3 #7).

Round 3 only ever measured the governor at α≈0 (random weights reject
every draft → demote). This drives the other side: an LLM whose weights
are zeroed emits a constant token stream (all logits equal → argmax is
token 0 every step — the degenerate form of the reference's documented
greedy-repetition failure mode, reference: inference.py:169-171), which
the output-history n-gram drafter predicts perfectly. The governor must
MEASURE that acceptance live and keep speculative chunks enabled, and
the spec run must finish in fewer decode chunks than the plain run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
from llm_speech_summarization_tpu.serve.server import (
    ContinuousBatchingEngine,
    _Request,
    _SpecGovernor,
)

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs",
    "yaml", "tiny_test.yaml",
)


@pytest.fixture(scope="module")
def repetitive_engine():
    """Engine whose LLM emits a constant token: zeroed weights make every
    logit equal, so greedy argmax picks token 0 forever (ByteTokenizer's
    eos is 257 — the stream never terminates on its own)."""
    eng = LLMSpeechTextInference(load_config(TINY_YAML))
    eng.llm_params = jax.tree_util.tree_map(
        lambda a: a * 0 if jnp.issubdtype(a.dtype, jnp.floating) else a,
        eng.llm_params,
    )
    return eng


def test_governor_promotes_on_repetitive_stream(repetitive_engine):
    cb = ContinuousBatchingEngine(
        repetitive_engine, n_slots=4, chunk_steps=4, max_prompt_len=256,
        max_new_tokens=32, spec_k=4,
    )
    try:
        gov = cb.spec_governor
        assert gov is not None
        out = cb.submit(_Request("text", "repeat after me", "", 32), timeout=300)
        assert isinstance(out, str)
        # constant-token stream → every draft accepted → measured
        # acceptance ~1.0, far above the demote threshold
        assert gov.acceptance > gov.threshold, gov.acceptance
        assert gov.want_spec()
    finally:
        cb.shutdown()


def test_governor_demotes_then_reprobes_unit():
    """Unit-level: the EMA demotes under sustained α=0 observations and
    re-probes every probe_every chunks (the round-3 measured path)."""
    gov = _SpecGovernor(spec_k=4, threshold=0.05, probe_every=8)
    for _ in range(10):
        gov.observe(rounds=4, deltas=[4, 4, 4])  # exactly 1 token/round
    assert gov.acceptance < gov.threshold
    probes = [gov.want_spec() for _ in range(20)]
    assert not probes[0]
    assert any(probes), "governor must keep probing after demotion"
    # a burst of perfect acceptance promotes it back
    for _ in range(6):
        gov.observe(rounds=4, deltas=[4 + 4 * 4] * 3)  # k accepted per round
    assert gov.acceptance > gov.threshold
    assert gov.want_spec()


def test_spec_run_uses_fewer_chunks_than_plain(repetitive_engine):
    """The throughput mechanism behind promotion: on the repetitive
    stream a spec chunk commits up to k+1 tokens per round, so the run
    needs fewer decode chunks (each chunk is a device dispatch — the
    dominant serving cost on a remote-dispatch backend)."""
    counts = {}
    for spec_k in (0, 4):
        cb = ContinuousBatchingEngine(
            repetitive_engine, n_slots=4, chunk_steps=4, max_prompt_len=256,
            max_new_tokens=32, spec_k=spec_k,
        )
        try:
            dec = cb.decoder
            calls = {"n": 0}
            orig = dec.decode_chunk

            def counted(*a, **kw):
                calls["n"] += 1
                return orig(*a, **kw)

            dec.decode_chunk = counted
            out = cb.submit(_Request("text", "repeat after me", "", 32),
                            timeout=300)
            assert isinstance(out, str)
            counts[spec_k] = calls["n"]
        finally:
            cb.shutdown()
    assert counts[4] < counts[0], counts
