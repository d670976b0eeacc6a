"""Regression tests for the round-3 fix batch (VERDICT r2 #8/#9 + ADVICE r2):
compile-cache CPU fingerprinting, loud tokenizer failures, tail-batch
sharding on a mesh, paged out-of-range write routing, and the streaming
UTF-8 delta boundary."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)


# ---------------------------------------------------------------------------
# compile cache: per-host-CPU partition (VERDICT r2 weak #5)
# ---------------------------------------------------------------------------

def test_compile_cache_dir_keyed_by_cpu_fingerprint(monkeypatch, tmp_path):
    from llm_speech_summarization_tpu.utils import compile_cache as cc

    fp = cc.host_cpu_fingerprint()
    assert fp == cc.host_cpu_fingerprint()  # stable within a host

    monkeypatch.setenv("LSS_COMPILE_CACHE", str(tmp_path / "cache"))
    assert cc.enable_compilation_cache()
    configured = jax.config.jax_compilation_cache_dir
    assert configured == os.path.join(str(tmp_path / "cache"), fp)

    # a different CPU feature set must land in a DIFFERENT directory —
    # XLA:CPU AOT artifacts are machine-feature specific (r2 dryrun SIGILL
    # warnings came from cross-host cache hits)
    monkeypatch.setattr(cc, "host_cpu_fingerprint", lambda: "otherarch-deadbeef1234")
    assert cc.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir != configured


# ---------------------------------------------------------------------------
# tokenizer: explicit path fails loudly (VERDICT r2 weak #6)
# ---------------------------------------------------------------------------

def test_explicit_tokenizer_path_failure_raises(tmp_path):
    from llm_speech_summarization_tpu.utils.tokenizer import (
        ByteTokenizer,
        load_tokenizer,
    )

    with pytest.raises(ValueError, match="tokenizer_path"):
        load_tokenizer("meta-llama/Llama-3.2-3B-Instruct",
                       local_path=str(tmp_path / "no_such_dir"))

    # default resolution still degrades gracefully offline
    tok = load_tokenizer("meta-llama/Llama-3.2-3B-Instruct")
    assert isinstance(tok, ByteTokenizer) or hasattr(tok, "eos_id")


# ---------------------------------------------------------------------------
# tail batch on a mesh: pad + shard instead of silent replicated placement
# (VERDICT r2 weak #6 tail note / next-round #9)
# ---------------------------------------------------------------------------

def _tiny_batch(B, rng):
    from llm_speech_summarization_tpu.data.batch import Batch

    return Batch(
        wav=rng.randn(B, 3200).astype(np.float32),
        wav_lens=np.full((B,), 3200, np.int32),
        text_ids=rng.randint(1, 250, (B, 12)).astype(np.int32),
        text_lens=np.full((B,), 12, np.int32),
        response_ids=rng.randint(1, 250, (B, 8)).astype(np.int32),
        response_lens=np.full((B,), 8, np.int32),
    )


def test_pad_batch_rows_shapes_and_zero_loss_rows():
    from llm_speech_summarization_tpu.parallel.sharding import pad_batch_rows

    rng = np.random.RandomState(0)
    batch = _tiny_batch(5, rng)
    padded = pad_batch_rows(batch, 4)
    assert padded.wav.shape[0] == 8
    assert list(np.asarray(padded.response_lens)) == [8] * 5 + [0, 0, 0]
    # padded rows replicate row 0's (valid) audio/text
    np.testing.assert_array_equal(np.asarray(padded.wav[5]), np.asarray(batch.wav[0]))
    # already-divisible batches pass through untouched
    assert pad_batch_rows(batch, 5) is batch


def test_padded_tail_step_matches_unpadded_loss():
    """A train step on a row-padded tail batch must produce the same losses
    and gradients as the unpadded batch (padded rows are zero-loss)."""
    from llm_speech_summarization_tpu.models.audio_encoder import (
        encoder_setup_from_config,
        init_audio_encoder,
    )
    from llm_speech_summarization_tpu.models.llama import init_llama_params, llama_preset
    from llm_speech_summarization_tpu.parallel.sharding import pad_batch_rows
    from llm_speech_summarization_tpu.train.state import make_train_state
    from llm_speech_summarization_tpu.train.step import make_train_step
    from llm_speech_summarization_tpu.utils.prompts import prompt_template_for
    from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

    cfg = load_config(TINY_YAML)
    rng = np.random.RandomState(1)
    key = jax.random.PRNGKey(0)
    llm_cfg = llama_preset(cfg.model.llm_preset or cfg.model.llm_type)
    llm_params = init_llama_params(key, llm_cfg, dtype=jnp.float32)
    enc_setup = encoder_setup_from_config(cfg)
    enc_params = init_audio_encoder(jax.random.PRNGKey(1), enc_setup, dtype=jnp.float32)
    state, tx = make_train_state(cfg, enc_params, 10)

    tok = ByteTokenizer()
    tpl = prompt_template_for(cfg.model.llm_type)
    prefix = jnp.asarray(tok.encode(tpl.prefix, add_bos=True), jnp.int32)
    suffix = jnp.asarray(tok.encode(tpl.suffix, add_bos=False), jnp.int32)

    batch = _tiny_batch(3, rng)
    padded = pad_batch_rows(batch, 4)
    step = make_train_step(cfg, enc_setup, llm_cfg, tx, prefix, suffix,
                           total_len=192, donate=False)
    _, m_ref = step(state, llm_params, batch)
    _, m_pad = step(state, llm_params, padded)
    for k in ("ntp_loss", "total_loss", "grad_norm"):
        np.testing.assert_allclose(
            float(m_ref[k]), float(m_pad[k]), rtol=2e-5, err_msg=k
        )


# ---------------------------------------------------------------------------
# paged cache: out-of-range writes sink to the null page (ADVICE r2)
# ---------------------------------------------------------------------------

def test_paged_write_past_table_sinks_to_null_page():
    from llm_speech_summarization_tpu.infer.paged import init_paged_cache, write_token

    cache = init_paged_cache(1, 1, 4, num_pages=6, page_size=4, batch=1,
                             max_pages_per_seq=2)
    # row owns pages 1 and 2 (positions 0..7); position 9 is past the table
    cache = cache._replace(
        page_table=jnp.asarray([[1, 2]], jnp.int32),
        lengths=jnp.asarray([8], jnp.int32),
    )
    k = jnp.ones((1, 1, 1, 4), jnp.bfloat16)
    out = write_token(cache, k, k, positions=jnp.asarray([9], jnp.int32))
    # the row's LAST page (2) must be untouched — the old clamp overwrote
    # slot 9%4 of page 2; only the null page 0 may absorb the write
    np.testing.assert_array_equal(
        np.asarray(out.k_pool[:, :, 1:], np.float32),
        np.asarray(cache.k_pool[:, :, 1:], np.float32),
    )
    assert float(jnp.sum(jnp.abs(out.k_pool[:, :, 0]))) > 0  # sank to null page


# ---------------------------------------------------------------------------
# streaming deltas: UTF-8 chunk boundaries hold back, never desync (ADVICE r2)
# ---------------------------------------------------------------------------

def test_emit_partials_holds_back_split_utf8():
    from llm_speech_summarization_tpu.serve.server import (
        ContinuousBatchingEngine,
        _Request,
    )
    from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    text = "naïve café"  # multi-byte chars
    ids = tok.encode(text, add_bos=False)

    class _Decoder:
        class state:  # noqa: N801 — attribute shim
            tokens = np.asarray([ids + [tok.eos_id] * (16 - len(ids))], np.int32)

    class _Engine:
        tokenizer = tok

    eng = ContinuousBatchingEngine.__new__(ContinuousBatchingEngine)
    eng.engine = _Engine()
    eng.decoder = _Decoder()
    req = _Request(kind="text", payload="", text_prompt="", max_new_tokens=16,
                   stream=True)
    eng._by_slot = {0: req}

    # feed the token stream one id at a time — every prefix that splits a
    # multi-byte character must be held back, and the final concatenation
    # must equal the true text exactly
    for n in range(1, len(ids) + 1):
        flags = (np.asarray([False]), np.asarray([16]), np.asarray([n]))
        eng._emit_partials(flags)
    got = []
    while not req.partials.empty():
        got.append(req.partials.get())
    assert "".join(got) == text
    assert "�" not in "".join(got)
