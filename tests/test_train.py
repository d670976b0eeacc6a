import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.data import SyntheticSpeechDataset, collate_batch
from llm_speech_summarization_tpu.models.audio_encoder import (
    encoder_setup_from_config,
    init_audio_encoder,
)
from llm_speech_summarization_tpu.models.llama import init_llama_params, llama_preset
from llm_speech_summarization_tpu.train import make_train_state, make_train_step
from llm_speech_summarization_tpu.utils.prompts import prompt_template_for
from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(TINY_YAML)
    tok = ByteTokenizer()
    tpl = prompt_template_for(cfg.model.llm_type)
    prefix = jnp.asarray(tok.encode(tpl.prefix, add_bos=True), jnp.int32)
    suffix = jnp.asarray(tok.encode(tpl.suffix, add_bos=False), jnp.int32)
    llm_cfg = llama_preset("tiny")
    llm_params = init_llama_params(jax.random.PRNGKey(0), llm_cfg, dtype=jnp.float32)
    enc_setup = encoder_setup_from_config(cfg)
    enc_params = init_audio_encoder(jax.random.PRNGKey(1), enc_setup, dtype=jnp.float32)
    ds = SyntheticSpeechDataset(tok, num_samples=8, max_seconds=2.0)
    batch = collate_batch(
        [ds[i] for i in range(2)],
        audio_buckets=cfg.train.buckets.audio_samples,
        max_text_tokens=cfg.train.buckets.max_text_tokens,
        max_response_tokens=cfg.train.buckets.max_response_tokens,
    )
    return cfg, llm_cfg, llm_params, enc_setup, enc_params, prefix, suffix, batch


def _total_len(cfg, prefix, suffix, M):
    P, S = prefix.shape[0], suffix.shape[0]
    R = cfg.train.buckets.max_response_tokens
    T = cfg.train.buckets.max_text_tokens
    return ((P + max(M, T) + S + R + 63) // 64) * 64


def test_train_step_decreases_loss(setup):
    cfg, llm_cfg, llm_params, enc_setup, enc_params, prefix, suffix, batch = setup
    state, tx = make_train_state(cfg, enc_params, total_opt_steps=100)
    # audio embeds buffer length via shape eval
    from llm_speech_summarization_tpu.models.audio_encoder import audio_encoder_forward

    out, _ = jax.eval_shape(
        lambda p, w, l: audio_encoder_forward(p, enc_setup, w, l),
        state.enc_params,
        jax.ShapeDtypeStruct(batch.wav.shape, jnp.float32),
        jax.ShapeDtypeStruct(batch.wav_lens.shape, jnp.int32),
    )
    total_len = _total_len(cfg, prefix, suffix, out.shape[1])
    step = make_train_step(cfg, enc_setup, llm_cfg, tx, prefix, suffix, total_len, donate=False)

    losses = []
    for _ in range(6):
        state, metrics = step(state, llm_params, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    # overfitting a single tiny batch must reduce the loss
    assert losses[-1] < losses[0], losses
    # all three loss terms present (reference: trainer.py:328-370)
    for key in ("ntp_loss", "ld_loss", "fd_loss"):
        assert key in metrics


def test_train_step_int8_frozen_llm(setup):
    """Weight-only int8 frozen LLM in the TRAINING step (the serving path
    has had it since round 2): the step runs with an int8 param tree —
    splice dequants after its gather, the fused NTP/LD loss dequants per
    vocab chunk — produces finite, decreasing losses close to the f32
    step's, and flows nonzero grads into the encoder."""
    cfg, llm_cfg, llm_params, enc_setup, enc_params, prefix, suffix, batch = setup
    from llm_speech_summarization_tpu.models.audio_encoder import audio_encoder_forward
    from llm_speech_summarization_tpu.models.llama import quantize_llama_params

    q_params = quantize_llama_params(
        jax.tree_util.tree_map(jnp.copy, llm_params)  # real copy: fn donates
    )
    assert q_params["embed_tokens"].dtype == jnp.int8

    state, tx = make_train_state(cfg, enc_params, total_opt_steps=100)
    out, _ = jax.eval_shape(
        lambda p, w, l: audio_encoder_forward(p, enc_setup, w, l),
        state.enc_params,
        jax.ShapeDtypeStruct(batch.wav.shape, jnp.float32),
        jax.ShapeDtypeStruct(batch.wav_lens.shape, jnp.int32),
    )
    total_len = _total_len(cfg, prefix, suffix, out.shape[1])
    step = make_train_step(cfg, enc_setup, llm_cfg, tx, prefix, suffix, total_len, donate=False)

    state_f32, _ = make_train_state(cfg, enc_params, total_opt_steps=100)
    _, m_f32 = step(state_f32, llm_params, batch)

    losses = []
    for _ in range(4):
        state, metrics = step(state, q_params, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert float(metrics["grad_norm"]) > 0
    # int8 perturbs the logits but the loss landscape must be the same
    # neighborhood (per-channel absmax keeps relative error ~1%)
    assert abs(losses[0] - float(m_f32["total_loss"])) / float(
        m_f32["total_loss"]
    ) < 0.05, (losses[0], float(m_f32["total_loss"]))


def test_fused_loss_int8_head_matches_dequant():
    """fused_ntp_ld_losses with (int8 head, scale) == the same call on the
    explicitly dequantized head (the chunked matmul dequant is exact up to
    multiply associativity)."""
    from llm_speech_summarization_tpu.ops.losses import fused_ntp_ld_losses

    rng = np.random.RandomState(0)
    B, W, D, V = 2, 6, 16, 64
    sh = jnp.asarray(rng.randn(B, W, D), jnp.float32)
    th = jnp.asarray(rng.randn(B, W, D), jnp.float32)
    q = jnp.asarray(rng.randint(-127, 128, (V, D)), jnp.int8)
    scale = jnp.asarray(0.01 + 0.05 * rng.rand(V), jnp.float32)
    labels = jnp.asarray(rng.randint(0, V, (B, W)), jnp.int32)
    mask = jnp.asarray(rng.rand(B, W) > 0.3)
    rmask = mask

    ntp_q, ld_q = fused_ntp_ld_losses(
        sh, th, q, labels, mask, rmask, vocab_chunk=16, head_scale=scale
    )
    head = q.astype(jnp.float32) * scale[:, None]
    ntp_d, ld_d = fused_ntp_ld_losses(
        sh, th, head, labels, mask, rmask, vocab_chunk=16
    )
    np.testing.assert_allclose(float(ntp_q), float(ntp_d), rtol=1e-5)
    np.testing.assert_allclose(float(ld_q), float(ld_d), rtol=1e-5)


def test_splice_int8_table_matches_dequant():
    """splice_sequences with (int8 table, table_scale) == splicing with the
    dequantized table."""
    from llm_speech_summarization_tpu.ops.splice import splice_sequences

    rng = np.random.RandomState(1)
    V, D, B, M = 32, 8, 2, 5
    q = jnp.asarray(rng.randint(-127, 128, (V, D)), jnp.int8)
    scale = jnp.asarray(0.01 + 0.1 * rng.rand(V), jnp.float32)
    prefix = jnp.asarray([1, 2, 3], jnp.int32)
    suffix = jnp.asarray([4, 5], jnp.int32)
    mid = jnp.asarray(rng.randn(B, M, D), jnp.float32)
    mid_lens = jnp.asarray([3, 5], jnp.int32)
    resp = jnp.asarray(rng.randint(1, V, (B, 4)), jnp.int32)
    resp_lens = jnp.asarray([4, 2], jnp.int32)

    a = splice_sequences(q, prefix, suffix, mid, mid_lens, resp, resp_lens,
                         total_len=16, table_scale=scale)
    table = q.astype(jnp.float32) * scale[:, None]
    b = splice_sequences(table, prefix, suffix, mid, mid_lens, resp, resp_lens,
                         total_len=16)
    np.testing.assert_allclose(np.asarray(a.embeds), np.asarray(b.embeds), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_array_equal(np.asarray(a.loss_mask), np.asarray(b.loss_mask))


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, llm_cfg, llm_params, enc_setup, enc_params, prefix, suffix, batch = setup
    from llm_speech_summarization_tpu.train import TrainState
    from llm_speech_summarization_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_train_checkpoint,
        save_train_checkpoint,
    )

    state, tx = make_train_state(cfg, enc_params, total_opt_steps=100)
    path = save_train_checkpoint(str(tmp_path / "ckpt"), 7, 2, state)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path
    restored, step, epoch = restore_train_checkpoint(path, state)
    assert step == 7 and epoch == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.enc_params),
        jax.tree_util.tree_leaves(restored["enc_params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_end_to_end(tmp_path):
    """Tiny synthetic run through the Trainer loop: 4 steps + validate +
    checkpoint + resume."""
    cfg = load_config(TINY_YAML)
    cfg.log.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.log.log_dir = str(tmp_path / "logs")
    cfg.log.num_generate_samples = 1

    from llm_speech_summarization_tpu.train.trainer import Trainer

    t = Trainer(cfg, run_name="t1")
    t.train()
    assert t.step == 4
    assert os.path.exists(os.path.join(cfg.log.log_dir, "t1", "metrics.jsonl"))

    # resume picks up the latest checkpoint
    t2 = Trainer(cfg, run_name="t1")
    assert t2.step == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(t.state.enc_params),
        jax.tree_util.tree_leaves(t2.state.enc_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_roundtrip(setup, tmp_path):
    """block=False saves overlap training (Orbax async): two successive
    async saves + finalize, then restore of the latest matches the state."""
    import numpy as np

    from llm_speech_summarization_tpu.train import checkpoint as ckpt

    cfg, llm_cfg, llm_params, enc_setup, enc_params, prefix, suffix, batch = setup
    from llm_speech_summarization_tpu.train import make_train_state

    state, _ = make_train_state(cfg, enc_params, total_opt_steps=10)
    base = str(tmp_path / "async_ckpt")
    ckpt.save_train_checkpoint(base, 1, 0, state, block=False)
    ckpt.save_train_checkpoint(base, 2, 0, state, block=False)  # waits for #1
    ckpt.finalize_saves()
    latest = ckpt.latest_checkpoint(base)
    assert latest and latest.endswith("step_2")
    restored, step, epoch = ckpt.restore_train_checkpoint(latest, state)
    assert (step, epoch) == (2, 0)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.enc_params),
        jax.tree_util.tree_leaves(restored["enc_params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
