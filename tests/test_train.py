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
