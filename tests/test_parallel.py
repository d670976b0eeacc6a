"""Sharded execution on the 8-device virtual CPU mesh (conftest forces it).

The same code runs unchanged on a real TPU slice (SURVEY.md §4).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.data import SyntheticSpeechDataset, collate_batch
from llm_speech_summarization_tpu.models.audio_encoder import (
    audio_encoder_forward,
    encoder_setup_from_config,
    init_audio_encoder,
)
from llm_speech_summarization_tpu.models.llama import init_llama_params, llama_preset
from llm_speech_summarization_tpu.parallel import (
    encoder_param_spec,
    llama_param_spec,
    mesh_from_devices,
    shard_batch,
    shard_params,
)
from llm_speech_summarization_tpu.train import make_train_state, make_train_step
from llm_speech_summarization_tpu.utils.prompts import prompt_template_for
from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)

needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _setup(batch_size):
    cfg = load_config(TINY_YAML)
    cfg.train.batch_size = batch_size
    tok = ByteTokenizer()
    tpl = prompt_template_for(cfg.model.llm_type)
    prefix = jnp.asarray(tok.encode(tpl.prefix, add_bos=True), jnp.int32)
    suffix = jnp.asarray(tok.encode(tpl.suffix, add_bos=False), jnp.int32)
    llm_cfg = llama_preset("tiny")
    llm_params = init_llama_params(jax.random.PRNGKey(0), llm_cfg, dtype=jnp.float32)
    enc_setup = encoder_setup_from_config(cfg)
    enc_params = init_audio_encoder(jax.random.PRNGKey(1), enc_setup, dtype=jnp.float32)
    ds = SyntheticSpeechDataset(tok, num_samples=batch_size, max_seconds=1.5)
    batch = collate_batch(
        [ds[i] for i in range(batch_size)],
        audio_buckets=cfg.train.buckets.audio_samples,
        max_text_tokens=cfg.train.buckets.max_text_tokens,
        max_response_tokens=cfg.train.buckets.max_response_tokens,
    )
    return cfg, tok, prefix, suffix, llm_cfg, llm_params, enc_setup, enc_params, batch


def _total_len(cfg, enc_setup, enc_params, batch, prefix, suffix):
    out, _ = jax.eval_shape(
        lambda p, w, l: audio_encoder_forward(p, enc_setup, w, l),
        enc_params,
        jax.ShapeDtypeStruct(batch.wav.shape, jnp.float32),
        jax.ShapeDtypeStruct(batch.wav_lens.shape, jnp.int32),
    )
    P, S = prefix.shape[0], suffix.shape[0]
    need = P + max(out.shape[1], cfg.train.buckets.max_text_tokens) + S + (
        cfg.train.buckets.max_response_tokens
    )
    return ((need + 63) // 64) * 64


@needs_8_devices
def test_sharded_train_step_matches_single_device():
    """dp=4 × tp=2 sharded KD train step == unsharded step, bitwise-close."""
    (cfg, tok, prefix, suffix, llm_cfg, llm_params, enc_setup, enc_params, batch) = _setup(8)
    total_len = _total_len(cfg, enc_setup, enc_params, batch, prefix, suffix)

    # unsharded reference
    state0, tx = make_train_state(cfg, enc_params, total_opt_steps=10)
    step = make_train_step(cfg, enc_setup, llm_cfg, tx, prefix, suffix, total_len, donate=False)
    _, ref_metrics = step(state0, llm_params, batch)

    # sharded
    mesh = mesh_from_devices(data=4, model=2)
    with mesh:
        llm_sh = shard_params(mesh, llm_params, llama_param_spec(llm_params))
        enc_sh = shard_params(mesh, enc_params, encoder_param_spec(enc_params))
        batch_sh = shard_batch(mesh, batch)
        state_sh, tx2 = make_train_state(cfg, enc_sh, total_opt_steps=10)
        step_sh = make_train_step(
            cfg, enc_setup, llm_cfg, tx2, prefix, suffix, total_len, donate=False
        )
        new_state, metrics = step_sh(state_sh, llm_sh, batch_sh)

    for key in ("total_loss", "ntp_loss", "ld_loss", "fd_loss"):
        assert np.isfinite(float(metrics[key]))
        np.testing.assert_allclose(
            float(metrics[key]), float(ref_metrics[key]), rtol=5e-3, atol=5e-4
        )


@needs_8_devices
def test_tp_sharded_generation_matches_replicated():
    """Tensor-parallel generation must emit the same tokens as single-device."""
    from llm_speech_summarization_tpu.infer.generate import greedy_generate

    llm_cfg = llama_preset("tiny")
    llm_params = init_llama_params(jax.random.PRNGKey(0), llm_cfg, dtype=jnp.float32)
    B, L = 4, 16
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, L), 1, llm_cfg.vocab_size)
    mask = jnp.ones((B, L), bool)
    embeds = llm_params["embed_tokens"][ids]

    ref_tokens, _ = greedy_generate(
        llm_params, llm_cfg, embeds, mask, max_new_tokens=8, eos_id=257,
        cache_dtype=jnp.float32,
    )

    mesh = mesh_from_devices(data=4, model=2)
    with mesh:
        llm_sh = shard_params(mesh, llm_params, llama_param_spec(llm_params))
        embeds_sh = shard_batch(mesh, embeds)
        mask_sh = shard_batch(mesh, mask)
        tp_tokens, _ = greedy_generate(
            llm_sh, llm_cfg, embeds_sh, mask_sh, max_new_tokens=8, eos_id=257,
            cache_dtype=jnp.float32,
        )
    np.testing.assert_array_equal(np.asarray(tp_tokens), np.asarray(ref_tokens))


@needs_8_devices
def test_zero1_sharded_opt_state_matches_replicated():
    """ZeRO-1: optimizer state sharded over "data" produces the same update
    (and the returned moments stay sharded) as the replicated state."""
    from llm_speech_summarization_tpu.parallel.sharding import opt_state_spec

    (cfg, tok, prefix, suffix, llm_cfg, llm_params, enc_setup, enc_params, batch) = _setup(8)
    total_len = _total_len(cfg, enc_setup, enc_params, batch, prefix, suffix)

    state0, tx = make_train_state(cfg, enc_params, total_opt_steps=10)
    step = make_train_step(cfg, enc_setup, llm_cfg, tx, prefix, suffix, total_len, donate=False)
    ref_state, ref_metrics = step(state0, llm_params, batch)

    mesh = mesh_from_devices(data=8, model=1)
    with mesh:
        spec = opt_state_spec(state0.opt_state, mesh)
        # at least one large moment leaf actually got a "data" spec
        from jax.sharding import PartitionSpec as P

        specs = jax.tree_util.tree_leaves(
            spec, is_leaf=lambda s: isinstance(s, P)
        )
        assert any(s == P("data") for s in specs), "nothing sharded"
        opt_sh = shard_params(mesh, state0.opt_state, spec)
        state_sh = state0._replace(opt_state=opt_sh)
        batch_sh = shard_batch(mesh, batch)
        new_state, metrics = step(state_sh, llm_params, batch_sh)

    for key in ("total_loss", "grad_norm"):
        np.testing.assert_allclose(
            float(metrics[key]), float(ref_metrics[key]), rtol=5e-3, atol=5e-4
        )
    # updated params identical to the replicated run
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.enc_params),
        jax.tree_util.tree_leaves(new_state.enc_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_distributed_init_single_process_noop():
    """distributed_init is a no-op without coordinator env/args."""
    from llm_speech_summarization_tpu.parallel.mesh import distributed_init

    assert distributed_init() is False


def test_mesh_seq_axis_construction():
    """mesh.seq > 1 inserts a 'seq' axis between data and model."""
    from llm_speech_summarization_tpu.parallel.mesh import mesh_from_devices

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 devices")
    m = mesh_from_devices(data=2, model=2, seq=2)
    assert m.axis_names == ("data", "seq", "model")
    assert dict(m.shape) == {"data": 2, "seq": 2, "model": 2}
    m2 = mesh_from_devices(data=-1, model=2, seq=2)
    assert dict(m2.shape)["data"] == 2


def test_distributed_init_env_args(monkeypatch):
    """LSS_* env vars drive jax.distributed.initialize; idempotent after."""
    import llm_speech_summarization_tpu.parallel.mesh as M

    calls = {}
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: calls.update(kw))
    monkeypatch.setenv("LSS_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("LSS_NUM_PROCESSES", "4")
    monkeypatch.setenv("LSS_PROCESS_ID", "2")
    monkeypatch.setattr(M, "_DISTRIBUTED_INITIALIZED", False)
    try:
        assert M.distributed_init() is True
        assert calls == {
            "coordinator_address": "10.0.0.1:1234",
            "num_processes": 4,
            "process_id": 2,
        }
        calls.clear()
        assert M.distributed_init() is True  # second call: no re-init
        assert calls == {}
    finally:
        M._DISTRIBUTED_INITIALIZED = False
