import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.models import (
    hubert_forward,
    hubert_preset,
    init_hubert_params,
    init_llama_params,
    init_whisper_params,
    llama_forward,
    llama_preset,
    whisper_forward,
    whisper_preset,
)
from llm_speech_summarization_tpu.models.hubert import hubert_frame_count
from llm_speech_summarization_tpu.models.llama import init_kv_cache
from llm_speech_summarization_tpu.models.whisper import log_mel_spectrogram

TINY = llama_preset("tiny")


@pytest.fixture(scope="module")
def tiny_llama():
    return init_llama_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)


def test_llama_forward_shapes(tiny_llama):
    B, T = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, TINY.vocab_size)
    out = llama_forward(tiny_llama, TINY, input_ids=ids, return_hidden=True)
    assert out.logits.shape == (B, T, TINY.vocab_size)
    assert out.hidden_states.shape == (TINY.num_layers + 1, B, T, TINY.hidden_size)
    assert bool(jnp.isfinite(out.logits).all())


def test_llama_leftpad_invariance(tiny_llama):
    """Left-padding must not change logits at real positions."""
    T = 10
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, T), 0, TINY.vocab_size)
    out_plain = llama_forward(tiny_llama, TINY, input_ids=ids)

    pad = 4
    ids_padded = jnp.concatenate([jnp.zeros((1, pad), ids.dtype), ids], axis=1)
    mask = jnp.concatenate([jnp.zeros((1, pad), bool), jnp.ones((1, T), bool)], axis=1)
    out_padded = llama_forward(tiny_llama, TINY, input_ids=ids_padded, attn_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_padded.logits[:, pad:]), np.asarray(out_plain.logits), rtol=2e-4, atol=2e-4
    )


def test_llama_prefill_decode_matches_full(tiny_llama):
    """Prefill + single-token decode must reproduce the full-forward logits."""
    B, T_pre, n_new, S = 2, 8, 4, 16
    rng = jax.random.PRNGKey(3)
    ids = jax.random.randint(rng, (B, T_pre + n_new), 1, TINY.vocab_size)
    # left-pad sample 1 by 3 within the prefill segment
    pad = jnp.array([0, 3])
    pre_mask = jnp.arange(T_pre)[None, :] >= pad[:, None]
    ids_pre = jnp.where(pre_mask, ids[:, :T_pre], 0)

    # full forward over everything (mask covers pads)
    full_mask = jnp.concatenate([pre_mask, jnp.ones((B, n_new), bool)], axis=1)
    full_ids = jnp.concatenate([ids_pre, ids[:, T_pre:]], axis=1)
    out_full = llama_forward(tiny_llama, TINY, input_ids=full_ids, attn_mask=full_mask)

    # prefill
    cache = init_kv_cache(TINY, B, S, dtype=jnp.float32)
    out_pre = llama_forward(
        tiny_llama, TINY, input_ids=ids_pre, attn_mask=pre_mask,
        kv_cache=cache, cache_offset=0,
    )
    # compare only real positions (fully-masked pad rows are garbage by design)
    diff = np.abs(np.asarray(out_pre.logits) - np.asarray(out_full.logits[:, :T_pre]))
    assert (diff * np.asarray(pre_mask)[..., None]).max() < 2e-4
    cache = out_pre.kv_cache

    # decode one token at a time
    lens = jnp.sum(pre_mask, axis=1)  # real lengths
    slots = jnp.arange(S, dtype=jnp.int32)
    for step in range(n_new):
        tok = full_ids[:, T_pre + step][:, None]
        positions = (lens + step)[:, None]
        # cache-slot validity excludes the token being fed (it rides along
        # as a fresh key inside the forward)
        kv_valid = (slots[None, :] < T_pre + step) & jnp.concatenate(
            [pre_mask, jnp.ones((B, S - T_pre), bool)], axis=1
        )
        out_dec = llama_forward(
            tiny_llama, TINY, input_ids=tok,
            attn_mask=jnp.ones((B, 1), bool), positions=positions,
            kv_cache=cache, cache_offset=jnp.int32(T_pre + step), kv_valid=kv_valid,
        )
        cache = out_dec.kv_cache
        np.testing.assert_allclose(
            np.asarray(out_dec.logits[:, 0]),
            np.asarray(out_full.logits[:, T_pre + step]),
            rtol=2e-4,
            atol=2e-4,
        )


def test_llama_inputs_embeds_path(tiny_llama):
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 6), 0, TINY.vocab_size)
    emb = tiny_llama["embed_tokens"][ids]
    out_ids = llama_forward(tiny_llama, TINY, input_ids=ids)
    out_emb = llama_forward(tiny_llama, TINY, inputs_embeds=emb)
    np.testing.assert_allclose(np.asarray(out_ids.logits), np.asarray(out_emb.logits), rtol=1e-6)


HUBERT_TINY = hubert_preset("tiny")


def test_hubert_shapes_and_frame_count():
    params = init_hubert_params(jax.random.PRNGKey(0), HUBERT_TINY, dtype=jnp.float32)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 16000)) * 0.1
    frames, mask = hubert_forward(params, HUBERT_TINY, wav)
    expected_T = int(hubert_frame_count(HUBERT_TINY, jnp.asarray(16000)))
    assert frames.shape == (2, expected_T, HUBERT_TINY.hidden_size)
    assert bool(mask.all())
    # ~20ms frames: 1s of 16kHz ≈ 49 frames
    assert 45 <= expected_T <= 50


def test_hubert_batch_padding_invariance():
    params = init_hubert_params(jax.random.PRNGKey(0), HUBERT_TINY, dtype=jnp.float32)
    wav_short = jax.random.normal(jax.random.PRNGKey(2), (1, 8000)) * 0.1
    frames_single, _ = hubert_forward(params, HUBERT_TINY, wav_short)
    T_short = int(hubert_frame_count(HUBERT_TINY, jnp.asarray(8000)))

    wav_long = jax.random.normal(jax.random.PRNGKey(3), (1, 16000)) * 0.1
    batch = jnp.concatenate([jnp.pad(wav_short, ((0, 0), (0, 8000))), wav_long], axis=0)
    lens = jnp.array([8000, 16000])
    mask = jnp.arange(16000)[None, :] < lens[:, None]
    frames_batch, fmask = hubert_forward(params, HUBERT_TINY, batch, mask)
    assert int(fmask[0].sum()) == T_short
    np.testing.assert_allclose(
        np.asarray(frames_batch[0, :T_short]),
        np.asarray(frames_single[0, :T_short]),
        rtol=2e-3,
        atol=2e-3,
    )


WHISPER_TINY = whisper_preset("tiny")


def test_log_mel_shapes_and_range():
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 32000)) * 0.1
    mel = log_mel_spectrogram(wav, WHISPER_TINY, pad_to_frames=3000)
    assert mel.shape == (2, 80, 3000)
    m = np.asarray(mel)
    assert np.isfinite(m).all()
    # whisper normalization: per-sample dynamic range clamped to 8 dB → ≤ 2.0
    for b in range(m.shape[0]):
        assert (m[b].max() - m[b].min()) <= 2.0 + 1e-5


def test_whisper_encoder_shapes():
    params = init_whisper_params(jax.random.PRNGKey(0), WHISPER_TINY, dtype=jnp.float32)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 48000)) * 0.1
    mel = log_mel_spectrogram(wav, WHISPER_TINY, pad_to_frames=3000)
    counts = jnp.array([48000 // 160, 24000 // 160])
    frames, fmask = whisper_forward(params, WHISPER_TINY, mel, counts)
    assert frames.shape == (2, 1500, WHISPER_TINY.d_model)
    assert int(fmask[0].sum()) == 150
    assert int(fmask[1].sum()) == 75
    assert bool(jnp.isfinite(frames).all())
