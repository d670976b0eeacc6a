"""End-to-end coverage of the non-default encoder/downsample variants:
Whisper encoder (reference: config/llama3_whisper.yaml) and the stack /
ctc_pool downsample methods (reference: model/audio_encoder.py:43-52)."""

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
from llm_speech_summarization_tpu.train import make_train_state, make_train_step
from llm_speech_summarization_tpu.utils.prompts import prompt_template_for
from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)


def _cfg(base: str, method: str):
    cfg = load_config(TINY_YAML)
    cfg.model.audio_encoder.base = base
    cfg.model.audio_encoder.downsample_method = method
    return cfg


@pytest.mark.parametrize(
    "base,method",
    [("hubert", "stack"), ("hubert", "ctc_pool"), ("whisper", "pool")],
)
def test_variant_train_step(base, method):
    """One KD train step must run and produce finite, decreasing loss for
    every encoder/downsample combination the reference supports."""
    cfg = _cfg(base, method)
    tok = ByteTokenizer()
    tpl = prompt_template_for(cfg.model.llm_type)
    prefix = jnp.asarray(tok.encode(tpl.prefix, add_bos=True), jnp.int32)
    suffix = jnp.asarray(tok.encode(tpl.suffix, add_bos=False), jnp.int32)
    llm_cfg = llama_preset("tiny")
    llm_params = init_llama_params(jax.random.PRNGKey(0), llm_cfg, dtype=jnp.float32)
    enc_setup = encoder_setup_from_config(cfg)
    enc_params = init_audio_encoder(jax.random.PRNGKey(1), enc_setup, dtype=jnp.float32)

    ds = SyntheticSpeechDataset(tok, num_samples=2, max_seconds=1.5)
    batch = collate_batch(
        [ds[i] for i in range(2)],
        audio_buckets=cfg.train.buckets.audio_samples,
        max_text_tokens=cfg.train.buckets.max_text_tokens,
        max_response_tokens=cfg.train.buckets.max_response_tokens,
        max_pool_ranges=32 if method == "ctc_pool" else None,
    )

    state, tx = make_train_state(cfg, enc_params, total_opt_steps=100)
    ranges_shape = (
        None if batch.ctc_pool_ranges is None
        else jax.ShapeDtypeStruct(batch.ctc_pool_ranges.shape, jnp.int32)
    )
    out, _ = jax.eval_shape(
        lambda p, w, l, r: audio_encoder_forward(p, enc_setup, w, l, ctc_pool_ranges=r),
        state.enc_params,
        jax.ShapeDtypeStruct(batch.wav.shape, jnp.float32),
        jax.ShapeDtypeStruct(batch.wav_lens.shape, jnp.int32),
        ranges_shape,
    )
    P, S = prefix.shape[0], suffix.shape[0]
    need = P + max(out.shape[1], cfg.train.buckets.max_text_tokens) + S + (
        cfg.train.buckets.max_response_tokens
    )
    total_len = ((need + 63) // 64) * 64

    step = make_train_step(cfg, enc_setup, llm_cfg, tx, prefix, suffix, total_len,
                           donate=False)
    losses = []
    for _ in range(3):
        state, metrics = step(state, llm_params, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_whisper_engine_generation():
    cfg = _cfg("whisper", "pool")
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    eng = LLMSpeechTextInference(cfg)
    audio = (0.05 * np.random.RandomState(0).randn(12000)).astype(np.float32)
    out = eng.generate_audio_response(audio, max_new_tokens=8)
    assert isinstance(out, str)


def test_ctc_pool_engine_generation():
    """The reference's ctc_pool inference path crashes on an undefined
    function (reference: inference.py:102); ours works with explicit ranges."""
    cfg = _cfg("hubert", "ctc_pool")
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    eng = LLMSpeechTextInference(cfg)
    audio = (0.05 * np.random.RandomState(1).randn(16000)).astype(np.float32)
    ranges = np.asarray([(i * 4, i * 4 + 4) for i in range(10)], np.int32)
    out = eng.generate_audio_response(audio, max_new_tokens=8, ctc_pool_ranges=ranges)
    assert isinstance(out, str)


def test_whisper_dynamic_frames_matches_fixed():
    """whisper_dynamic_frames shrinks the mel budget to the input bucket;
    VALID embeds must match the fixed-30 s featurization (padded frames
    are attention-masked, so they can't influence real positions)."""
    import dataclasses

    cfg = _cfg("whisper", "pool")
    setup_fixed = encoder_setup_from_config(cfg)
    cfg.model.audio_encoder.whisper_dynamic_frames = True
    setup_dyn = encoder_setup_from_config(cfg)
    assert setup_dyn.whisper_dynamic_frames

    params = init_audio_encoder(jax.random.PRNGKey(0), setup_fixed, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    B, N = 2, 32000  # 2 s buckets — dynamic budget 200 frames vs fixed 600
    wav = jnp.asarray(0.1 * rng.randn(B, N), jnp.float32)
    lens = jnp.asarray([N, 17000], jnp.int32)

    e_fixed, l_fixed = audio_encoder_forward(params, setup_fixed, wav, lens)
    e_dyn, l_dyn = audio_encoder_forward(params, setup_dyn, wav, lens)
    assert e_dyn.shape[1] < e_fixed.shape[1]  # buffer actually shrank
    np.testing.assert_array_equal(np.asarray(l_fixed), np.asarray(l_dyn))
    for b in range(B):
        n = int(l_fixed[b])
        np.testing.assert_allclose(
            np.asarray(e_dyn[b, :n]), np.asarray(e_fixed[b, :n]),
            rtol=2e-4, atol=2e-4,
        )


def test_minichat_template_end_to_end_tiny():
    """BASELINE config #1's path at tiny scale: the MiniChat chat template
    ([|User|] ... </s>[|Assistant|], reference: utils.py:7-8) drives
    text AND audio generation through the engine — template selection by
    llm_type, BOS-strip, splice and decode all on the MiniChat surface."""
    import numpy as np

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference
    from llm_speech_summarization_tpu.utils.prompts import prompt_template_for

    cfg = load_config(TINY_YAML)
    cfg.model.llm_type = "GeneZC/MiniChat-2-3B"
    tpl = prompt_template_for(cfg.model.llm_type)
    assert "[|User|]" in tpl.prefix and "[|Assistant|]" in tpl.suffix

    eng = LLMSpeechTextInference(cfg)
    out_t = eng.generate_text_response("summarize this speech", max_new_tokens=8)
    assert isinstance(out_t, str)
    wav = (0.05 * np.random.RandomState(0).randn(8000)).astype(np.float32)
    out_a = eng.generate_audio_response(wav, max_new_tokens=8)
    assert isinstance(out_a, str)
    # determinism: same audio, same stream
    assert out_a == eng.generate_audio_response(wav, max_new_tokens=8)
