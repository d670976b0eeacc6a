"""Numerical parity with HuggingFace implementations on tiny random models.

The frozen LLM must match HF exactly for converted weights to make KD
meaningful (SURVEY.md §7 hard part (a)). These tests instantiate tiny
random HF models with torch (CPU), convert their state dicts with
models/convert.py, and compare outputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from llm_speech_summarization_tpu.models.convert import (
    convert_hubert,
    convert_llama,
    convert_whisper_encoder,
)
from llm_speech_summarization_tpu.models.hubert import HubertConfig, hubert_forward
from llm_speech_summarization_tpu.models.llama import LlamaConfig, llama_forward
from llm_speech_summarization_tpu.models.whisper import (
    WhisperConfig,
    log_mel_spectrogram,
    whisper_forward,
)
from llm_speech_summarization_tpu.ops.rope import Llama3RopeScaling


def _sd_to_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("use_llama3_rope", [False, True])
def test_llama_logits_match_hf(use_llama3_rope):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    kwargs = dict(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=2048,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        attention_bias=False,
        mlp_bias=False,
    )
    scaling = None
    if use_llama3_rope:
        kwargs["rope_scaling"] = {
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 512,
        }
        scaling = Llama3RopeScaling(
            factor=8.0,
            low_freq_factor=1.0,
            high_freq_factor=4.0,
            original_max_position_embeddings=512,
        )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(HFLlamaConfig(**kwargs)).eval()

    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rope_theta=10000.0,
        rope_scaling=scaling,
        tie_embeddings=True,
    )
    params = convert_llama(_sd_to_numpy(hf), cfg)

    ids = np.random.RandomState(0).randint(0, 512, (2, 10)).astype(np.int64)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(llama_forward(params, cfg, input_ids=jnp.asarray(ids)).logits)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)

    # hidden-state layout parity at the FD layers (reference: trainer.py:360-367)
    with torch.no_grad():
        hf_h = hf(input_ids=torch.tensor(ids), output_hidden_states=True).hidden_states
    ours_h = np.asarray(
        llama_forward(params, cfg, input_ids=jnp.asarray(ids), return_hidden=True).hidden_states
    )
    for layer in (0, 1):  # mid-stack indices (the last differs: HF post-norms it)
        np.testing.assert_allclose(ours_h[layer], hf_h[layer].numpy(), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["layer", "group"])
def test_hubert_frames_match_hf(variant):
    from transformers import HubertConfig as HFHubertConfig
    from transformers import HubertModel

    stable = variant == "layer"
    hf_cfg = HFHubertConfig(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(32, 32, 32, 32),
        conv_kernel=(10, 8, 4, 4),
        conv_stride=(5, 4, 4, 4),
        conv_bias=stable,
        feat_extract_norm=variant,
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        layerdrop=0.0,
        feat_proj_layer_norm=True,
    )
    torch.manual_seed(1)
    hf = HubertModel(hf_cfg).eval()

    cfg = HubertConfig(
        conv_dims=(32, 32, 32, 32),
        conv_kernels=(10, 8, 4, 4),
        conv_strides=(5, 4, 4, 4),
        conv_bias=stable,
        feat_extract_norm=variant,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        do_stable_layer_norm=stable,
        pos_conv_kernel=16,
        pos_conv_groups=4,
    )
    params = convert_hubert(_sd_to_numpy(hf), cfg)

    wav = (0.1 * np.random.RandomState(2).randn(2, 8000)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(torch.tensor(wav)).last_hidden_state.numpy()
    ours, _ = hubert_forward(params, cfg, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(ours), hf_out, rtol=2e-3, atol=2e-4)


def test_whisper_encoder_matches_hf():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperModel

    hf_cfg = HFWhisperConfig(
        vocab_size=128,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_layers=1,
        decoder_attention_heads=4,
        decoder_ffn_dim=128,
        num_mel_bins=80,
        max_source_positions=1500,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
    )
    torch.manual_seed(3)
    hf = WhisperModel(hf_cfg).eval().encoder

    cfg = WhisperConfig(d_model=64, num_layers=2, num_heads=4, ffn_dim=128)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = convert_whisper_encoder(sd, cfg)

    mel = np.random.RandomState(4).randn(1, 80, 3000).astype(np.float32) * 0.5
    with torch.no_grad():
        hf_out = hf(torch.tensor(mel)).last_hidden_state.numpy()
    ours, _ = whisper_forward(params, cfg, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(ours), hf_out, rtol=2e-3, atol=2e-4)


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # defaults: 80 mels, n_fft 400, hop 160
    wav = (0.1 * np.random.RandomState(5).randn(24000)).astype(np.float32)
    hf_mel = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    cfg = WhisperConfig()
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav[None]), cfg, pad_to_frames=3000))[0]
    assert ours.shape == hf_mel.shape
    np.testing.assert_allclose(ours, hf_mel, rtol=1e-3, atol=2e-3)


def test_hubert_ctc_matches_hf():
    from transformers import HubertConfig as HFHubertConfig
    from transformers import HubertForCTC

    hf_cfg = HFHubertConfig(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(32, 32, 32, 32),
        conv_kernel=(10, 8, 4, 4),
        conv_stride=(5, 4, 4, 4),
        conv_bias=True,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(5)
    hf = HubertForCTC(hf_cfg).eval()

    from llm_speech_summarization_tpu.models.convert import convert_hubert_ctc
    from llm_speech_summarization_tpu.models.hubert import hubert_ctc_logits

    cfg = HubertConfig(
        conv_dims=(32, 32, 32, 32),
        conv_kernels=(10, 8, 4, 4),
        conv_strides=(5, 4, 4, 4),
        conv_bias=True,
        feat_extract_norm="layer",
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        do_stable_layer_norm=True,
        pos_conv_kernel=16,
        pos_conv_groups=4,
    )
    enc, head = convert_hubert_ctc(_sd_to_numpy(hf), cfg)
    wav = (0.1 * np.random.RandomState(6).randn(1, 8000)).astype(np.float32)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(wav)).logits.numpy()
    ours, _ = hubert_ctc_logits(enc, head, cfg, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-3, atol=2e-4)


def test_convert_cli_roundtrip(tmp_path):
    """HF dir → cli.convert → engine loads via config → logits match HF."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(9)
    hf = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=True,
        attention_bias=False, mlp_bias=False,
    )).eval()
    hf_dir = tmp_path / "hf"
    hf.save_pretrained(str(hf_dir), safe_serialization=True)

    from llm_speech_summarization_tpu.cli.convert import main as convert_main

    out_dir = tmp_path / "converted"
    convert_main(["llm", "--hf_dir", str(hf_dir), "--preset", "tiny",
                  "--output", str(out_dir), "--dtype", "float32"])

    import os

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    yaml = os.path.join(
        os.path.dirname(__file__), "..", "llm_speech_summarization_tpu",
        "configs", "yaml", "tiny_test.yaml",
    )
    cfg = load_config(yaml)
    cfg.model.llm_checkpoint = str(out_dir)
    eng = LLMSpeechTextInference(cfg)

    ids = np.random.RandomState(3).randint(0, 512, (1, 8)).astype(np.int64)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids)).logits.numpy()
    from llm_speech_summarization_tpu.models.llama import llama_forward

    ours = np.asarray(
        llama_forward(eng.llm_params, eng.llm_cfg, input_ids=jnp.asarray(ids)).logits
    )
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_fused_params_identical():
    """fuse_llama_params (decode-optimized QKV/gate-up concat) must be
    numerically IDENTICAL to the standard layout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_speech_summarization_tpu.models.llama import (
        fuse_llama_params,
        init_llama_params,
        llama_forward,
        llama_preset,
    )

    cfg = llama_preset("tiny")
    p = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 16)), jnp.int32)
    ref = llama_forward(p, cfg, input_ids=ids).logits
    fused = fuse_llama_params(jax.tree_util.tree_map(jnp.copy, p))
    got = llama_forward(fused, cfg, input_ids=ids).logits
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_quantized_params_close_and_same_greedy():
    """Weight-only int8 (serving mode) stays within ~1% of bf16 logits and
    picks the same greedy tokens on a random batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_speech_summarization_tpu.models.llama import (
        fuse_llama_params,
        init_llama_params,
        llama_forward,
        llama_preset,
        quantize_llama_params,
    )

    cfg = llama_preset("tiny")
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32),
    )
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 16)), jnp.int32)
    ref = llama_forward(p, cfg, input_ids=ids).logits
    q = quantize_llama_params(fuse_llama_params(jax.tree_util.tree_map(jnp.copy, p)))
    got = llama_forward(q, cfg, input_ids=ids).logits
    rel = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.05, rel
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(ref, -1)), np.asarray(jnp.argmax(got, -1))
    )
