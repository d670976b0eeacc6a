"""HF checkpoint → framework pytree conversion.

The reference pulls weights straight from the HF hub at runtime
(reference: trainer.py:58-64, inference.py:46-52). Here conversion is an
explicit offline step: a host-side transform from an HF state dict
(numpy arrays keyed by HF parameter names) into this framework's
stacked-layer pytrees. Torch Linear weights are (out, in) and are
transposed to (in, out) so forwards are plain ``x @ W``; per-layer tensors
are stacked on a leading layer axis for the ``lax.scan`` blocks.

Use ``load_hf_state_dict(dir)`` for local checkpoints (safetensors or
pytorch .bin), then the per-model converters. Exact numerical parity of the
converted frozen LLM with HF is covered by tests/test_hf_parity.py.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from .hubert import HubertConfig
from .llama import LlamaConfig
from .whisper import WhisperConfig

StateDict = Dict[str, np.ndarray]


def load_hf_state_dict(model_dir: str) -> StateDict:
    """Load all tensors from a local HF checkpoint directory."""
    out: StateDict = {}
    safes = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
    if safes:
        from safetensors.numpy import load_file

        for f in sorted(safes):
            out.update(load_file(os.path.join(model_dir, f)))
        return out
    bins = [f for f in os.listdir(model_dir) if f.endswith(".bin")]
    if bins:
        import torch

        for f in sorted(bins):
            sd = torch.load(os.path.join(model_dir, f), map_location="cpu", weights_only=True)
            # .float() ONLY for floating tensors (torch bf16 has no
            # direct numpy view; f32 roundtrip is lossless) — integer/
            # bool buffers must pass through with their dtype intact
            out.update({
                k: (v.float().numpy() if v.is_floating_point() else v.numpy())
                for k, v in sd.items()
            })
        return out
    raise FileNotFoundError(f"no .safetensors or .bin files in {model_dir}")


def _stack(sd: StateDict, fmt: str, n: int, transpose: bool = False) -> np.ndarray:
    mats = [sd[fmt.format(i=i)] for i in range(n)]
    if transpose:
        mats = [m.T for m in mats]
    return np.stack(mats, axis=0)


def convert_llama(sd: StateDict, cfg: LlamaConfig, dtype=np.float32) -> dict:
    """HF LlamaForCausalLM state dict → init_llama_params layout."""
    L = cfg.num_layers
    p = "model.layers.{i}."
    params = {
        "embed_tokens": sd["model.embed_tokens.weight"],
        "final_norm": sd["model.norm.weight"],
        "layers": {
            "input_norm": _stack(sd, p + "input_layernorm.weight", L),
            "post_attn_norm": _stack(sd, p + "post_attention_layernorm.weight", L),
            "wq": _stack(sd, p + "self_attn.q_proj.weight", L, transpose=True),
            "wk": _stack(sd, p + "self_attn.k_proj.weight", L, transpose=True),
            "wv": _stack(sd, p + "self_attn.v_proj.weight", L, transpose=True),
            "wo": _stack(sd, p + "self_attn.o_proj.weight", L, transpose=True),
            "w_gate": _stack(sd, p + "mlp.gate_proj.weight", L, transpose=True),
            "w_up": _stack(sd, p + "mlp.up_proj.weight", L, transpose=True),
            "w_down": _stack(sd, p + "mlp.down_proj.weight", L, transpose=True),
        },
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = sd["lm_head.weight"].T
    return _cast(params, dtype)


def _weight_norm_conv(sd: StateDict, prefix: str) -> np.ndarray:
    """Reconstruct a torch weight-normed conv weight (dim=2): w = g·v/||v||."""
    for g_key, v_key in (
        (prefix + "weight_g", prefix + "weight_v"),
        (prefix + "parametrizations.weight.original0", prefix + "parametrizations.weight.original1"),
    ):
        if g_key in sd:
            g, v = sd[g_key], sd[v_key]
            norm = np.sqrt(np.sum(v * v, axis=(0, 1), keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    return sd[prefix + "weight"]


def convert_hubert(sd: StateDict, cfg: HubertConfig, dtype=np.float32) -> dict:
    """HF HubertModel state dict → init_hubert_params layout."""
    L = cfg.num_layers
    conv_layers = []
    for i in range(len(cfg.conv_dims)):
        cp = f"feature_extractor.conv_layers.{i}."
        layer = {"w": sd[cp + "conv.weight"]}
        if cp + "conv.bias" in sd:
            layer["b"] = sd[cp + "conv.bias"]
        if cfg.feat_extract_norm == "layer":
            layer["ln_scale"] = sd[cp + "layer_norm.weight"]
            layer["ln_bias"] = sd[cp + "layer_norm.bias"]
        elif i == 0:
            layer["gn_scale"] = sd[cp + "layer_norm.weight"]
            layer["gn_bias"] = sd[cp + "layer_norm.bias"]
        conv_layers.append(layer)

    e = "encoder.layers.{i}."
    params = {
        "conv_layers": conv_layers,
        "fp_ln_scale": sd["feature_projection.layer_norm.weight"],
        "fp_ln_bias": sd["feature_projection.layer_norm.bias"],
        "fp_w": sd["feature_projection.projection.weight"].T,
        "fp_b": sd["feature_projection.projection.bias"],
        "pos_conv_w": _weight_norm_conv(sd, "encoder.pos_conv_embed.conv."),
        "pos_conv_b": sd["encoder.pos_conv_embed.conv.bias"],
        "layers": {
            "ln1_scale": _stack(sd, e + "layer_norm.weight", L),
            "ln1_bias": _stack(sd, e + "layer_norm.bias", L),
            "wq": _stack(sd, e + "attention.q_proj.weight", L, transpose=True),
            "bq": _stack(sd, e + "attention.q_proj.bias", L),
            "wk": _stack(sd, e + "attention.k_proj.weight", L, transpose=True),
            "bk": _stack(sd, e + "attention.k_proj.bias", L),
            "wv": _stack(sd, e + "attention.v_proj.weight", L, transpose=True),
            "bv": _stack(sd, e + "attention.v_proj.bias", L),
            "wo": _stack(sd, e + "attention.out_proj.weight", L, transpose=True),
            "bo": _stack(sd, e + "attention.out_proj.bias", L),
            "ln2_scale": _stack(sd, e + "final_layer_norm.weight", L),
            "ln2_bias": _stack(sd, e + "final_layer_norm.bias", L),
            "w1": _stack(sd, e + "feed_forward.intermediate_dense.weight", L, transpose=True),
            "b1": _stack(sd, e + "feed_forward.intermediate_dense.bias", L),
            "w2": _stack(sd, e + "feed_forward.output_dense.weight", L, transpose=True),
            "b2": _stack(sd, e + "feed_forward.output_dense.bias", L),
        },
        "encoder_ln_scale": sd["encoder.layer_norm.weight"],
        "encoder_ln_bias": sd["encoder.layer_norm.bias"],
    }
    return _cast(params, dtype)


def convert_hubert_ctc(sd: StateDict, cfg: HubertConfig, dtype=np.float32) -> tuple:
    """HF HubertForCTC state dict → (encoder params, ctc head params).

    The CTC model feeds the preprocessing word-offset stage
    (reference: preprocess_data/utils.py:127-152, facebook/hubert-large-
    ls960-ft). HF prefixes the backbone with "hubert."."""
    backbone = {k[len("hubert."):]: v for k, v in sd.items() if k.startswith("hubert.")}
    enc = convert_hubert(backbone, cfg, dtype)
    head = _cast({"ctc_w": sd["lm_head.weight"].T, "ctc_b": sd["lm_head.bias"]}, dtype)
    return enc, head


def convert_whisper_encoder(sd: StateDict, cfg: WhisperConfig, dtype=np.float32) -> dict:
    """HF WhisperModel (or encoder-only) state dict → init_whisper_params layout."""
    # accept "model.encoder.xxx" (WhisperForConditionalGeneration — the
    # stock openai/whisper-* layout), "encoder.xxx" (WhisperModel.encoder),
    # or bare keys
    if any(k.startswith("model.encoder.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.encoder.")}
    elif not any(k.startswith("encoder.") for k in sd):
        sd = {f"encoder.{k}": v for k, v in sd.items()}
    L = cfg.num_layers
    e = "encoder.layers.{i}."
    params = {
        "conv1_w": sd["encoder.conv1.weight"],
        "conv1_b": sd["encoder.conv1.bias"],
        "conv2_w": sd["encoder.conv2.weight"],
        "conv2_b": sd["encoder.conv2.bias"],
        "pos_embed": sd["encoder.embed_positions.weight"],
        "layers": {
            "ln1_scale": _stack(sd, e + "self_attn_layer_norm.weight", L),
            "ln1_bias": _stack(sd, e + "self_attn_layer_norm.bias", L),
            "wq": _stack(sd, e + "self_attn.q_proj.weight", L, transpose=True),
            "bq": _stack(sd, e + "self_attn.q_proj.bias", L),
            "wk": _stack(sd, e + "self_attn.k_proj.weight", L, transpose=True),
            "wv": _stack(sd, e + "self_attn.v_proj.weight", L, transpose=True),
            "bv": _stack(sd, e + "self_attn.v_proj.bias", L),
            "wo": _stack(sd, e + "self_attn.out_proj.weight", L, transpose=True),
            "bo": _stack(sd, e + "self_attn.out_proj.bias", L),
            "ln2_scale": _stack(sd, e + "final_layer_norm.weight", L),
            "ln2_bias": _stack(sd, e + "final_layer_norm.bias", L),
            "w1": _stack(sd, e + "fc1.weight", L, transpose=True),
            "b1": _stack(sd, e + "fc1.bias", L),
            "w2": _stack(sd, e + "fc2.weight", L, transpose=True),
            "b2": _stack(sd, e + "fc2.bias", L),
        },
        "final_ln_scale": sd["encoder.layer_norm.weight"],
        "final_ln_bias": sd["encoder.layer_norm.bias"],
    }
    return _cast(params, dtype)


def _is_floating(dt: np.dtype) -> bool:
    """True for numpy floats AND ml_dtypes extension floats (bfloat16,
    float8_*): np.issubdtype reports kind 'V' for those, which silently
    SKIPPED the requested cast for every bf16-stored safetensors checkpoint
    (the standard Llama-3.2 layout)."""
    if np.issubdtype(dt, np.floating):
        return True
    return "float" in getattr(dt, "name", "")


def _cast(tree, dtype):
    import jax.numpy as jnp

    import jax

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), dtype=dtype)
        if _is_floating(np.asarray(x).dtype)
        else jnp.asarray(x),
        tree,
    )
