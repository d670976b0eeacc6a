"""Llama-family decoder-only LLM, TPU-first.

Fills the role of the reference's frozen ``AudioLlamaForCausalLM``
(reference: model/audio_llama.py:18-113, a subclass of HF LlamaForCausalLM),
re-designed for XLA instead of translated:

  * parameters are a flat pytree of stacked per-layer arrays; the forward is
    a ``lax.scan`` over layers (one traced block, 28× smaller HLO, fast
    compiles, natural remat point);
  * everything is static-shape; variable lengths arrive as masks
    (left-padded, reference: utils.py:76-82) and positions are derived from
    the mask like HF does for left padding;
  * the same forward serves training (no cache), prefill (writes a KV
    cache), and single-token decode (reads + appends), so the generation
    path (reference: inference.py:55-74 via HF ``generate``) is one jitted
    function here;
  * loss lives outside the model (ops/losses.py), replacing the reference's
    per-sample response-window loop (reference: model/audio_llama.py:72-101).

Covers both reference LLMs — meta-llama/Llama-3.2-3B-Instruct and
GeneZC/MiniChat-2-3B (a Llama-architecture model) — via presets.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, make_attention_bias
from ..ops.norms import rms_norm
from ..ops.rope import Llama3RopeScaling, apply_rope, rope_inv_freq

Params = Dict[str, Any]


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_layers: int = 28
    num_heads: int = 24
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling: Optional[Llama3RopeScaling] = Llama3RopeScaling()
    tie_embeddings: bool = True
    max_position_embeddings: int = 131072


_PRESETS: Dict[str, LlamaConfig] = {
    # meta-llama/Llama-3.2-3B-Instruct (reference: config/llama3_hubert.yaml
    # model.llm_type); hyperparameters per the published HF config.json.
    "llama3_3b": LlamaConfig(),
    # GeneZC/MiniChat-2-3B (reference: config/minichat_hubert.yaml) — a
    # Llama-architecture 3B distilled from LLaMA2 (MiniMA); MHA, no rope
    # scaling. Override via a custom LlamaConfig if a local checkpoint's
    # config.json differs.
    "minichat_3b": LlamaConfig(
        vocab_size=49216,
        hidden_size=3072,
        intermediate_size=8192,
        num_layers=24,
        num_heads=24,
        num_kv_heads=24,
        head_dim=128,
        rms_eps=1e-5,
        rope_theta=10000.0,
        rope_scaling=None,
        tie_embeddings=False,
        max_position_embeddings=4096,
    ),
    # tiny config for tests/CI
    "tiny": LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rope_theta=10000.0,
        rope_scaling=None,
        tie_embeddings=True,
        max_position_embeddings=2048,
    ),
}


def llama_preset(name: str) -> LlamaConfig:
    """Resolve a preset by short name or reference llm_type string."""
    aliases = {
        "meta-llama/Llama-3.2-3B-Instruct": "llama3_3b",
        "GeneZC/MiniChat-2-3B": "minichat_3b",
    }
    key = aliases.get(name, name)
    if key not in _PRESETS:
        raise KeyError(f"unknown llama preset '{name}' (have {sorted(_PRESETS)})")
    return _PRESETS[key]


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, S, Hkv, Dh)
    v: jnp.ndarray  # (L, B, S, Hkv, Dh)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class LlamaOutput(NamedTuple):
    logits: Optional[jnp.ndarray]  # (B, T, V)
    hidden_states: Optional[jnp.ndarray]  # (L+1, B, T, D) iff requested
    kv_cache: Optional[KVCache]


def init_llama_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.bfloat16) -> Params:
    """Random init with HF-like scales (normal 0.02). Weights are stored
    (in_features, out_features) so the forward is plain ``x @ W``."""
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(rng, 10)

    def normal(key, shape):
        return (0.02 * jax.random.normal(key, shape, jnp.float32)).astype(dtype)

    params: Params = {
        "embed_tokens": normal(keys[0], (cfg.vocab_size, D)),
        "final_norm": jnp.ones((D,), dtype),
        "layers": {
            "input_norm": jnp.ones((L, D), dtype),
            "post_attn_norm": jnp.ones((L, D), dtype),
            "wq": normal(keys[1], (L, D, Hq * Dh)),
            "wk": normal(keys[2], (L, D, Hkv * Dh)),
            "wv": normal(keys[3], (L, D, Hkv * Dh)),
            "wo": normal(keys[4], (L, Hq * Dh, D)),
            "w_gate": normal(keys[5], (L, D, I)),
            "w_up": normal(keys[6], (L, D, I)),
            "w_down": normal(keys[7], (L, I, D)),
        },
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = normal(keys[8], (D, cfg.vocab_size))
    return params


def _block(
    cfg: LlamaConfig,
    lp: Params,
    x: jnp.ndarray,
    positions: jnp.ndarray,
    bias: jnp.ndarray,
    inv_freq: jnp.ndarray,
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    cache_offset: Optional[jnp.ndarray],
):
    """One transformer block. Returns (out, (new_k_cache, new_v_cache))."""
    B, T, D = x.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = rms_norm(x, lp["input_norm"], cfg.rms_eps)
    q = (h @ lp["wq"]).reshape(B, T, Hq, Dh)
    k = (h @ lp["wk"]).reshape(B, T, Hkv, Dh)
    v = (h @ lp["wv"]).reshape(B, T, Hkv, Dh)
    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)

    if cache_kv is not None:
        k_cache, v_cache = cache_kv
        k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype), (0, cache_offset, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype), (0, cache_offset, 0, 0))
        k_att, v_att = k_cache, v_cache
        new_cache = (k_cache, v_cache)
    else:
        k_att, v_att = k, v
        new_cache = None

    attn = dot_product_attention(q, k_att.astype(q.dtype), v_att.astype(q.dtype), bias)
    x = x + attn.reshape(B, T, Hq * Dh) @ lp["wo"]

    h = rms_norm(x, lp["post_attn_norm"], cfg.rms_eps)
    gate = jax.nn.silu(h @ lp["w_gate"])
    up = h @ lp["w_up"]
    x = x + (gate * up) @ lp["w_down"]
    return x, new_cache


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    kv_cache: Optional[KVCache] = None,
    cache_offset: Optional[jnp.ndarray] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    return_hidden: bool = False,
    compute_logits: bool = True,
    remat: bool = False,
) -> LlamaOutput:
    """Run the decoder.

    Modes:
      * training / teacher: no kv_cache; full causal attention over the
        left-padded (B, T) batch; `attn_mask` marks real positions.
      * prefill: kv_cache + cache_offset=0; keys/values written to the cache;
        attention over cache slots [0, T) with padded keys masked.
      * decode: kv_cache + cache_offset=t; T==1 queries attend to cache
        slots [0, t] (kv_valid must mark real slots, i.e. non-pad prefill
        slots and already-generated slots).

    `inputs_embeds` bypasses the embedding table exactly like the reference's
    embedding-injection path (reference: trainer.py:317-322,
    inference.py:60-66 pass inputs_embeds to HF Llama).
    """
    if inputs_embeds is None:
        assert input_ids is not None
        inputs_embeds = params["embed_tokens"][input_ids]
    x = inputs_embeds
    B, T, D = x.shape

    if attn_mask is None:
        attn_mask = jnp.ones((B, T), bool)
    if positions is None:
        # HF-style left-pad positions: first real token gets position 0
        positions = jnp.maximum(jnp.cumsum(attn_mask.astype(jnp.int32), axis=1) - 1, 0)

    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)

    if kv_cache is None:
        bias = make_attention_bias(attn_mask, attn_mask, causal=True)
        cache_k = cache_v = None
    else:
        assert cache_offset is not None
        S = kv_cache.max_len
        if kv_valid is None:
            # prefill from slot 0: valid = written-and-real
            t_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
            kv_valid = (t_idx < cache_offset + T) & jnp.pad(
                attn_mask, ((0, 0), (0, S - T)), constant_values=True
            )
        q_offset = jnp.full((B,), cache_offset, jnp.int32)
        bias = make_attention_bias(attn_mask, kv_valid, causal=True, q_offset=q_offset)
        cache_k, cache_v = kv_cache.k, kv_cache.v

    block = _block
    if remat:
        block = jax.checkpoint(_block, static_argnums=(0,))

    def scan_body(carry, layer_in):
        h = carry
        if kv_cache is None:
            lp = layer_in
            out, _ = block(cfg, lp, h, positions, bias, inv_freq, None, None)
            return out, (out if return_hidden else jnp.zeros((0,), h.dtype))
        lp, (kc, vc) = layer_in
        out, new_cache = block(cfg, lp, h, positions, bias, inv_freq, (kc, vc), cache_offset)
        ys = (out if return_hidden else jnp.zeros((0,), h.dtype), new_cache)
        return out, ys

    if kv_cache is None:
        x, ys = jax.lax.scan(scan_body, x, params["layers"])
        hidden_stack = ys if return_hidden else None
        new_kv = None
    else:
        x, ys = jax.lax.scan(scan_body, x, (params["layers"], (kv_cache.k, kv_cache.v)))
        hs, (nk, nv) = ys
        hidden_stack = hs if return_hidden else None
        new_kv = KVCache(nk, nv)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)

    hidden_states = None
    if return_hidden:
        # HF layout: index 0 = embedding output, i = output of block i
        # (reference: trainer.py:360-367 indexes hidden_states this way).
        hidden_states = jnp.concatenate([inputs_embeds[None], hidden_stack], axis=0)

    logits = None
    if compute_logits:
        head = params["embed_tokens"].T if cfg.tie_embeddings else params["lm_head"]
        logits = jnp.einsum(
            "btd,dv->btv", x, head.astype(x.dtype), preferred_element_type=jnp.float32
        )

    return LlamaOutput(logits=logits, hidden_states=hidden_states, kv_cache=new_kv)


def config_to_dict(cfg: LlamaConfig) -> dict:
    return dataclasses.asdict(cfg)
