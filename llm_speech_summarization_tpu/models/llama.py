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
import functools
import os
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, make_attention_bias
from ..ops.norms import rms_norm
from ..ops.rope import (
    Llama3RopeScaling,
    apply_rope_cached,
    rope_cos_sin,
    rope_inv_freq,
)

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
    """KV cache, laid out (L, B, Hkv, S, Dh): the sequence axis is
    contiguous per head so the decode kernel streams it at full HBM
    bandwidth with no transposes.

    Optionally int8-quantized per (layer, sample, head, slot) row with
    bf16 scales — halves decode-loop cache traffic (the second-largest
    HBM term after the weights) and doubles the batch a chip can hold.
    """

    k: jnp.ndarray  # (L, B, Hkv, S, Dh) — bf16/f32, or int8 when quantized
    v: jnp.ndarray  # (L, B, Hkv, S, Dh)
    k_scale: Optional[jnp.ndarray] = None  # (L, B, Hkv, S) bf16 iff int8
    v_scale: Optional[jnp.ndarray] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    # every field gets its OWN buffer: sharing one zeros array between
    # k_scale and v_scale made any donating caller (infer/slots.py) fail
    # with "attempt to donate the same buffer twice"
    def zeros(shape, dt):
        return jnp.zeros(shape, dt) + 0  # defeat constant aliasing/caching

    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if jnp.dtype(dtype) == jnp.int8:
        return KVCache(
            zeros(shape, jnp.int8),
            zeros(shape, jnp.int8),
            zeros(shape[:-1], jnp.bfloat16),
            zeros(shape[:-1], jnp.bfloat16),
        )
    return KVCache(zeros(shape, dtype), zeros(shape, dtype))


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., Dh) → (int8 values, bf16 per-row scale): symmetric absmax."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.bfloat16)


def dequantize_kv(values: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (values.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)


class LlamaOutput(NamedTuple):
    logits: Optional[jnp.ndarray]  # (B, T, V)
    hidden_states: Optional[jnp.ndarray]  # (L+1, B, T, D) iff requested
    kv_cache: Optional[KVCache]
    final_hidden: Optional[jnp.ndarray] = None  # (B, W, D) post-final-norm


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


def _mm(h: jnp.ndarray, lp: Params, name: str) -> jnp.ndarray:
    """h @ lp[name], transparently handling int8 weight-only quantization
    (quantize_llama_params): the int8→bf16 convert fuses into the matmul so
    the weight streams from HBM at half width; the per-out-channel scale
    multiplies the (B, T, Dout) result."""
    w = lp[name]
    if w.dtype == jnp.int8:
        return (h @ w.astype(h.dtype)) * lp[name + "_scale"].astype(h.dtype)
    return h @ w


def _block(
    cfg: LlamaConfig,
    lp: Params,
    x: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    attn_args: Tuple[jnp.ndarray, ...],
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    *,
    attn_kind: str,
    ring_mesh=None,
    ring_axis: Optional[str] = None,
    tp_mesh=None,
):
    """One transformer block. Returns (out, (k_new, v_new)).

    ``cache_kv`` (per-layer, read-only, (B, Hkv, S, Dh)) holds past
    keys/values; fresh k/v are RETURNED, not written here — the caller does
    one O(T) in-place cache write outside the layer scan. Writing inside
    the scan would round-trip the whole O(S) cache through scan ys, a full
    copy per decode step.

    ``attn_kind`` (static) + ``attn_args`` (arrays) select the attention path:
      "bias", (bias,)                    XLA masked attention (no cache read)
      "flash", (starts, ends)            Pallas flash kernel (no cache read)
      "decode_xla", (bias,)              XLA over [cache | fresh] concat
      "decode_pallas", (pads, offset)    Pallas in-place cache-read kernel
    """
    B, T, D = x.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = rms_norm(x, lp["input_norm"], cfg.rms_eps)
    if "wqkv" in lp:
        # decode-optimized fused projection (fuse_llama_params): one matmul
        # streams all three weights — fewer kernel dispatches in the layer
        # scan, where the decode loop's fixed costs live
        qkv = _mm(h, lp, "wqkv")
        q = qkv[..., : Hq * Dh].reshape(B, T, Hq, Dh)
        k = qkv[..., Hq * Dh : (Hq + Hkv) * Dh].reshape(B, T, Hkv, Dh)
        v = qkv[..., (Hq + Hkv) * Dh :].reshape(B, T, Hkv, Dh)
    else:
        q = _mm(h, lp, "wq").reshape(B, T, Hq, Dh)
        k = _mm(h, lp, "wk").reshape(B, T, Hkv, Dh)
        v = _mm(h, lp, "wv").reshape(B, T, Hkv, Dh)
    q = apply_rope_cached(q, rope_cos, rope_sin)
    k = apply_rope_cached(k, rope_cos, rope_sin)
    # names for selective remat (llama_forward remat_policy="save_qkv"):
    # outside a policied jax.checkpoint these are identity ops
    from jax.ad_checkpoint import checkpoint_name

    q = checkpoint_name(q, "attn_q")
    k = checkpoint_name(k, "attn_k")
    v = checkpoint_name(v, "attn_v")

    if attn_kind == "bias":
        attn = dot_product_attention(q, k, v, attn_args[0])
    elif attn_kind == "ring":
        # sequence-parallel causal attention: T is sharded over ring_axis of
        # ring_mesh and K/V blocks rotate on ICI (ops/ring_attention.py).
        # The long-audio scale-out path (SURVEY.md §2.3 SP/CP row).
        from ..ops.ring_attention import ring_attention

        attn = ring_attention(
            q, k, v, attn_args[0], ring_mesh, seq_axis=ring_axis, causal=True
        )
    elif attn_kind == "flash":
        from ..kernels.flash_attention import flash_attention

        attn = flash_attention(q, k, v, attn_args[0], attn_args[1], causal=True)
    elif attn_kind == "decode_xla":
        if len(cache_kv) == 4:  # int8 cache → dequantize (fallback path)
            k_cache = dequantize_kv(cache_kv[0], cache_kv[2], q.dtype)
            v_cache = dequantize_kv(cache_kv[1], cache_kv[3], q.dtype)
        else:
            k_cache, v_cache = cache_kv  # (B, Hkv, S, Dh)
        k_att = jnp.concatenate(
            [k_cache.transpose(0, 2, 1, 3).astype(q.dtype), k], axis=1
        )  # (B, S+T, Hkv, Dh)
        v_att = jnp.concatenate([v_cache.transpose(0, 2, 1, 3).astype(q.dtype), v], axis=1)
        attn = dot_product_attention(q, k_att, v_att, attn_args[0])
    elif attn_kind in ("decode_paged", "decode_paged_xla"):
        # paged KV cache (infer/paged.py): per-layer pools ride the scan xs,
        # the fresh token is attended in-VMEM and scattered into the pools
        # by the caller-visible write after the scan. "decode_paged_xla"
        # forces the XLA oracle: a pallas_call has no GSPMD partitioning
        # rule, so under a model-sharded mesh the kernel would force the
        # sharded pools replicated (an all-gather of the whole KV pool per
        # layer) — the einsum oracle shards cleanly on the head axis
        # (parallel/sharding.py::slot_state_spec).
        from ..kernels.paged_attention import (
            paged_decode_attention,
            paged_reference,
        )

        if len(cache_kv) == 4:  # int8 pools + per-slot scales
            k_pool, v_pool, k_sc, v_sc = cache_kv
        else:
            (k_pool, v_pool), k_sc, v_sc = cache_kv, None, None
        page_table, lengths, pad_lens = attn_args
        if attn_kind == "decode_paged_xla":
            attn = paged_reference(
                q, k_pool, v_pool, page_table, lengths, pad_lens, k, v,
                k_scale=k_sc, v_scale=v_sc,
            )
        else:
            attn = paged_decode_attention(
                q, k_pool, v_pool, page_table, lengths, pad_lens, k, v,
                k_scale=k_sc, v_scale=v_sc,
            )
    elif attn_kind == "decode_fused":
        # one Pallas program per layer: attention over the FULL (L, ...)
        # value cache at this layer PLUS the quantized in-place write of
        # the fresh token (kernels/fused_decode.py). cache_kv here is
        # (k_full, v_full, k_scales_pad|None, v_scales_pad|None): value
        # buffers AND (round 5, VERDICT r4 #8) the lane-PADDED
        # (L, B, Hkv, Spad) scale slabs ride the scan CARRY aliased in
        # place — zero per-layer scale xs/ys, zero post-kernel merges;
        # attn_args carries the layer index.
        from ..kernels.fused_decode import (
            fused_decode_aliased_scales,
            fused_decode_attention_write,
        )

        k_cache, v_cache, k_scales_p, v_scales_p = cache_kv
        pad_lens, offsets, li = attn_args
        quant = k_scales_p is not None
        # scale slabs arrive either as FULL padded (L, B, Hkv, Spad)
        # aliased carry — the round-5 default, measured fastest
        # (11.6 ms/step) — or PER-LAYER (B, Hkv, S) xs/ys (the round-4
        # design, selectable via LSS_FUSED_ALIASED_SCALES=0; PERF.md
        # round-5 scale-slab section)
        aliased = quant and k_scales_p.ndim == 4
        if tp_mesh is None:
            if aliased:
                res = fused_decode_aliased_scales(
                    q, k_cache, v_cache, k, v, pad_lens, offsets, li,
                    k_scales_p, v_scales_p,
                )
            else:
                res = fused_decode_attention_write(
                    q, k_cache, v_cache, k, v, pad_lens, offsets, li,
                    k_scale_layer=k_scales_p, v_scale_layer=v_scales_p,
                )
        else:
            # TP: the kernel is per-KV-head independent (attention within
            # the head group, in-register quantize, in-place window write),
            # so shard_map over "model" partitions it on Hkv with ZERO
            # collectives — each model-shard runs the kernel on exactly the
            # cache heads its wk/wv shards produced (llama_param_spec /
            # slot_state_spec layouts).
            from jax.sharding import PartitionSpec as _P

            h4 = _P(None, None, "model", None)  # q/k/v: head axis 2
            c5 = _P(None, None, "model", None, None)  # (L,B,Hkv,S,Dh)
            # scale slabs: per-layer (B,Hkv,S) xs mode (head axis 1) or
            # full padded (L,B,Hkv,Spad) aliased mode (head axis 2)
            sc = (
                _P(None, None, "model", None) if aliased
                else _P(None, "model", None)
            )
            in_specs = (h4, c5, c5, h4, h4, _P(), _P(), _P()) + (
                (sc, sc) if quant else ()
            )
            out_specs = (h4, c5, c5) + (
                ((sc, sc) if aliased
                 else (_P(None, "model"), _P(None, "model")))
                if quant else ()
            )

            def call(q_, kc_, vc_, kn_, vn_, pl_, of_, li_, *scales):
                if aliased:
                    return fused_decode_aliased_scales(
                        q_, kc_, vc_, kn_, vn_, pl_, of_, li_, *scales
                    )
                ks_, vs_ = scales if quant else (None, None)
                return fused_decode_attention_write(
                    q_, kc_, vc_, kn_, vn_, pl_, of_, li_,
                    k_scale_layer=ks_, v_scale_layer=vs_,
                )

            res = jax.shard_map(
                call, mesh=tp_mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )(q, k_cache, v_cache, k, v, pad_lens, offsets, li,
              *((k_scales_p, v_scales_p) if quant else ()))
        attn, new_cache_kv = res[0], tuple(res[1:])
    elif attn_kind == "decode_paged_fused":
        # the paged cache's fused treatment (kernels/fused_paged.py): one
        # Pallas program per layer streams this layer's pages, attends, and
        # writes the fresh token's quantized value into its page window in
        # place. cache_kv = (k_pool, v_pool, k_scale_slab|None,
        # v_scale_slab|None): the FULL (L, ...) pools ride the scan CARRY
        # aliased in place; per-layer scale slabs ride xs and the fresh
        # scales return (B, Hkv) for the caller's ONE post-scan scatter.
        from ..kernels.fused_paged import fused_paged_decode_write

        k_pool, v_pool, k_scale_l, v_scale_l = cache_kv
        page_table, lengths, pad_lens, li = attn_args
        if tp_mesh is None:
            res = fused_paged_decode_write(
                q, k_pool, v_pool, page_table, lengths, pad_lens, k, v, li,
                k_scale_layer=k_scale_l, v_scale_layer=v_scale_l,
            )
        else:
            # TP: page pools shard on Hkv (axis 2 of (L,P,Hkv,ps,Dh), the
            # slot_state_spec layout); page tables/lengths replicate. Same
            # zero-collective head partition as decode_fused above.
            from jax.sharding import PartitionSpec as _P

            quant = k_scale_l is not None
            h4 = _P(None, None, "model", None)
            p5 = _P(None, None, "model", None, None)
            sc = _P(None, "model", None)  # per-layer (P,Hkv,ps) scale slab
            in_specs = (h4, p5, p5, _P(), _P(), _P(), h4, h4, _P()) + (
                (sc, sc) if quant else ()
            )
            out_specs = (h4, p5, p5) + (
                (_P(None, "model"), _P(None, "model")) if quant else ()
            )

            def call(q_, kp_, vp_, pt_, ln_, pl_, kn_, vn_, li_, *scales):
                ks_, vs_ = scales if quant else (None, None)
                return fused_paged_decode_write(
                    q_, kp_, vp_, pt_, ln_, pl_, kn_, vn_, li_,
                    k_scale_layer=ks_, v_scale_layer=vs_,
                )

            res = jax.shard_map(
                call, mesh=tp_mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )(q, k_pool, v_pool, page_table, lengths, pad_lens, k, v, li,
              *((k_scale_l, v_scale_l) if quant else ()))
        attn, new_cache_kv = res[0], tuple(res[1:])
    elif attn_kind == "decode_pallas":
        from ..kernels.decode_attention import decode_attention

        if len(cache_kv) == 4:
            k_cache, v_cache, k_scale, v_scale = cache_kv
        else:
            (k_cache, v_cache), k_scale, v_scale = cache_kv, None, None
        attn = decode_attention(
            q, k_cache, v_cache, k, v,
            attn_args[0], attn_args[1],
            k_scale=k_scale, v_scale=v_scale,
        )
    elif attn_kind == "decode_xla_q":
        # fused XLA decode over the cache in its native (B, Hkv, S, Dh)
        # layout: int8→bf16 converts (when quantized) fuse into the
        # matmuls — no materialized dequant, no [cache|fresh] concat, no
        # per-layer kernel-launch overhead. Handles T >= 1 fresh queries:
        # T == 1 is the plain decode step; T == k+1 is the speculative
        # VERIFICATION forward (infer/slots.py spec decode) — every query
        # attends the row's cache window [pad, offset) plus the fresh
        # tokens causally within the block.
        if len(cache_kv) == 4:
            k_cache, v_cache, k_scale, v_scale = cache_kv
        else:
            (k_cache, v_cache), k_scale, v_scale = cache_kv, None, None
        pad_lens, offset, fresh_mask = attn_args  # offset: (B,) pre-broadcast
        S = k_cache.shape[2]
        group = Hq // Hkv
        qg = q.reshape(B, T, Hkv, group, Dh)
        s_c = jnp.einsum(
            "bthgd,bhsd->bthgs", qg, k_cache.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        if k_scale is not None:
            s_c = s_c * k_scale[:, None, :, None, :].astype(jnp.float32)
        s_c = s_c * (Dh ** -0.5)
        slot = jnp.arange(S, dtype=jnp.int32)
        valid = (slot[None, :] >= pad_lens[:, None]) & (slot[None, :] < offset[:, None])
        s_c = jnp.where(valid[:, None, None, None, :], s_c, -1e30)
        # fresh keys: (B, T, Hkv, Dh); query t attends fresh key s iff s<=t
        s_f = jnp.einsum(
            "bthgd,bshd->bthgs", qg, k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * (Dh ** -0.5)
        # query t attends fresh key s iff s <= t AND s is a real (unpadded)
        # position — attn_mask applies to the fresh tokens like every other
        # path (all-ones for the in-tree decode/verification callers, where
        # XLA folds the extra term away)
        causal = jnp.arange(T)[:, None] >= jnp.arange(T)[None, :]  # (Tq, Tk)
        valid_f = causal[None, :, :] & fresh_mask[:, None, :]  # (B, Tq, Tk)
        s_f = jnp.where(valid_f[:, :, None, None, :], s_f, -1e30)
        m = jnp.maximum(
            jnp.max(s_c, axis=-1, keepdims=True), jnp.max(s_f, axis=-1, keepdims=True)
        )
        p_c = jnp.exp(s_c - m)
        p_f = jnp.exp(s_f - m)
        denom = jnp.sum(p_c, axis=-1, keepdims=True) + jnp.sum(
            p_f, axis=-1, keepdims=True
        )
        p_eff = (
            p_c * v_scale[:, None, :, None, :].astype(jnp.float32)
            if v_scale is not None
            else p_c
        )
        pv = jnp.einsum(
            "bthgs,bhsd->bthgd",
            p_eff.astype(q.dtype),
            v_cache.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        pv = pv + jnp.einsum(
            "bthgs,bshd->bthgd",
            p_f.astype(q.dtype),
            v.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        attn = (pv / denom).reshape(B, T, Hq, Dh).astype(q.dtype)
    else:
        raise ValueError(f"unknown attn kind {attn_kind}")

    attn = checkpoint_name(attn, "attn_out")
    x = x + _mm(attn.reshape(B, T, Hq * Dh), lp, "wo")

    h = rms_norm(x, lp["post_attn_norm"], cfg.rms_eps)
    if "w_gateup" in lp:
        I = lp["w_down"].shape[-2]
        gu = _mm(h, lp, "w_gateup")
        gate, up = jax.nn.silu(gu[..., :I]), gu[..., I:]
    else:
        gate = jax.nn.silu(_mm(h, lp, "w_gate"))
        up = _mm(h, lp, "w_up")
    x = x + _mm(gate * up, lp, "w_down")
    if attn_kind in ("decode_fused", "decode_paged_fused"):
        return x, new_cache_kv  # cache already written in-place by the kernel
    return x, (k, v)


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
    kv_pad_lens: Optional[jnp.ndarray] = None,
    return_hidden: bool = False,
    hidden_window: int = 0,
    compute_logits: bool = True,
    last_logit_only: bool = False,
    logit_window: int = 0,
    return_final_hidden: bool = False,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    attn_impl: str = "auto",
    scan_unroll: int = 1,
    ring_mesh=None,
    ring_axis: str = "seq",
    tp_mesh=None,
) -> LlamaOutput:
    """Run the decoder.

    Modes:
      * training / teacher: no kv_cache; full causal attention over the
        left-padded (B, T) batch; `attn_mask` marks real positions.
      * prefill: kv_cache + cache_offset=0 + neither kv_valid nor
        kv_pad_lens; keys/values written to cache slots [0, T).
      * decode: kv_cache + cache_offset=t. T==1 is the plain decode step;
        T>1 (kv_pad_lens form only) is the speculative VERIFICATION
        forward — every query attends the cache window plus the fresh
        tokens causally (infer/slots.py spec decode). Valid cache slots
        are given either as ``kv_pad_lens`` (B,) — valid ≡ [pad, offset),
        the fast arithmetic form the Pallas kernel uses — or as an
        explicit ``kv_valid`` (B, S) mask (XLA path only, T==1).

    ``attn_impl``: "auto" (Pallas on TPU when shapes allow, else XLA),
    "xla", or "pallas".

    ``logit_window`` / ``hidden_window``: when > 0, logits (resp. the
    hidden-state stack) cover only the LAST W positions. With the
    left-padded splice layout the response always occupies the tail, so
    training losses need only that window — this keeps the (B, W, V) logits
    slab W/T times smaller than the full projection (the dominant training
    memory term for a 128k vocab).

    `inputs_embeds` bypasses the embedding table exactly like the reference's
    embedding-injection path (reference: trainer.py:317-322,
    inference.py:60-66 pass inputs_embeds to HF Llama).
    """
    if inputs_embeds is None:
        assert input_ids is not None
        table = params["embed_tokens"]
        if table.dtype == jnp.int8:  # weight-only quantized (per-vocab-row)
            scale = params["embed_tokens_scale"][input_ids]
            # dequantize to the model's ACTIVATION dtype (norm weights keep
            # it — quantization never touches them), not the bf16 scale
            # dtype: an f32 model fed bf16 embeds breaks the layer-scan
            # carry invariant once a norm promotes back to f32
            act_dtype = params["final_norm"].dtype
            inputs_embeds = (
                table[input_ids].astype(act_dtype) * scale[..., None].astype(act_dtype)
            )
        else:
            inputs_embeds = table[input_ids]
    x = inputs_embeds
    B, T, D = x.shape

    # the fused decode kernel has no fresh-token mask: it may only be
    # selected when the caller passed attn_mask=None (every fresh token
    # REAL — the T==1 decode-step contract). An explicit mask, even one
    # that happens to be all ones, routes to decode_xla_q, which applies it.
    fresh_mask_implicit = attn_mask is None
    if attn_mask is None:
        attn_mask = jnp.ones((B, T), bool)
    if positions is None:
        # HF-style left-pad positions: first real token gets position 0
        positions = jnp.maximum(jnp.cumsum(attn_mask.astype(jnp.int32), axis=1) - 1, 0)

    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    if positions.ndim == 1:
        positions = positions[None, :]
    # rope tables are layer-invariant: computed ONCE here, not in each of
    # the 28 scanned blocks (cos/sin fusions were a real decode-loop term)
    rope_cos, rope_sin = rope_cos_sin(positions, inv_freq)

    if attn_impl in ("auto", "fused"):
        # "fused" only changes the DECODE step; prefill/training keep the
        # auto flash/XLA choice
        use_pallas = jax.default_backend() == "tpu" and cfg.head_dim % 128 == 0
    else:
        use_pallas = attn_impl == "pallas"
    # TP mesh: only the FUSED kernels have a partitioning story (explicit
    # shard_map over "model" in _block) — the plain flash/decode pallas
    # kernels have no GSPMD rule and would force their sharded operands
    # replicated, so every non-fused path goes through the XLA formulations
    # (which shard cleanly on the head axis).
    tp_n = 1 if tp_mesh is None else dict(tp_mesh.shape).get("model", 1)
    if tp_n > 1:
        use_pallas = False
    else:
        tp_mesh = None
    # the head partition needs both head counts divisible (and the kernels'
    # internal row-grouping works on the per-shard head counts)
    tp_heads_ok = tp_n == 1 or (
        cfg.num_kv_heads % tp_n == 0 and cfg.num_heads % tp_n == 0
    )

    # paged cache (infer/paged.py PagedKVCache): decode-only through this
    # forward — prefill runs on a dense temp cache and scatters into pages
    # (SlotDecoder admit). Detected structurally to keep models/ from
    # importing infer/.
    is_paged = kv_cache is not None and hasattr(kv_cache, "page_table")
    is_prefill = (
        kv_cache is not None and not is_paged
        and kv_valid is None and kv_pad_lens is None
    )
    is_decode = kv_cache is not None and not is_prefill

    use_flash_T = T % 64 == 0  # kernels/flash_attention.py::_pick_block tiles
    if not is_decode:
        # training / teacher / prefill: causal over the fresh T keys only
        if ring_mesh is not None:
            # sequence parallelism: shard T over ring_mesh[ring_axis]. Only
            # the full-sequence (no-cache) modes — decode is a T=1 step and
            # prefill's cache write is per-device-local, neither shards T.
            assert kv_cache is None, "ring attention covers the cache-free forward"
            n_seq = ring_mesh.shape[ring_axis]
            assert T % n_seq == 0, f"T={T} not divisible by {ring_axis}={n_seq}"
            pad_lens = (T - jnp.sum(attn_mask.astype(jnp.int32), axis=1)).astype(jnp.int32)
            attn_kind, attn_args = "ring", (pad_lens,)
        elif use_pallas and use_flash_T:
            # left-padded window [pad_len, T)
            pad_lens = (T - jnp.sum(attn_mask.astype(jnp.int32), axis=1)).astype(jnp.int32)
            attn_kind, attn_args = "flash", (pad_lens, jnp.full((B,), T, jnp.int32))
        else:
            attn_kind, attn_args = "bias", (make_attention_bias(attn_mask, attn_mask, causal=True),)
    elif is_paged:
        # decode (T == 1) or a speculative (k+1)-token verification forward
        # (T > 1, infer/slots.py) — prefill still goes dense→scatter; the
        # paged kernel attends the fresh block causally
        ps_ = kv_cache.page_size
        fused_paged_ok = (
            cfg.head_dim % 128 == 0
            and ps_ % 32 == 0
            and (not kv_cache.quantized or ps_ % 128 == 0)
        ) or jax.default_backend() != "tpu"  # non-TPU → oracle (tests)
        if attn_impl == "fused" and T == 1 and not fresh_mask_implicit:
            raise ValueError(
                "attn_impl='fused' on a T==1 decode step requires "
                "attn_mask=None (the fused kernel treats the fresh token "
                "as real); an explicit mask would silently run the XLA "
                "path instead of the kernel you asked for"
            )
        if (
            attn_impl == "fused"
            and T == 1
            and fresh_mask_implicit
            and fused_paged_ok
            and tp_heads_ok
        ):
            # fused paged attention + in-place quantized page write
            # (kernels/fused_paged.py): pools ride the scan CARRY aliased
            # in place — no per-layer pool slice, no post-scan value
            # scatters; only the fresh token's SCALES exit for one tiny
            # post-scan scatter. Same fresh-token contract as decode_fused
            # (T == 1, attn_mask=None).
            attn_kind = "decode_paged_fused"
        else:
            attn_kind = (
                "decode_paged_xla"
                if attn_impl == "xla" or tp_mesh is not None
                else "decode_paged"
            )
        attn_args = (kv_cache.page_table, kv_cache.lengths, kv_cache.pad_lens)
    else:
        assert cache_offset is not None
        cache_offset = jnp.asarray(cache_offset, jnp.int32)
        per_row_offset = cache_offset.ndim == 1  # continuous batching: each
        # slot decodes at its own depth (infer/slots.py)
        S = kv_cache.max_len
        # decode: XLA's fused native-layout attention (decode_xla_q) beats
        # the Pallas decode kernel for BOTH bf16 and int8 caches (the int8
        # convert fuses into the attention program — no dequantized cache
        # copy), so "auto" always takes it; the Pallas kernel stays opt-in
        # via attn_impl="pallas" (measured history in PERF.md).
        pallas_decode_ok = (
            kv_pad_lens is not None
            and T == 1
            and cfg.head_dim % 128 == 0
            and not per_row_offset
            and jax.default_backend() == "tpu"
        )
        fused_shape_ok = (
            cfg.head_dim % 128 == 0 and kv_cache.max_len % 32 == 0
        ) or jax.default_backend() != "tpu"  # non-TPU → oracle (tests)
        if attn_impl == "fused" and T == 1 and not fresh_mask_implicit:
            raise ValueError(
                "attn_impl='fused' on a T==1 decode step requires "
                "attn_mask=None (the fused kernel treats the fresh token "
                "as real); an explicit mask would silently run the XLA "
                "path instead of the kernel you asked for"
            )
        # T == 1 is the plain decode step (both fused kernels handle it);
        # T > 1 is the speculative VERIFICATION forward (infer/slots.py
        # spec decode, round 5: VERDICT r4 weak #2's last uncovered
        # surface) — only the aliased-scale kernel supports multi-token
        # windows, so it needs the quantized cache + the aliased mode.
        fused_T_ok = T == 1 or (
            kv_cache.quantized
            and os.environ.get("LSS_FUSED_ALIASED_SCALES", "1") == "1"
        )
        if (
            attn_impl == "fused"
            and fused_T_ok
            and kv_pad_lens is not None
            and fused_shape_ok
            and fresh_mask_implicit
            and tp_heads_ok
        ):
            # fused attention + in-place quantized cache write: one Pallas
            # program per layer absorbs the two op families the decode-gap
            # attribution charged for the roofline gap (PERF.md); the cache
            # rides the scan CARRY and is aliased in place. Falls back to
            # the XLA oracle on non-TPU backends / unaligned shapes inside
            # the kernel wrapper. Contract for T > 1: offsets + T <= S
            # (slots.py reserves spec headroom in max_len).
            attn_kind = "decode_fused"
            attn_args = (
                kv_pad_lens.astype(jnp.int32),
                jnp.broadcast_to(cache_offset, (B,)).astype(jnp.int32),
            )
        elif attn_impl == "pallas" and pallas_decode_ok:
            attn_kind = "decode_pallas"
            attn_args = (kv_pad_lens.astype(jnp.int32), cache_offset)
        elif kv_pad_lens is not None:
            # fused native-layout decode for both bf16 and int8 caches;
            # handles scalar or per-row offsets, and T > 1 fresh queries
            # (speculative verification forwards, infer/slots.py)
            attn_kind = "decode_xla_q"
            attn_args = (
                kv_pad_lens.astype(jnp.int32),
                jnp.broadcast_to(cache_offset, (B,)),
                attn_mask,
            )
        else:
            # only reachable with kv_pad_lens=None, where is_prefill
            # classification guarantees kv_valid is not None
            assert not per_row_offset, "decode_xla path needs a scalar offset"
            assert kv_valid is not None
            kv_valid_full = jnp.concatenate([kv_valid, attn_mask], axis=1)  # (B, S+T)
            kv_idx = jnp.concatenate(
                [jnp.arange(S, dtype=jnp.int32), cache_offset + jnp.arange(T, dtype=jnp.int32)]
            )
            q_offset = jnp.full((B,), cache_offset, jnp.int32)
            attn_kind = "decode_xla"
            attn_args = (
                make_attention_bias(
                    attn_mask, kv_valid_full, causal=True, q_offset=q_offset, kv_idx=kv_idx
                ),
            )

    block = functools.partial(
        _block, attn_kind=attn_kind, ring_mesh=ring_mesh, ring_axis=ring_axis,
        tp_mesh=tp_mesh,
    )
    if remat:
        if remat_policy == "save_qkv":
            # selective remat for the FROZEN-LLM backward (train/step.py):
            # dx through a matmul is dy @ W.T — no activation needed — so
            # the only recompute the backward truly requires is feeding the
            # nonlinearities. Saving post-rope q/k/v (the flash-bwd kernel's
            # inputs) and the attention output skips recomputing the qkv
            # projections, rope, AND the flash forward; the MLP half
            # (gate/up, ~50% of layer FLOPs) still recomputes — saving it
            # would cost (B, T, 2I) per layer, the no-remat memory wall.
            # +((3..5)·Dh·Hkv·group + D)·B·T·2 bytes per layer of residency.
            pol = jax.checkpoint_policies.save_only_these_names(
                "attn_q", "attn_k", "attn_v", "attn_out"
            )
            block = jax.checkpoint(block, static_argnums=(0,), policy=pol)
        else:
            block = jax.checkpoint(block, static_argnums=(0,))

    def scan_body(carry, layer_in):
        h = carry
        if is_decode:
            lp, cache_kv = layer_in
        else:
            lp, cache_kv = layer_in, None
        out, kv_new = block(cfg, lp, h, rope_cos, rope_sin, attn_args, cache_kv)
        if return_hidden:
            hs = out[:, -hidden_window:] if hidden_window > 0 else out
        else:
            hs = jnp.zeros((0,), h.dtype)
        if kv_cache is None:
            return out, hs
        return out, (hs, kv_new)

    if attn_kind == "decode_fused":
        assert not return_hidden, "fused decode path is generation-only"
        quantized = kv_cache.quantized
        offsets_arr = attn_args[1]  # (B,)
        # Round 5 (VERDICT r4 #8): lane-padded scale slabs as aliased scan
        # carry, like the values — MEASURED FASTER and now the DEFAULT
        # (11.6 vs 12.5 ms/step at B=128/S=448 int8, alternating-run
        # confirmed; PERF.md round-5 scale-slab section). Removing the
        # per-layer scale xs/ys threading and the dense one-hot merge from
        # the scan body beats the 4 extra slab DMAs per program.
        # LSS_FUSED_ALIASED_SCALES=0 selects the round-4 xs/ys design.
        aliased = quantized and os.environ.get(
            "LSS_FUSED_ALIASED_SCALES", "1"
        ) == "1"
        # T > 1 (speculative verification forward) is only selected when
        # the aliased kernel will run it (dispatch above)
        assert T == 1 or aliased, "multi-token fused decode needs aliased scales"

        if aliased:
            S_ = kv_cache.k_scale.shape[-1]
            Spad_ = ((S_ + 127) // 128) * 128
            padw = ((0, 0), (0, 0), (0, 0), (0, Spad_ - S_))
            ksp = jnp.pad(kv_cache.k_scale, padw)
            vsp = jnp.pad(kv_cache.v_scale, padw)

            def scan_body_fused_aliased(carry, lp):
                h, kc, vc, ks, vs, li = carry
                out, (kc, vc, ks, vs) = block(
                    cfg, lp, h, rope_cos, rope_sin, attn_args + (li,),
                    (kc, vc, ks, vs),
                )
                return (out, kc, vc, ks, vs, li + 1), None

            (x, kc, vc, ksp, vsp, _), _ = jax.lax.scan(
                scan_body_fused_aliased,
                (x, kv_cache.k, kv_cache.v, ksp, vsp, jnp.int32(0)),
                params["layers"],
                unroll=scan_unroll,
            )
            hidden_stack = None
            new_kv = KVCache(kc, vc, ksp[..., :S_], vsp[..., :S_])
        else:

            def scan_body_fused(carry, xs_l):
                h, kc, vc, li = carry
                if quantized:
                    lp, ksl, vsl = xs_l
                else:
                    lp, ksl, vsl = xs_l, None, None
                out, new_caches = block(
                    cfg, lp, h, rope_cos, rope_sin, attn_args + (li,),
                    (kc, vc, ksl, vsl),
                )
                if quantized:
                    kc, vc, ksn, vsn = new_caches
                    # scatter the fresh token's scales into this layer's
                    # slab (values were written in place by the kernel; the
                    # scale slabs' lane dim is S, which Mosaic cannot
                    # DMA-slice at non-128-multiple S — so they ride xs/ys,
                    # ~1.8 MB/layer). Dense one-hot select, NOT a vmap'd
                    # dynamic-update-slice: XLA lowers the latter to a
                    # scatter, which measured ~13 ms across the 28-layer
                    # scan; the select is a fused elementwise pass.
                    S_ = ksl.shape[-1]
                    hit = (
                        jnp.arange(S_, dtype=jnp.int32)[None, None, :]
                        == offsets_arr[:, None, None]
                    )  # (B, 1, S)

                    def upd(slab, val):
                        return jnp.where(
                            hit, val[:, :, None].astype(slab.dtype), slab
                        )

                    ys = (upd(ksl, ksn), upd(vsl, vsn))
                else:
                    kc, vc = new_caches
                    ys = jnp.zeros((0,), h.dtype)
                return (out, kc, vc, li + 1), ys

            xs = (
                (params["layers"], kv_cache.k_scale, kv_cache.v_scale)
                if quantized
                else params["layers"]
            )
            (x, kc, vc, _), ys = jax.lax.scan(
                scan_body_fused,
                (x, kv_cache.k, kv_cache.v, jnp.int32(0)),
                xs,
                unroll=scan_unroll,
            )
            hidden_stack = None
            new_kv = (
                KVCache(kc, vc, ys[0], ys[1]) if quantized else KVCache(kc, vc)
            )
    elif attn_kind == "decode_paged_fused":
        assert not return_hidden, "fused decode path is generation-only"
        quantized = kv_cache.quantized

        def scan_body_paged_fused(carry, xs_l):
            h, kp, vp, li = carry
            if quantized:
                lp, ksl, vsl = xs_l
            else:
                lp, ksl, vsl = xs_l, None, None
            out, new_caches = block(
                cfg, lp, h, rope_cos, rope_sin, attn_args + (li,),
                (kp, vp, ksl, vsl),
            )
            if quantized:
                kp, vp, ksn, vsn = new_caches
                ys = (ksn, vsn)  # (B, Hkv) fresh scales, stacked over L
            else:
                kp, vp = new_caches
                ys = jnp.zeros((0,), h.dtype)
            return (out, kp, vp, li + 1), ys

        xs = (
            (params["layers"], kv_cache.k_scale, kv_cache.v_scale)
            if quantized
            else params["layers"]
        )
        (x, kp, vp, _), ys = jax.lax.scan(
            scan_body_paged_fused,
            (x, kv_cache.k_pool, kv_cache.v_pool, jnp.int32(0)),
            xs,
            unroll=scan_unroll,
        )
        hidden_stack = None
        if quantized:
            # ONE post-scan scatter of the (L, B, Hkv) fresh-scale stack at
            # each row's (page, slot) — write_tokens routing (out-of-table
            # positions sink to the null page 0); the 128×-bigger VALUES
            # were already written in place by the kernel.
            ps_ = kv_cache.page_size
            mp_ = kv_cache.page_table.shape[1]
            page_idx = kv_cache.lengths // ps_
            slot = kv_cache.lengths % ps_
            pid = jnp.take_along_axis(
                kv_cache.page_table, jnp.clip(page_idx, 0, mp_ - 1)[:, None], axis=1
            )[:, 0]
            pid = jnp.where((page_idx >= 0) & (page_idx < mp_), pid, 0)
            # (B,) advanced indices on axes (1: page, 3: slot) are separated
            # by the head slice, so numpy moves them to the FRONT — the
            # update operand is (B, L, Hkv) (write_tokens has the same rule)
            ksn = ys[0].transpose(1, 0, 2).astype(kv_cache.k_scale.dtype)
            vsn = ys[1].transpose(1, 0, 2).astype(kv_cache.v_scale.dtype)
            new_kv = kv_cache._replace(
                k_pool=kp,
                v_pool=vp,
                k_scale=kv_cache.k_scale.at[:, pid, :, slot].set(ksn),
                v_scale=kv_cache.v_scale.at[:, pid, :, slot].set(vsn),
            )
        else:
            new_kv = kv_cache._replace(k_pool=kp, v_pool=vp)
    elif kv_cache is None:
        x, hidden_stack = jax.lax.scan(scan_body, x, params["layers"], unroll=scan_unroll)
        new_kv = None
    else:
        if is_decode:
            if is_paged:
                cache_xs = (  # leading L on every pool
                    (kv_cache.k_pool, kv_cache.v_pool, kv_cache.k_scale, kv_cache.v_scale)
                    if kv_cache.quantized
                    else (kv_cache.k_pool, kv_cache.v_pool)
                )
            elif kv_cache.quantized:
                cache_xs = (kv_cache.k, kv_cache.v, kv_cache.k_scale, kv_cache.v_scale)
            else:
                cache_xs = (kv_cache.k, kv_cache.v)
            xs = (params["layers"], cache_xs)
        else:
            xs = params["layers"]
        x, ys = jax.lax.scan(scan_body, x, xs, unroll=scan_unroll)
        hidden_stack, (k_new, v_new) = ys  # k_new/v_new: (L, B, T, Hkv, Dh)
        if is_paged:
            # scatter the fresh token(s) into each row's pages at its
            # current length (infer/paged.py write semantics: lengths are
            # NOT advanced — the decode loop owns progression). T == 1 is
            # the decode step, T > 1 the speculative verification write.
            from ..infer.paged import write_tokens

            new_kv = write_tokens(kv_cache, k_new, v_new)
            k_new = v_new = None
        else:
            # cache layout (L, B, Hkv, S, Dh): one O(L·B·T) in-place write
            # instead of O(L·B·S) per-layer copies
            k_new = k_new.transpose(0, 1, 3, 2, 4)  # (L, B, Hkv, T, Dh)
            v_new = v_new.transpose(0, 1, 3, 2, 4)

        def write(buf, new):
            """In-place slot write at cache_offset — scalar, or per-row (B,)
            (continuous batching: each slot has its own depth)."""
            new = new.astype(buf.dtype)
            if jnp.ndim(cache_offset) == 0:
                idx = (0, 0, 0, cache_offset) + (0,) * (buf.ndim - 4)
                return jax.lax.dynamic_update_slice(buf, new, idx)

            def row(buf_b, new_b, off):
                idx = (0, 0, off) + (0,) * (buf_b.ndim - 3)
                return jax.lax.dynamic_update_slice(buf_b, new_b, idx)

            return jax.vmap(row, in_axes=(1, 1, 0), out_axes=1)(buf, new, cache_offset)

        if is_paged:
            pass  # new_kv already written above
        elif kv_cache.quantized:
            kq, ks = _quantize_kv(k_new)
            vq, vs = _quantize_kv(v_new)
            new_kv = KVCache(
                write(kv_cache.k, kq),
                write(kv_cache.v, vq),
                write(kv_cache.k_scale, ks),
                write(kv_cache.v_scale, vs),
            )
        else:
            new_kv = KVCache(
                write(kv_cache.k, k_new),
                write(kv_cache.v, v_new),
            )

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)

    hidden_states = None
    if return_hidden:
        # HF layout: index 0 = embedding output, i = output of block i
        # (reference: trainer.py:360-367 indexes hidden_states this way).
        emb = inputs_embeds[:, -hidden_window:] if hidden_window > 0 else inputs_embeds
        hidden_states = jnp.concatenate([emb[None], hidden_stack], axis=0)

    final_hidden = None
    if return_final_hidden:
        final_hidden = x[:, -logit_window:, :] if logit_window > 0 else x

    logits = None
    if compute_logits:
        if last_logit_only:
            # generation prefill: only the final position feeds sampling —
            # skipping the (B, T, V) projection saves T× the lm_head compute
            # and the dominant slab of prefill HBM (HF's num_logits_to_keep)
            x = x[:, -1:, :]
        elif logit_window > 0:
            x = x[:, -logit_window:, :]
        head = params["embed_tokens"].T if cfg.tie_embeddings else params["lm_head"]
        logits = jnp.einsum(
            "btd,dv->btv", x, head.astype(x.dtype), preferred_element_type=jnp.float32
        )
        if head.dtype == jnp.int8:  # per-vocab scale multiplies the logits
            hs = (
                params["embed_tokens_scale"]
                if cfg.tie_embeddings
                else params["lm_head_scale"]
            )
            logits = logits * hs.astype(jnp.float32)

    return LlamaOutput(
        logits=logits,
        hidden_states=hidden_states,
        kv_cache=new_kv,
        final_hidden=final_hidden,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def fuse_llama_params(params: Params) -> Params:
    """Decode-optimized parameter layout: wq/wk/wv concatenated into one
    ``wqkv`` and w_gate/w_up into ``w_gateup``, replacing the originals (same
    total HBM; the input tree is DONATED — callers must drop their reference,
    a 3B model cannot hold both copies on one chip). _block detects the fused
    names; numerics are identical
    (tests/test_hf_parity.py::test_fused_params_identical). The training
    path keeps the standard layout — optimizer state and converters
    (models/convert.py) never see fused trees."""
    layers = dict(params["layers"])
    layers["wqkv"] = jnp.concatenate(
        [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1
    )
    layers["w_gateup"] = jnp.concatenate(
        [layers.pop("w_gate"), layers.pop("w_up")], axis=-1
    )
    out = dict(params)
    out["layers"] = layers
    return out


@functools.partial(jax.jit, donate_argnums=(0,))
def quantize_llama_params(params: Params) -> Params:
    """Weight-only int8 quantization for serving (per-out-channel symmetric
    absmax; embedding table per-vocab-row). Halves the dominant decode HBM
    term — the 6.4 GB bf16 weight stream — to 3.2 GB; the int8→bf16 convert
    fuses into each matmul (same mechanism as the int8 KV cache). Standard
    TPU-serving practice; the reference serves fp16 with no quantized
    option (reference: inference.py:24-27). Input tree is DONATED.

    Composes with fuse_llama_params (fuse first, then quantize)."""

    def q(w, axis):
        absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
        scale = jnp.maximum(absmax / 127.0, 1e-12)
        qw = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
        return qw.astype(jnp.int8), jnp.squeeze(scale, axis).astype(jnp.bfloat16)

    layers = dict(params["layers"])
    for name in ("wqkv", "wq", "wk", "wv", "wo", "w_gateup", "w_gate", "w_up", "w_down"):
        if name in layers:
            # (L, Din, Dout) → scale per (L, Dout)
            qw, s = q(layers[name], axis=1)
            layers[name] = qw
            layers[name + "_scale"] = s
    out = dict(params)
    out["layers"] = layers
    qe, se = q(params["embed_tokens"], axis=1)  # (V, D) → per-row (V,)
    out["embed_tokens"] = qe
    out["embed_tokens_scale"] = se
    if "lm_head" in params:
        qh, sh = q(params["lm_head"], axis=0)  # (D, V) → per-column (V,)
        out["lm_head"] = qh
        out["lm_head_scale"] = sh
    return out


def config_to_dict(cfg: LlamaConfig) -> dict:
    return dataclasses.asdict(cfg)
