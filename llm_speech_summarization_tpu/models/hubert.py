"""HuBERT speech encoder (facebook/hubert-base-ls960 / hubert-large-ls960-ft).

The trainable half of the reference's AudioEncoder wraps HF's HuBERT
(reference: model/audio_encoder.py:6-7,22-24,57). This is a from-scratch XLA
implementation of the same architecture:

  waveform (B, N) → 7-layer strided conv feature extractor (×320
  downsample, 20 ms frames) → feature projection → +positional conv
  embedding → transformer encoder → (B, T, D) frames.

TPU-first choices:
  * stacked per-layer params + ``lax.scan`` over transformer blocks;
  * static shapes; variable lengths carried as masks. Unlike the reference —
    which feeds right-padded batches to HuBERT with **no** attention mask
    (reference: trainer.py:278, audio_encoder.py:57) — padded frames are
    masked out of self-attention here, so batched results match
    one-at-a-time results;
  * fp32 norm statistics, bf16 matmuls.

Both HF variants are covered: `hubert-base` (group-norm first conv,
post-layer-norm blocks) and `hubert-large` (per-conv layer norm,
pre-layer-norm "stable" blocks).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, make_attention_bias
from ..ops.norms import layer_norm

Params = Dict[str, Any]


@dataclass(frozen=True)
class HubertConfig:
    conv_dims: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # "layer" (large) | "group" (base)
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    do_stable_layer_norm: bool = True  # pre-LN (large) vs post-LN (base)
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16


_PRESETS = {
    "hubert_large": HubertConfig(),
    "hubert_base": HubertConfig(
        conv_bias=False,
        feat_extract_norm="group",
        hidden_size=768,
        num_layers=12,
        num_heads=12,
        intermediate_size=3072,
        do_stable_layer_norm=False,
    ),
    "tiny": HubertConfig(
        conv_dims=(32, 32, 32, 32),
        conv_kernels=(10, 8, 4, 4),
        conv_strides=(5, 4, 4, 4),  # ×320 total like the real model (20 ms frames)
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        pos_conv_kernel=16,
        pos_conv_groups=4,
    ),
}


def hubert_preset(name: str) -> HubertConfig:
    aliases = {
        "facebook/hubert-large-ls960-ft": "hubert_large",
        "facebook/hubert-base-ls960": "hubert_base",
    }
    key = aliases.get(name, name)
    if key not in _PRESETS:
        raise KeyError(f"unknown hubert preset '{name}' (have {sorted(_PRESETS)})")
    return _PRESETS[key]


def hubert_frame_count(cfg: HubertConfig, num_samples: jnp.ndarray) -> jnp.ndarray:
    """Output frame count of the conv feature extractor for given sample counts."""
    n = num_samples
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        n = (n - k) // s + 1
    return n


def conv_receptive_field(cfg: HubertConfig) -> Tuple[int, int]:
    """(receptive_field, total_stride) of the conv stem — the halo a
    sequence-parallel shard must borrow from its right neighbor is
    R - S samples (long-audio path, docs/DESIGN.md "Long audio" step 1)."""
    R, S = 1, 1
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        R += (k - 1) * S
        S *= s
    return R, S


def init_hubert_params(rng: jax.Array, cfg: HubertConfig, dtype=jnp.bfloat16) -> Params:
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    # NOTE: 4 slack keys are never drawn — kept so the split count (and
    # therefore every random init stream) stays stable; goldens and parity
    # fixtures are pinned to these streams
    n_keys = 4 + len(cfg.conv_dims) + 8
    keys = jax.random.split(rng, n_keys)
    ki = iter(range(n_keys))

    def normal(shape, scale=0.02):
        return (scale * jax.random.normal(keys[next(ki)], shape, jnp.float32)).astype(dtype)

    conv_layers = []
    in_dim = 1
    for i, (dim, k) in enumerate(zip(cfg.conv_dims, cfg.conv_kernels)):
        layer = {"w": normal((dim, in_dim, k))}  # torch OIH layout
        if cfg.conv_bias:
            layer["b"] = jnp.zeros((dim,), dtype)
        if cfg.feat_extract_norm == "layer":
            layer["ln_scale"] = jnp.ones((dim,), dtype)
            layer["ln_bias"] = jnp.zeros((dim,), dtype)
        elif i == 0:  # group norm on the first layer only (base variant)
            layer["gn_scale"] = jnp.ones((dim,), dtype)
            layer["gn_bias"] = jnp.zeros((dim,), dtype)
        conv_layers.append(layer)
        in_dim = dim

    params: Params = {
        "conv_layers": conv_layers,
        "fp_ln_scale": jnp.ones((cfg.conv_dims[-1],), dtype),
        "fp_ln_bias": jnp.zeros((cfg.conv_dims[-1],), dtype),
        "fp_w": normal((cfg.conv_dims[-1], D)),
        "fp_b": jnp.zeros((D,), dtype),
        # combined weight-norm pos-conv weight, torch layout (D, D/groups, K)
        "pos_conv_w": normal((D, D // cfg.pos_conv_groups, cfg.pos_conv_kernel)),
        "pos_conv_b": jnp.zeros((D,), dtype),
        "layers": {
            "ln1_scale": jnp.ones((L, D), dtype),
            "ln1_bias": jnp.zeros((L, D), dtype),
            "wq": normal((L, D, D)),
            "bq": jnp.zeros((L, D), dtype),
            "wk": normal((L, D, D)),
            "bk": jnp.zeros((L, D), dtype),
            "wv": normal((L, D, D)),
            "bv": jnp.zeros((L, D), dtype),
            "wo": normal((L, D, D)),
            "bo": jnp.zeros((L, D), dtype),
            "ln2_scale": jnp.ones((L, D), dtype),
            "ln2_bias": jnp.zeros((L, D), dtype),
            "w1": normal((L, D, F)),
            "b1": jnp.zeros((L, F), dtype),
            "w2": normal((L, F, D)),
            "b2": jnp.zeros((L, D), dtype),
        },
        "encoder_ln_scale": jnp.ones((D,), dtype),
        "encoder_ln_bias": jnp.zeros((D,), dtype),
    }
    return params


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, stride: int, padding: int = 0,
            groups: int = 1) -> jnp.ndarray:
    """x: (B, Cin, N), w: (Cout, Cin/groups, K) torch layout → (B, Cout, N')."""
    # conv in operand dtype: preferred_element_type=f32 breaks reverse-mode
    # autodiff (the transposed conv sees f32 cotangents vs bf16 weights)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )


def _feature_extractor(params: Params, cfg: HubertConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """(B, N) waveform → (B, T, C) conv features."""
    x = wav[:, None, :]  # (B, 1, N)
    for i, layer in enumerate(params["conv_layers"]):
        x = _conv1d(x, layer["w"].astype(x.dtype), cfg.conv_strides[i])
        if "b" in layer:
            x = x + layer["b"][None, :, None]
        if "ln_scale" in layer:
            # layer norm over channels: transpose to (B, T, C)
            x = layer_norm(x.transpose(0, 2, 1), layer["ln_scale"], layer["ln_bias"],
                           cfg.layer_norm_eps).transpose(0, 2, 1)
        elif "gn_scale" in layer:
            # group norm with groups == channels: normalize each channel over time
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=2, keepdims=True)
            var = jnp.var(xf, axis=2, keepdims=True)
            xf = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x = xf.astype(x.dtype) * layer["gn_scale"][None, :, None] + layer["gn_bias"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
    return x.transpose(0, 2, 1)  # (B, T, C)


def _pos_conv(params: Params, cfg: HubertConfig, x: jnp.ndarray) -> jnp.ndarray:
    """HF HubertPositionalConvEmbedding: grouped conv k=128 pad=64, crop 1 if even."""
    h = _conv1d(
        x.transpose(0, 2, 1),
        params["pos_conv_w"].astype(x.dtype),
        stride=1,
        padding=cfg.pos_conv_kernel // 2,
        groups=cfg.pos_conv_groups,
    )
    h = h + params["pos_conv_b"][None, :, None]
    if cfg.pos_conv_kernel % 2 == 0:
        h = h[:, :, :-1]
    return jax.nn.gelu(h, approximate=False).transpose(0, 2, 1)


def _feature_extractor_sp(params, cfg, wav, mesh, axis):
    """Frame-sharded conv stem: each device convolves its local waveform
    shard plus a receptive-field halo borrowed from its right neighbor via
    ``ppermute`` (the last device pads zeros — beyond-audio frames are
    masked downstream exactly like the unsharded pad frames). Valid convs
    are translation-invariant, so local frames == the global frames whose
    windows start inside the local sample range."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    R, S = conv_receptive_field(cfg)
    halo = R - S
    n = mesh.shape[axis]
    B, N = wav.shape
    Nl = N // n
    F = Nl // S
    # local frames available from (Nl + halo) samples must cover F
    assert int(hubert_frame_count(cfg, Nl + halo)) >= F, (Nl, halo, F)
    conv_params = {"conv_layers": params["conv_layers"]}

    def body(wav_local, cp):
        first = wav_local[:, :halo]
        # send my first `halo` samples to my LEFT neighbor (no wraparound:
        # the last device receives zeros = the global right padding)
        perm = [(i, i - 1) for i in range(1, n)]
        recv = jax.lax.ppermute(first, axis, perm)
        x = jnp.concatenate([wav_local, recv], axis=1)  # (B, Nl + halo)
        feats = _feature_extractor(cp, cfg, x)
        return feats[:, :F]

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )(wav, conv_params)


def _pos_conv_sp(params, cfg, h, mesh, axis):
    """Frame-sharded positional conv: halo of k//2 frames from BOTH
    neighbors (edge devices receive zeros = the global zero padding),
    valid conv, crop the even-kernel extra frame — identical to the
    unsharded ``_pos_conv`` output per frame."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    K = cfg.pos_conv_kernel
    assert K % 2 == 0, "SP pos-conv assumes the (standard) even kernel"
    pad = K // 2
    n = mesh.shape[axis]
    pos_p = {"w": params["pos_conv_w"], "b": params["pos_conv_b"]}

    def body(h_local, pp):
        F = h_local.shape[1]
        assert F >= pad, f"local frames {F} < pos-conv halo {pad}"
        left = jax.lax.ppermute(  # my tail → right neighbor's left halo
            h_local[:, -pad:], axis, [(i, i + 1) for i in range(n - 1)]
        )
        right = jax.lax.ppermute(  # my head → left neighbor's right halo
            h_local[:, :pad], axis, [(i, i - 1) for i in range(1, n)]
        )
        hx = jnp.concatenate([left, h_local, right], axis=1)  # (B, F+K, D)
        out = _conv1d(
            hx.transpose(0, 2, 1), pp["w"].astype(h_local.dtype),
            stride=1, padding=0, groups=cfg.pos_conv_groups,
        )
        out = out + pp["b"][None, :, None]
        out = out[:, :, :F]  # crop the even-kernel extra frame
        return jax.nn.gelu(out, approximate=False).transpose(0, 2, 1)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )(h, pos_p)


def _hubert_forward_sp(params, cfg, wav, wav_mask, remat, mesh, axis):
    """Sequence-parallel hubert_forward (VERDICT r2 #3 / DESIGN "Long
    audio" step 1): waveform and frames shard over the mesh ``axis``; the
    conv stem and positional conv exchange receptive-field halos via
    ppermute, and self-attention runs as bidirectional ring attention
    (ops/ring_attention.py — flash interior on TPU). Matches the unsharded
    forward on valid frames (tests/test_ring_attention.py)."""
    from ..ops.ring_attention import ring_attention

    B, N = wav.shape
    n = mesh.shape[axis]
    R, S = conv_receptive_field(cfg)
    assert N % (S * n) == 0, (
        f"encoder SP needs audio buckets divisible by stride*seq = {S * n}, got {N}"
    )
    assert cfg.feat_extract_norm == "layer", (
        "encoder SP supports the layer-norm conv stem (hubert-large); the "
        "base variant's group norm takes global moments over time"
    )
    assert cfg.do_stable_layer_norm, "encoder SP assumes the pre-LN (large) blocks"

    T = (N // (S * n)) * n  # n*F: one (masked) frame beyond the true count
    T_real = int(hubert_frame_count(cfg, N))
    feats = _feature_extractor_sp(params, cfg, wav, mesh, axis)  # (B, T, C)

    if wav_mask is None:
        n_valid = jnp.full((B,), T_real, jnp.int32)
    else:
        n_valid = hubert_frame_count(
            cfg, jnp.sum(wav_mask.astype(jnp.int32), axis=1)
        ).astype(jnp.int32)
    frame_mask = jnp.arange(T, dtype=jnp.int32)[None, :] < n_valid[:, None]

    h = layer_norm(feats, params["fp_ln_scale"], params["fp_ln_bias"], cfg.layer_norm_eps)
    h = h @ params["fp_w"].astype(h.dtype) + params["fp_b"]
    h = h * frame_mask[..., None].astype(h.dtype)
    h = h + _pos_conv_sp(params, cfg, h, mesh, axis)

    Hh = cfg.num_heads
    Dh = cfg.hidden_size // Hh
    starts = jnp.zeros((B,), jnp.int32)

    def block(h, lp):
        def attn_ffn(h):
            a_in = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
            q = (a_in @ lp["wq"] + lp["bq"]).reshape(B, T, Hh, Dh)
            k = (a_in @ lp["wk"] + lp["bk"]).reshape(B, T, Hh, Dh)
            v = (a_in @ lp["wv"] + lp["bv"]).reshape(B, T, Hh, Dh)
            a = ring_attention(
                q, k, v, starts, mesh, seq_axis=axis, causal=False, ends=n_valid
            ).reshape(B, T, cfg.hidden_size)
            h = h + (a @ lp["wo"] + lp["bo"])
            f_in = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
            f = jax.nn.gelu(f_in @ lp["w1"] + lp["b1"], approximate=False)
            return h + (f @ lp["w2"] + lp["b2"])

        fn = jax.checkpoint(attn_ffn) if remat else attn_ffn
        return fn(h), None

    h, _ = jax.lax.scan(block, h, params["layers"])
    h = layer_norm(h, params["encoder_ln_scale"], params["encoder_ln_bias"], cfg.layer_norm_eps)
    # slice to the unsharded frame count: the (masked) overhang frame on the
    # last shard exists only to keep per-device shapes uniform
    return h[:, :T_real], frame_mask[:, :T_real]


def hubert_forward(
    params: Params,
    cfg: HubertConfig,
    wav: jnp.ndarray,
    wav_mask: jnp.ndarray | None = None,
    remat: bool = False,
    sp_mesh=None,
    sp_axis: str = "seq",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """waveform (B, N) [+ sample-validity mask] → (frames (B, T, D), frame_mask (B, T)).

    ``sp_mesh``/``sp_axis``: shard frames over a mesh axis for long audio
    (conv halo exchange + bidirectional ring attention)."""
    if sp_mesh is not None and sp_mesh.shape[sp_axis] > 1:
        return _hubert_forward_sp(params, cfg, wav, wav_mask, remat, sp_mesh, sp_axis)
    B, N = wav.shape
    feats = _feature_extractor(params, cfg, wav)  # (B, T, C)
    T = feats.shape[1]
    if wav_mask is None:
        frame_mask = jnp.ones((B, T), bool)
    else:
        n_valid = hubert_frame_count(cfg, jnp.sum(wav_mask.astype(jnp.int32), axis=1))
        frame_mask = jnp.arange(T, dtype=jnp.int32)[None, :] < n_valid[:, None]

    h = layer_norm(feats, params["fp_ln_scale"], params["fp_ln_bias"], cfg.layer_norm_eps)
    h = h @ params["fp_w"].astype(h.dtype) + params["fp_b"]

    # Zero features at padded frames (HF `_mask_hidden_states` does the same)
    # so the positional conv sees zeros there and batched results equal
    # single-sample results up to conv edge effects.
    h = h * frame_mask[..., None].astype(h.dtype)

    h = h + _pos_conv(params, cfg, h)
    if not cfg.do_stable_layer_norm:
        h = layer_norm(h, params["encoder_ln_scale"], params["encoder_ln_bias"], cfg.layer_norm_eps)

    # On TPU, pad frames to a flash-tileable length and run the Pallas
    # kernel with per-sample [0, n_valid) windows; otherwise XLA attention
    # over the boolean mask (identical semantics, tests cover both).
    n_valid = jnp.sum(frame_mask.astype(jnp.int32), axis=1)
    T_real = h.shape[1]
    # LSS_ENCODER_FLASH=0 gates the Pallas path off (fault-isolation knob:
    # bench.py flips it when a TPU worker fault is suspected in this kernel).
    use_flash = (
        jax.default_backend() == "tpu"
        and (cfg.hidden_size // cfg.num_heads) in (64, 128)
        and os.environ.get("LSS_ENCODER_FLASH", "1") != "0"
    )
    if use_flash:
        T_pad = ((T_real + 127) // 128) * 128
        if T_pad != T_real:
            h = jnp.pad(h, ((0, 0), (0, T_pad - T_real), (0, 0)))
        T = T_pad
        bias = None
        starts = jnp.zeros((B,), jnp.int32)
    else:
        T = T_real
        bias = make_attention_bias(frame_mask, frame_mask, causal=False)
    Hh = cfg.num_heads
    Dh = cfg.hidden_size // Hh

    def block(h, lp):
        def attn_ffn(h):
            if cfg.do_stable_layer_norm:  # pre-LN
                a_in = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
            else:
                a_in = h
            q = (a_in @ lp["wq"] + lp["bq"]).reshape(B, T, Hh, Dh)
            k = (a_in @ lp["wk"] + lp["bk"]).reshape(B, T, Hh, Dh)
            v = (a_in @ lp["wv"] + lp["bv"]).reshape(B, T, Hh, Dh)
            if use_flash:
                from ..kernels.flash_attention import flash_attention

                a = flash_attention(q, k, v, starts, n_valid, causal=False)
                a = a.reshape(B, T, cfg.hidden_size)
            else:
                a = dot_product_attention(q, k, v, bias).reshape(B, T, cfg.hidden_size)
            h = h + (a @ lp["wo"] + lp["bo"])
            if not cfg.do_stable_layer_norm:  # post-LN
                h = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
                f_in = h
            else:
                f_in = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
            f = jax.nn.gelu(f_in @ lp["w1"] + lp["b1"], approximate=False)
            h = h + (f @ lp["w2"] + lp["b2"])
            if not cfg.do_stable_layer_norm:
                h = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
            return h

        fn = jax.checkpoint(attn_ffn) if remat else attn_ffn
        return fn(h), None

    h, _ = jax.lax.scan(block, h, params["layers"])
    if cfg.do_stable_layer_norm:
        h = layer_norm(h, params["encoder_ln_scale"], params["encoder_ln_bias"], cfg.layer_norm_eps)
    if use_flash and T != T_real:
        h = h[:, :T_real]
    return h, frame_mask


def init_hubert_ctc_head(rng: jax.Array, cfg: HubertConfig, vocab_size: int,
                         dtype=jnp.bfloat16) -> Params:
    """CTC head (HF HubertForCTC's lm_head) used by the preprocessing jobs
    to produce word offsets (reference: preprocess_data/utils.py:134-152)."""
    w = (0.02 * jax.random.normal(rng, (cfg.hidden_size, vocab_size), jnp.float32)).astype(dtype)
    return {"ctc_w": w, "ctc_b": jnp.zeros((vocab_size,), dtype)}


def hubert_ctc_logits(
    params: Params,
    head: Params,
    cfg: HubertConfig,
    wav: jnp.ndarray,
    wav_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """waveform → (framewise CTC logits (B, T, V), frame_mask)."""
    frames, frame_mask = hubert_forward(params, cfg, wav, wav_mask)
    logits = frames @ head["ctc_w"].astype(frames.dtype) + head["ctc_b"]
    return logits.astype(jnp.float32), frame_mask
