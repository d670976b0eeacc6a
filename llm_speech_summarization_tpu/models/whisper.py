"""Whisper encoder (openai/whisper-medium) + log-mel frontend.

The reference's Whisper path uses HF's WhisperFeatureExtractor on the host
inside the collator (log-mel, pad/truncate to 30 s → 3000 mel frames,
reference: trainer.py:168-199) and the encoder half of HF WhisperModel
(reference: model/audio_encoder.py:10-13,25-27). Here both stages are
from scratch:

  * ``log_mel_spectrogram`` — Whisper's exact frontend (n_fft 400, hop 160,
    Hann window, 80 Slaney-scale mel bins, log10 with 8-dB dynamic-range
    clamp and (x+4)/4 normalization) as a JAX function: framing is a
    reshape+gather, the DFT is a matmul against a precomputed real/imag
    basis (MXU-friendly; there is no fused rfft on TPU), mel projection is
    another matmul.
  * encoder — conv stem (k3 s1 → gelu → k3 s2 → gelu), fixed sinusoidal
    positions, pre-LN transformer blocks via ``lax.scan``, final LayerNorm.

Variable lengths are carried as masks; padded frames are masked from
self-attention (the reference relies on Whisper's fixed 30 s padding
instead).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, make_attention_bias
from ..ops.norms import layer_norm

Params = Dict[str, Any]


@dataclass(frozen=True)
class WhisperConfig:
    num_mel_bins: int = 80
    d_model: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    max_source_positions: int = 1500  # 30 s of 20 ms frames
    layer_norm_eps: float = 1e-5
    # frontend
    sampling_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160


_PRESETS = {
    "whisper_medium": WhisperConfig(),
    "whisper_base": WhisperConfig(d_model=512, num_layers=6, num_heads=8, ffn_dim=2048),
    "tiny": WhisperConfig(
        num_mel_bins=80, d_model=64, num_layers=2, num_heads=4, ffn_dim=128,
        max_source_positions=1500,
    ),
}


def whisper_preset(name: str) -> WhisperConfig:
    aliases = {
        "openai/whisper-medium": "whisper_medium",
        "openai/whisper-base": "whisper_base",
    }
    key = aliases.get(name, name)
    if key not in _PRESETS:
        raise KeyError(f"unknown whisper preset '{name}' (have {sorted(_PRESETS)})")
    return _PRESETS[key]


# ---------------------------------------------------------------------------
# Log-mel frontend
# ---------------------------------------------------------------------------


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney-style mel scale (what HF WhisperFeatureExtractor uses)."""
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    return np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    return np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@lru_cache(maxsize=4)
def _mel_filters(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Triangular Slaney-normalized mel filterbank, (n_fft//2+1, n_mels)."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(np.array(0.0)), _hz_to_mel(np.array(sr / 2.0)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]  # (F, n_mels+2)
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    return (fb * enorm[None, :]).astype(np.float32)


@lru_cache(maxsize=4)
def _dft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases (n_fft, n_fft//2+1) with Hann window folded in."""
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    angle = -2.0 * np.pi * np.outer(n, k) / n_fft
    real = (np.cos(angle) * window[:, None]).astype(np.float32)
    imag = (np.sin(angle) * window[:, None]).astype(np.float32)
    return real, imag


def log_mel_spectrogram(
    wav: jnp.ndarray, cfg: WhisperConfig, pad_to_frames: int | None = None
) -> jnp.ndarray:
    """(B, N) float waveform → (B, n_mels, T) Whisper-normalized log-mel.

    Matches openai-whisper/HF: reflect-pad n_fft//2 at both ends, Hann
    window, magnitude² spectrogram with the last frame dropped, mel
    projection, log10 clamp, max-8 floor, (x+4)/4.
    """
    B, N = wav.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    wav = wav.astype(jnp.float32)
    if pad_to_frames is not None:
        # Whisper zero-pads/truncates the raw audio to the 30 s budget BEFORE
        # the transform (HF WhisperFeatureExtractor does the same); doing it
        # here makes the boundary frames match HF bit-for-bit.
        target = pad_to_frames * hop
        if target > N:
            wav = jnp.pad(wav, ((0, 0), (0, target - N)))
        else:
            wav = wav[:, :target]
        N = target
    x = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    num_frames = N // hop  # whisper drops the final frame
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # (T, n_fft)
    frames = x[:, idx]  # (B, T, n_fft)

    real_b, imag_b = _dft_basis(n_fft)
    # precision=HIGHEST: this backend's f32 matmul default is LOW precision
    # (CLAUDE.md) — the DFT/mel projections must not drift from HF on TPU
    # when the CPU parity tests say they match
    hp = jax.lax.Precision.HIGHEST
    real = jnp.matmul(frames, jnp.asarray(real_b), precision=hp)
    imag = jnp.matmul(frames, jnp.asarray(imag_b), precision=hp)
    power = real * real + imag * imag  # (B, T, F)

    mel = jnp.matmul(
        power,
        jnp.asarray(_mel_filters(cfg.sampling_rate, n_fft, cfg.num_mel_bins)),
        precision=hp,
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.transpose(0, 2, 1)  # (B, n_mels, T)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positions (length, channels)."""
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def init_whisper_params(rng: jax.Array, cfg: WhisperConfig, dtype=jnp.bfloat16) -> Params:
    D, F, L = cfg.d_model, cfg.ffn_dim, cfg.num_layers
    keys = jax.random.split(rng, 12)
    ki = iter(range(12))

    def normal(shape, scale=0.02):
        return (scale * jax.random.normal(keys[next(ki)], shape, jnp.float32)).astype(dtype)

    return {
        "conv1_w": normal((D, cfg.num_mel_bins, 3)),  # torch OIH
        "conv1_b": jnp.zeros((D,), dtype),
        "conv2_w": normal((D, D, 3)),
        "conv2_b": jnp.zeros((D,), dtype),
        "pos_embed": jnp.asarray(_sinusoids(cfg.max_source_positions, D), dtype),
        "layers": {
            "ln1_scale": jnp.ones((L, D), dtype),
            "ln1_bias": jnp.zeros((L, D), dtype),
            "wq": normal((L, D, D)),
            "bq": jnp.zeros((L, D), dtype),
            "wk": normal((L, D, D)),  # k has no bias in Whisper
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
        "final_ln_scale": jnp.ones((D,), dtype),
        "final_ln_bias": jnp.zeros((D,), dtype),
    }


def whisper_forward(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    mel_frame_counts: jnp.ndarray | None = None,
    remat: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mel (B, n_mels, T_mel) → (frames (B, T, D), frame_mask (B, T)); T = T_mel // 2."""
    from .hubert import _conv1d  # same conv primitive

    B = mel.shape[0]
    x = mel.astype(params["conv1_w"].dtype)
    x = jax.nn.gelu(_conv1d(x, params["conv1_w"], 1, padding=1) + params["conv1_b"][None, :, None],
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], 2, padding=1) + params["conv2_b"][None, :, None],
                    approximate=False)
    h = x.transpose(0, 2, 1)  # (B, T, D)
    T = h.shape[1]
    if T > params["pos_embed"].shape[0]:
        raise ValueError(
            f"mel input yields {T} encoder frames > max_source_positions "
            f"{params['pos_embed'].shape[0]} (the 30 s whisper budget) — "
            "pad_to_frames/truncate the mel like HF does"
        )
    h = h + params["pos_embed"][None, :T]

    if mel_frame_counts is None:
        frame_mask = jnp.ones((B, T), bool)
        n_valid = jnp.full((B,), T, jnp.int32)
    else:
        n_valid = (mel_frame_counts.astype(jnp.int32) + 1) // 2
        frame_mask = jnp.arange(T, dtype=jnp.int32)[None, :] < n_valid[:, None]

    # TPU: pad frames to a flash-tileable length, run the Pallas kernel
    # with [0, n_valid) windows (same trick as hubert_forward)
    T_real = T
    # Same fault-isolation knob as hubert.py: LSS_ENCODER_FLASH=0 → XLA path.
    use_flash = (
        jax.default_backend() == "tpu"
        and (cfg.d_model // cfg.num_heads) in (64, 128)
        and os.environ.get("LSS_ENCODER_FLASH", "1") != "0"
    )
    if use_flash:
        T = ((T_real + 127) // 128) * 128
        if T != T_real:
            h = jnp.pad(h, ((0, 0), (0, T - T_real), (0, 0)))
        bias = None
        starts = jnp.zeros((B,), jnp.int32)
    else:
        bias = make_attention_bias(frame_mask, frame_mask, causal=False)
    Hh = cfg.num_heads
    Dh = cfg.d_model // Hh

    def block(h, lp):
        def attn_ffn(h):
            a_in = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
            q = (a_in @ lp["wq"] + lp["bq"]).reshape(B, T, Hh, Dh)
            k = (a_in @ lp["wk"]).reshape(B, T, Hh, Dh)
            v = (a_in @ lp["wv"] + lp["bv"]).reshape(B, T, Hh, Dh)
            if use_flash:
                from ..kernels.flash_attention import flash_attention

                a = flash_attention(q, k, v, starts, n_valid, causal=False)
                a = a.reshape(B, T, cfg.d_model)
            else:
                a = dot_product_attention(q, k, v, bias).reshape(B, T, cfg.d_model)
            h = h + (a @ lp["wo"] + lp["bo"])
            f_in = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
            f = jax.nn.gelu(f_in @ lp["w1"] + lp["b1"], approximate=False)
            return h + (f @ lp["w2"] + lp["b2"])

        fn = jax.checkpoint(attn_ffn) if remat else attn_ffn
        return fn(h), None

    h, _ = jax.lax.scan(block, h, params["layers"])
    h = layer_norm(h, params["final_ln_scale"], params["final_ln_bias"], cfg.layer_norm_eps)
    if use_flash and T != T_real:
        h = h[:, :T_real]
    return h, frame_mask
