"""AudioEncoder: speech encoder + downsampling projector into LLM embed space.

Functional re-design of the reference's trainable ``AudioEncoder``
(reference: model/audio_encoder.py:16-88): HuBERT or Whisper-encoder frames
are downsampled ×4 by one of three methods and projected with a Linear layer
into the frozen LLM's token-embedding space (3072 channels for both
reference LLMs).

Downsample methods (reference: model/audio_encoder.py:31-52):
  * "pool"     — AvgPool1d(kernel=8, stride=4) over time, then Linear
  * "stack"    — concat 4 adjacent frames, then Linear(4·H → E)
  * "ctc_pool" — mean over CTC word-offset (start, end) frame ranges, then
                 Linear; batched segment-mean instead of the reference's
                 bs=1 Python loop (reference: model/audio_encoder.py:76-82)

The returned embedding lengths use the reference's audio-length calculus
(reference: utils.py:13-24 via trainer.py:280-294) so splicing crops
identically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops.pooling import avg_pool_time, ctc_segment_mean, stack_downsample
from .hubert import hubert_forward, hubert_preset, init_hubert_params
from .whisper import (
    WhisperConfig,
    init_whisper_params,
    log_mel_spectrogram,
    whisper_forward,
    whisper_preset,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class AudioEncoderParams:
    """Static (non-learned) setup for the audio encoder."""

    base: str  # "hubert" | "whisper"
    encoder_cfg: Any  # HubertConfig | WhisperConfig
    downsample_method: str  # "pool" | "stack" | "ctc_pool"
    downsample_factor: int
    pool_kernel: int
    pool_stride: int
    llm_embedding_channels: int
    sampling_rate: int = 16000
    whisper_dynamic_frames: bool = False


def encoder_setup_from_config(cfg: Config) -> AudioEncoderParams:
    ae = cfg.model.audio_encoder
    preset_name = ae.preset or ae.type
    if ae.base == "hubert":
        enc_cfg: Any = hubert_preset(preset_name)
    elif ae.base == "whisper":
        enc_cfg = whisper_preset(preset_name)
    else:
        raise ValueError(f"unexpected encoder base '{ae.base}'")  # reference: audio_encoder.py:29
    return AudioEncoderParams(
        base=ae.base,
        encoder_cfg=enc_cfg,
        downsample_method=ae.downsample_method,
        downsample_factor=ae.downsample_factor,
        pool_kernel=ae.pooling.kernel_size,
        pool_stride=ae.pooling.stride,
        llm_embedding_channels=cfg.model.llm_embedding_channels,
        sampling_rate=cfg.audio.sampling_rate,
        whisper_dynamic_frames=ae.whisper_dynamic_frames,
    )


def init_audio_encoder(rng: jax.Array, setup: AudioEncoderParams, dtype=jnp.bfloat16) -> Params:
    k_enc, k_proj = jax.random.split(rng)
    if setup.base == "hubert":
        enc_params = init_hubert_params(k_enc, setup.encoder_cfg, dtype)
        hidden = setup.encoder_cfg.hidden_size
    else:
        enc_params = init_whisper_params(k_enc, setup.encoder_cfg, dtype)
        hidden = setup.encoder_cfg.d_model
    in_dim = hidden * setup.downsample_factor if setup.downsample_method == "stack" else hidden
    E = setup.llm_embedding_channels
    scale = in_dim ** -0.5
    proj_w = (scale * jax.random.normal(k_proj, (in_dim, E), jnp.float32)).astype(dtype)
    return {"encoder": enc_params, "proj_w": proj_w, "proj_b": jnp.zeros((E,), dtype)}


def audio_embed_lengths(setup: AudioEncoderParams, audio_len_samples: jnp.ndarray) -> jnp.ndarray:
    """Vectorized compute_num_audio_embeds (reference: utils.py:13-24)."""
    sr = setup.sampling_rate
    num_frames = (audio_len_samples - (sr // 100)) // (sr // 50)
    # floor at 0: sub-~90 ms audio would yield -1, and a negative emb_len
    # shifts the splice's suffix boundary INTO the prefix (silently
    # malformed prompt)
    return jnp.maximum(num_frames // setup.downsample_factor - 1, 0).astype(jnp.int32)


def audio_encoder_forward(
    params: Params,
    setup: AudioEncoderParams,
    wav: jnp.ndarray,
    wav_lens: Optional[jnp.ndarray] = None,
    ctc_pool_ranges: Optional[jnp.ndarray] = None,
    remat: bool = False,
    sp_mesh=None,
    sp_axis: str = "seq",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """waveform (B, N) [+ per-sample lengths] → (embeds (B, M, E), emb_lens (B,)).

    The output buffer is right-padded; `emb_lens` follows the reference's
    length calculus so downstream splicing crops exactly like
    trainer.py:280-294. For "ctc_pool", `ctc_pool_ranges` (B, G, 2) selects
    frame ranges and emb_lens is the number of valid ranges.

    ``sp_mesh``/``sp_axis``: long-audio sequence parallelism — encoder
    frames shard over the mesh axis (models/hubert.py SP path); pooling and
    projection run on the (small) gathered frames.
    """
    B, N = wav.shape
    if wav_lens is None:
        wav_lens = jnp.full((B,), N, jnp.int32)
    wav_mask = jnp.arange(N, dtype=jnp.int32)[None, :] < wav_lens[:, None]
    wav = wav * wav_mask.astype(wav.dtype)

    # mixed precision: cast (possibly f32 master) params to the compute
    # dtype once — otherwise every f32 bias add silently promotes the
    # activations (and their autodiff residuals) back to f32
    params = jax.tree_util.tree_map(
        lambda p: p.astype(wav.dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )

    if setup.base == "hubert":
        frames, _ = hubert_forward(
            params["encoder"], setup.encoder_cfg, wav, wav_mask, remat=remat,
            sp_mesh=sp_mesh, sp_axis=sp_axis,
        )
    else:
        assert sp_mesh is None or sp_mesh.shape[sp_axis] == 1, (
            "encoder sequence parallelism covers the HuBERT path (the "
            "whisper variant is 30 s-bounded by its mel featurization)"
        )
        w_cfg: WhisperConfig = setup.encoder_cfg
        # reference pads/truncates to 30 s via WhisperFeatureExtractor
        # (trainer.py:178-182); mirror that with a fixed mel frame budget.
        # whisper_dynamic_frames sizes the budget to the (bucketed) input
        # instead — valid embeds are identical (padded frames are masked)
        # but a 10 s clip runs a 3x smaller encoder (PERF.md).
        budget = 2 * w_cfg.max_source_positions
        if setup.whisper_dynamic_frames:
            need = N // w_cfg.hop_length
            need = ((need + 1) // 2) * 2  # conv2 stride 2 wants even frames
            budget = min(budget, max(need, 2))
        mel = log_mel_spectrogram(wav, w_cfg, pad_to_frames=budget)
        mel_counts = wav_lens // w_cfg.hop_length
        frames, _ = whisper_forward(params["encoder"], w_cfg, mel, mel_counts, remat=remat)

    method = setup.downsample_method
    if method == "pool":
        pooled = avg_pool_time(frames, setup.pool_kernel, setup.pool_stride)
        emb_lens = audio_embed_lengths(setup, wav_lens)
    elif method == "stack":
        pooled = stack_downsample(frames, setup.downsample_factor)
        emb_lens = audio_embed_lengths(setup, wav_lens)
    elif method == "ctc_pool":
        assert ctc_pool_ranges is not None, (
            "Need to specify CTC pool ranges if using ctc_pool downsample method."
        )  # reference: model/audio_encoder.py:73-75
        pooled, valid = ctc_segment_mean(frames, ctc_pool_ranges)
        emb_lens = jnp.sum(valid.astype(jnp.int32), axis=1)
    else:
        raise ValueError(f"invalid downsampling method '{method}'")  # reference: audio_encoder.py:85

    embeds = pooled @ params["proj_w"].astype(pooled.dtype) + params["proj_b"]
    emb_lens = jnp.clip(emb_lens, 0, embeds.shape[1])
    return embeds, emb_lens


class AudioEncoder:
    """Convenience OO wrapper bundling setup + init/apply (mirrors the
    reference's class surface, reference: model/audio_encoder.py:16)."""

    def __init__(self, config: Config, dtype=jnp.bfloat16):
        self.setup = encoder_setup_from_config(config)
        self.dtype = dtype

    def init(self, rng: jax.Array) -> Params:
        return init_audio_encoder(rng, self.setup, self.dtype)

    def __call__(self, params, wav, wav_lens=None, ctc_pool_ranges=None, remat=False):
        return audio_encoder_forward(
            params, self.setup, wav, wav_lens, ctc_pool_ranges, remat=remat
        )
