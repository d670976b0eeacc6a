"""Audio-embedding downsampling ops (the projector's pooling stage).

Reference behaviors reimplemented batched + static-shape:
  * avg_pool_time   — nn.AvgPool1d(kernel=8, stride=4) over time
                      (reference: model/audio_encoder.py:34-42,59-63)
  * stack_downsample — concat `factor` adjacent frames
                      (reference: model/audio_encoder.py:43-47,65-70; fixes
                      the reference's crash when N % factor == 0 and its
                      hard-coded batch size 1)
  * ctc_segment_mean — mean over (start, end) frame ranges from CTC word
                      offsets (reference: model/audio_encoder.py:48-52,72-82;
                      the reference loops per range in Python with bs=1 —
                      here it is one MXU matmul over the whole batch)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool_time(x: jnp.ndarray, kernel_size: int, stride: int) -> jnp.ndarray:
    """Average-pool over the time axis. x: (B, N, D) → (B, (N-k)//s + 1, D).

    Matches torch.nn.AvgPool1d with no padding (windows always full, so
    count_include_pad is moot).
    """
    B, N, D = x.shape
    out_len = (N - kernel_size) // stride + 1
    # cumsum formulation: window sums are two gathers on a prefix sum —
    # differentiable, fuses well, and avoids reduce_window autodiff limits.
    cs = jnp.cumsum(x.astype(jnp.float32), axis=1)
    cs = jnp.pad(cs, ((0, 0), (1, 0), (0, 0)))
    starts = jnp.arange(out_len, dtype=jnp.int32) * stride
    summed = cs[:, starts + kernel_size, :] - cs[:, starts, :]
    return (summed / kernel_size).astype(x.dtype)


def stack_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Concatenate `factor` adjacent frames. x: (B, N, D) → (B, N//factor, factor*D).

    Crops the trailing N % factor frames. (The reference computed
    ``x[:, :-to_crop]`` which yields an empty tensor when to_crop == 0,
    reference: model/audio_encoder.py:67-68 — fixed here.)
    """
    B, N, D = x.shape
    n_keep = (N // factor) * factor
    return x[:, :n_keep, :].reshape(B, N // factor, factor * D)


def ctc_segment_mean(
    x: jnp.ndarray, pool_ranges: jnp.ndarray, range_valid: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean-pool frames over per-sample (start, end) ranges, vectorized.

    x:           (B, N, D) encoder frames.
    pool_ranges: (B, G, 2) int32 [start, end) frame ranges, right-padded.
    range_valid: (B, G) bool — which ranges are real. Defaults to end > start.

    Returns (pooled, valid): pooled (B, G, D) with zeros at invalid ranges,
    and the validity mask. Implemented as a dense (B, G, N) membership matrix
    contracted with x on the MXU: for 20 s audio (N ≤ 1000, G ≤ ~256) the
    membership matmul is tiny next to the encoder itself and maps perfectly
    onto the systolic array, unlike the reference's per-range Python loop
    (reference: model/audio_encoder.py:76-82). Empty ranges (start == end)
    produce zeros rather than the reference's NaNs.
    """
    B, N, _ = x.shape
    starts = pool_ranges[..., 0]  # (B, G)
    ends = pool_ranges[..., 1]
    if range_valid is None:
        range_valid = ends > starts
    # a range starting past the frame extent is NOT a real embedding:
    # truncated audio (collate clips wav to its bucket but ranges were
    # computed on the full clip) must not inject phantom all-zero prompt
    # positions that emb_lens then counts as attended
    range_valid = range_valid & (starts < N)
    t = jnp.arange(N, dtype=jnp.int32)  # (N,)
    member = (t[None, None, :] >= starts[..., None]) & (t[None, None, :] < ends[..., None])
    member = member & range_valid[..., None]
    counts = jnp.maximum(jnp.sum(member, axis=-1), 1)  # (B, G)
    weights = member.astype(x.dtype) / counts[..., None].astype(x.dtype)
    pooled = jnp.einsum(
        "bgn,bnd->bgd",
        weights,
        x,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )
    return pooled.astype(x.dtype), range_valid
