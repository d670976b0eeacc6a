"""The static-shape training batch container.

The reference's collators emit a 7-tuple with python lists of ragged tensors
(reference: trainer.py:158-166); this is its static-shape re-cut, shared by
the data layer and the jitted train/eval steps.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Batch(NamedTuple):
    wav: jnp.ndarray  # (B, N) float, right-padded
    wav_lens: jnp.ndarray  # (B,) int32
    text_ids: jnp.ndarray  # (B, T) int32 transcript tokens, BOS-stripped, right-padded
    text_lens: jnp.ndarray  # (B,) int32
    response_ids: jnp.ndarray  # (B, R) int32 LLM-response tokens, BOS-stripped
    response_lens: jnp.ndarray  # (B,) int32
    ctc_pool_ranges: Optional[jnp.ndarray] = None  # (B, G, 2) int32 or None
