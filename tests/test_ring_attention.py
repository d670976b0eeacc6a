"""Ring attention == single-device attention, on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.ops.attention import (
    dot_product_attention,
    make_attention_bias,
)
from llm_speech_summarization_tpu.ops.ring_attention import ring_attention
from llm_speech_summarization_tpu.parallel.mesh import mesh_from_devices

needs_8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


@needs_8
@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_full(causal):
    B, T, Hq, Hkv, Dh = 2, 64, 4, 2, 16  # T sharded 8 ways → Tl=8
    rng = np.random.RandomState(0)
    q = rng.randn(B, T, Hq, Dh).astype(np.float32)
    k = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    v = rng.randn(B, T, Hkv, Dh).astype(np.float32)
    pads = np.array([0, 11], np.int32)

    mesh = mesh_from_devices(data=8, model=1)
    out = ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pads),
        mesh, seq_axis="data", causal=causal,
    )

    valid = np.arange(T)[None, :] >= pads[:, None]
    bias = make_attention_bias(jnp.asarray(valid), jnp.asarray(valid), causal=causal)
    ref = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias)
    diff = np.abs(np.asarray(out) - np.asarray(ref)) * valid[:, :, None, None]
    assert diff.max() < 5e-5, diff.max()


@needs_8
def test_ring_attention_sharded_inputs():
    """Works with actually device-sharded inputs (NamedSharding on T)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, T, H, Dh = 1, 64, 2, 16
    rng = np.random.RandomState(1)
    q = rng.randn(B, T, H, Dh).astype(np.float32)
    mesh = mesh_from_devices(data=8, model=1)
    spec = NamedSharding(mesh, P(None, "data", None, None))
    qd = jax.device_put(jnp.asarray(q), spec)
    kd = jax.device_put(jnp.asarray(q), spec)
    vd = jax.device_put(jnp.asarray(q), spec)
    out = ring_attention(qd, kd, vd, jnp.zeros((B,), jnp.int32), mesh, seq_axis="data")
    assert out.shape == (B, T, H, Dh)
    assert bool(jnp.isfinite(out).all())
