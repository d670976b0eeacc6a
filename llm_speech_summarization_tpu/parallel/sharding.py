"""Sharding rules: parameter PartitionSpecs + batch sharding.

No reference counterpart (single GPU, SURVEY.md §2.3). Strategy:

  * LLM (the 3B frozen teacher/student backbone) is tensor-parallel over the
    "model" axis: attention qkv/out and MLP up/gate/down are sharded on the
    head/ffn dimension (Megatron layout — one all-reduce per block, inserted
    by XLA), embeddings sharded on vocab;
  * the trainable audio encoder (~0.3B) is replicated — its gradients
    all-reduce over "data" automatically;
  * batches are sharded on the leading (batch) axis over "data".

Works with plain ``jax.jit``: inputs carry NamedShardings, XLA propagates.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def llama_param_spec(params: Any) -> Any:
    """PartitionSpec pytree for init_llama_params output.

    Also covers the serving-layout trees (models/llama.py
    ``fuse_llama_params`` / ``quantize_llama_params``): fused ``wqkv`` /
    ``w_gateup`` shard on the fused out-feature axis, and int8 ``*_scale``
    vectors shard along the same axis as the weight dimension they scale
    (out-features for the column-parallel mats, replicated for the
    row-parallel ones whose out dim is the replicated D).

    KNOWN CAVEAT (fused layouts × TP, multi-chip efficiency): contiguous
    sharding of the fused out axis crosses the static Q|K|V (gate|up)
    split boundaries — e.g. Hq=24, Hkv=8, Dh=128, tp=8 puts shard edges
    every 640 columns while the Q|K splits sit at 3072/4096 — so GSPMD
    inserts reshards at llama.py's post-matmul slices instead of the
    Megatron zero-comm split, and the resulting K/V shards need
    realignment against the head-sharded slot cache. Token-correct
    (tests/test_serve_mesh.py::test_tp_quantized_fused_params_shard_and_
    generate) but not collective-minimal; for peak TP decode on real
    multi-chip hardware serve the UNFUSED layout (skip fuse_llama_params)
    or add a per-shard-interleaved fused column order. Unmeasurable in
    this single-chip environment — recorded rather than guessed at."""

    def spec_for(path: str, x) -> P:
        nd = getattr(x, "ndim", 0)
        if "embed_tokens_scale" in path:
            return P("model")  # per-vocab-row, follows the vocab shard
        if "embed_tokens" in path:
            return P("model", None)
        if "lm_head_scale" in path:
            return P("model")  # per-vocab-column
        if "lm_head" in path:
            return P(None, "model")
        if any(k in path for k in ("wqkv", "wq", "wk", "wv", "w_gateup", "w_gate", "w_up")):
            # column-parallel: weight (L, Din, Dout) / int8 scale (L, Dout)
            return P(None, None, "model") if nd == 3 else P(None, "model")
        if any(k in path for k in ("wo", "w_down")):
            # row-parallel: weight (L, Din, Dout=D); scale (L, D) replicated
            return P(None, "model", None) if nd == 3 else P()
        return P()  # norms etc. replicated

    return jax.tree_util.tree_map_with_path(
        lambda kp, x: spec_for(jax.tree_util.keystr(kp), x), params
    )


def encoder_param_spec(params: Any) -> Any:
    """Audio-encoder params: replicated (small next to the LLM)."""
    return jax.tree_util.tree_map(lambda x: P(), params)


def opt_state_spec(opt_state: Any, mesh: Mesh, min_size: int = 16384) -> Any:
    """ZeRO-1 sharding for the optimizer state (SURVEY.md §2.3 ZeRO row).

    Encoder params are replicated, but their Adam moments (2× the f32
    master size — the encoder's HBM term that caps the per-chip train
    batch, PERF.md) need not be: every moment tensor whose leading dim
    divides by the "data" axis is split there; tiny/odd leaves and scalar
    counts stay replicated. XLA inserts the reshard on update — one
    scatter/gather per step, the classic ZeRO-1 trade.
    """
    n = mesh.shape["data"]

    def spec_for(x) -> P:
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[0] % n == 0 and int(np.prod(shape)) >= min_size:
            return P("data")
        return P()

    return jax.tree_util.tree_map(spec_for, opt_state)


def slot_state_spec(state: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for a serving ``SlotState`` (infer/slots.py).

    The KV cache — the dominant serving-memory term — shards on its KV-head
    axis over "model", matching the TP layout of the attention weights
    (``llama_param_spec``): each model-shard holds exactly the cache heads
    its wk/wv shards produce, so decode attention runs with ZERO cache
    collectives (the per-block all-reduce after wo is the only comm, as in
    training TP). Works for the dense cache (k/v: (L, N, Hkv, S, Dh)) and
    the page-major paged pools ((L, P, Hkv, ps, Dh)) — the head axis is 2
    in both layouts. When
    the head count does not divide the axis, everything stays replicated —
    still correct, just memory-replicated. All scalar slot state (tokens,
    budgets, flags) is replicated: it is tiny and the host reads it.
    """
    tp = dict(mesh.shape).get("model", 1)
    replicated = jax.tree_util.tree_map(lambda x: P(), state)
    cache = state.cache
    paged = hasattr(cache, "page_table")
    h_axis = 2
    kv = cache.k_pool if paged else cache.k
    if tp <= 1 or kv.shape[h_axis] % tp != 0:
        return replicated

    def vspec(x):
        s = [None] * x.ndim
        s[h_axis] = "model"
        return P(*s)

    fields = ("k_pool", "v_pool") if paged else ("k", "v")
    updates = {f: vspec(getattr(cache, f)) for f in fields}
    for f in ("k_scale", "v_scale"):
        if getattr(cache, f) is not None:
            updates[f] = vspec(getattr(cache, f))
    return replicated._replace(cache=replicated.cache._replace(**updates))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def pad_batch_rows(batch: Any, multiple: int) -> Any:
    """Pad a tail batch's leading axis up to a multiple of the "data" axis.

    Padded rows replicate row 0 (valid audio/text, so every compute path
    sees well-formed data) but get ``response_lens = 0``: the splice then
    emits an all-False loss/response mask for them, and every loss is a
    masked mean with an empty-window guard (ops/losses.py) — so padded rows
    contribute exactly zero loss and zero gradient. This keeps the tail
    batch on the SAME sharded placement/program as full batches instead of
    silently switching to a replicated layout (round-2 behavior).
    """
    B = batch.wav.shape[0]
    target = -(-B // multiple) * multiple
    if target == B:
        return batch
    reps = target - B

    def pad(x):
        x = np.asarray(x)
        return np.concatenate([x, np.repeat(x[:1], reps, axis=0)], axis=0)

    padded = jax.tree_util.tree_map(pad, batch)
    resp_lens = np.asarray(padded.response_lens).copy()
    resp_lens[B:] = 0
    return padded._replace(response_lens=resp_lens)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard every leaf on its leading (batch) axis over "data".

    Multi-host: each process passes its LOCAL batch slice (the Trainer's
    loader shards the index space per process) and the leaves assemble
    into one global jax.Array via ``make_array_from_process_local_data``
    — a plain device_put of host-local data cannot address the other
    hosts' shards of a global mesh."""
    multi = jax.process_count() > 1

    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multi and getattr(x, "ndim", 0) >= 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
