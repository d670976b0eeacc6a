"""Checkpoint save/restore with mesh-sharded state (ZeRO-1 + TP).

The reference resumes single-GPU torch checkpoints by manually re-homing
optimizer tensors (reference: trainer.py:116-132). Here training state can be
sharded over a mesh (ZeRO-1 Adam moments over "data",
parallel/sharding.py::opt_state_spec); a save → restore → continue cycle must
(a) round-trip the values exactly, (b) land restored leaves back on their
sharded placement, and (c) continue training to the same result as an
uninterrupted run. No prior test covered checkpointing on a mesh.
"""

import os

import jax
import numpy as np
import pytest

from llm_speech_summarization_tpu.parallel import (
    llama_param_spec,
    mesh_from_devices,
    shard_batch,
    shard_params,
)
from llm_speech_summarization_tpu.parallel.sharding import opt_state_spec
from llm_speech_summarization_tpu.train import make_train_state, make_train_step
from llm_speech_summarization_tpu.train import checkpoint as ckpt

from test_parallel import _setup, _total_len

needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@needs_8_devices
def test_mesh_sharded_checkpoint_resume_parity(tmp_path):
    (cfg, tok, prefix, suffix, llm_cfg, llm_params, enc_setup, enc_params, batch) = _setup(8)
    total_len = _total_len(cfg, enc_setup, enc_params, batch, prefix, suffix)

    mesh = mesh_from_devices(data=4, model=2)
    with mesh:
        llm_sh = shard_params(mesh, llm_params, llama_param_spec(llm_params))
        batch_sh = shard_batch(mesh, batch)
        state0, tx = make_train_state(cfg, enc_params, total_opt_steps=10)
        spec = opt_state_spec(state0.opt_state, mesh)
        state0 = state0._replace(
            opt_state=shard_params(mesh, state0.opt_state, spec)
        )
        step = make_train_step(
            cfg, enc_setup, llm_cfg, tx, prefix, suffix, total_len, donate=False
        )

        # uninterrupted: two steps
        s1, _ = step(state0, llm_sh, batch_sh)
        s2_ref, ref_metrics = step(s1, llm_sh, batch_sh)

        # interrupted: save after step 1, restore into a FRESH sharded
        # template (as Trainer.load_checkpoint does with self.state)
        path = ckpt.save_train_checkpoint(str(tmp_path / "ck"), 1, 0, s1)
        fresh, _ = make_train_state(cfg, enc_params, total_opt_steps=10)
        fresh = fresh._replace(
            opt_state=shard_params(mesh, fresh.opt_state, spec)
        )
        restored, rstep, repoch = ckpt.restore_train_checkpoint(path, fresh, mesh=mesh)
        assert (rstep, repoch) == (1, 0)

        # (b) restored moments keep the template's sharded placement
        ref_leaves = jax.tree_util.tree_leaves(fresh.opt_state)
        got_leaves = jax.tree_util.tree_leaves(restored["opt_state"])
        assert len(ref_leaves) == len(got_leaves)
        resharded = 0
        for a, b in zip(ref_leaves, got_leaves):
            if hasattr(a, "sharding") and hasattr(b, "sharding"):
                assert b.sharding.is_equivalent_to(a.sharding, a.ndim), (
                    a.sharding, b.sharding)
                if not a.sharding.is_fully_replicated:
                    resharded += 1
        assert resharded > 0, "no sharded leaf restored (ZeRO-1 spec inert?)"

        # (a) exact value round-trip
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.opt_state),
            jax.tree_util.tree_leaves(restored["opt_state"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.enc_params),
            jax.tree_util.tree_leaves(restored["enc_params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # (c) continue from the restore == uninterrupted second step
        s_resume = fresh._replace(
            enc_params=restored["enc_params"], opt_state=restored["opt_state"]
        )
        s2, metrics = step(s_resume, llm_sh, batch_sh)

    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(ref_metrics["total_loss"]),
        rtol=1e-6, atol=1e-7,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s2_ref.enc_params),
        jax.tree_util.tree_leaves(s2.enc_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


@needs_8_devices
def test_encoder_export_roundtrip_on_mesh(tmp_path):
    """Encoder-only export (the inference format) round-trips from a mesh
    context too (reference two-format split: inference.py:24-27)."""
    (cfg, tok, prefix, suffix, llm_cfg, llm_params, enc_setup, enc_params, batch) = _setup(4)
    mesh = mesh_from_devices(data=8, model=1)
    with mesh:
        path = ckpt.export_encoder(str(tmp_path / "enc"), enc_params)
        back = ckpt.load_encoder(path, jax.tree_util.tree_map(np.zeros_like, enc_params))
    for a, b in zip(
        jax.tree_util.tree_leaves(enc_params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
