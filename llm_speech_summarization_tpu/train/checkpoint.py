"""Checkpointing via Orbax.

The reference torch.saves a dict {audio_encoder, optimizer, lr_scheduler,
epoch, step} at every validation (reference: trainer.py:516-528), resumes by
manually re-homing optimizer tensors to the GPU (reference:
trainer.py:116-132), and separately releases encoder-only raw state_dicts
consumed by inference (reference: inference.py:24-27, README.md:41-45).

Here both formats exist with Orbax:
  * training checkpoints: {enc_params, opt_state, step, epoch} under
    ``<dir>/step_<n>`` with automatic latest-resume — device placement is
    handled by Orbax/jax, no manual re-homing;
  * encoder-only export: ``export_encoder`` / ``load_encoder`` for the
    inference engine (the reference's two-format split, preserved).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(base: str) -> str:
    return os.path.abspath(base)


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def save_train_checkpoint(
    base_dir: str, step: int, epoch: int, state: Any, block: bool = True,
    epoch_step: int = 0,
) -> str:
    """``block=False`` schedules the save on Orbax's async machinery and
    returns once the arrays are snapshotted — training overlaps the
    serialization/IO (the production default for periodic saves; the
    reference's torch.save stalls the loop, reference: trainer.py:516-528).
    The next async save waits for the previous one; call
    ``finalize_saves()`` (the Trainer does, on every exit path) before
    relying on the files."""
    global _ASYNC_CKPTR
    path = os.path.join(_ckpt_dir(base_dir), f"step_{step}")
    # step/epoch stay HOST numpy scalars: a device jnp scalar is a
    # single-device host-local jax.Array, which Orbax refuses to serialize
    # under jax.process_count() > 1 (found by tests/test_multihost.py)
    import numpy as np

    payload = {
        "enc_params": state.enc_params,
        "opt_state": state.opt_state,
        "step": np.asarray(step, np.int32),
        "epoch": np.asarray(epoch, np.int32),
        # batches already consumed inside `epoch`: resume fast-forwards the
        # (deterministically seeded) epoch iterator past them, so a resumed
        # run continues the EXACT batch sequence of an unbroken one
        # (tests/test_multihost.py asserts bit-identical continuation).
        # The reference replays the interrupted epoch from its start
        # (reference: trainer.py:113-132 restores only step/epoch).
        "epoch_step": np.asarray(epoch_step, np.int32),
    }
    if block:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
    else:
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        _ASYNC_CKPTR.wait_until_finished()  # one in-flight save at a time
        _ASYNC_CKPTR.save(path, args=ocp.args.StandardSave(payload), force=True)
    return path


def finalize_saves() -> None:
    """Block until any in-flight async checkpoint save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def latest_checkpoint(base_dir: str) -> Optional[str]:
    base = _ckpt_dir(base_dir)
    if not os.path.isdir(base):
        return None
    steps = []
    for name in os.listdir(base):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(base, f"step_{max(steps)}")


def restore_train_checkpoint(
    path: str, template: Any, mesh: Any = None
) -> Tuple[Any, int, int]:
    """Restore (state-like payload, step, epoch); `template` provides the
    pytree structure/shapes (an abstract or concrete state).

    With ``mesh``, every leaf restores DIRECTLY into its mesh placement:
    the restore target is abstract (ShapeDtypeStruct + sharding) — leaves
    whose template carries a NamedSharding (e.g. ZeRO-1 Adam moments over
    "data") keep it; everything else restores replicated. Orbax then hands
    back GLOBAL arrays with each process reading its own shard from disk —
    this is what makes multi-process restore work at all (a host-local
    restore followed by device_put needs a cross-host transfer the CPU
    backend refuses — found by tests/test_multihost.py), and it also fixes
    the single-process mesh conflict ("incompatible devices for jitted
    computation" — tests/test_ckpt_mesh.py)."""
    import numpy as np

    ckptr = ocp.StandardCheckpointer()
    target = {
        "enc_params": template.enc_params,
        "opt_state": template.opt_state,
        "step": np.zeros((), np.int32),
        "epoch": np.zeros((), np.int32),
        "epoch_step": np.zeros((), np.int32),
    }
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())

        def _abstract(t):
            sh = (
                t.sharding
                if hasattr(t, "sharding") and isinstance(t.sharding, NamedSharding)
                else rep
            )
            return jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=sh)

        for key in ("enc_params", "opt_state"):
            target[key] = jax.tree_util.tree_map(_abstract, target[key])
    try:
        restored = ckptr.restore(path, target)
    except Exception:
        # legacy checkpoint without epoch_step: resume replays the
        # interrupted epoch from its start (the old behavior)
        target.pop("epoch_step")
        restored = ckptr.restore(path, target)
        restored["epoch_step"] = np.zeros((), np.int32)
    return restored, int(restored["step"]), int(restored["epoch"])


def export_encoder(path: str, enc_params: Any) -> str:
    """Encoder-only export for inference (reference: inference.py:24-27)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"enc_params": enc_params}, force=True)
    ckptr.wait_until_finished()
    return path


def load_encoder(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), {"enc_params": template})
    return restored["enc_params"]
