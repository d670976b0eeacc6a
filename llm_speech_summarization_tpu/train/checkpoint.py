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
    base_dir: str, step: int, epoch: int, state: Any, block: bool = True
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

    With ``mesh``, every restored leaf is re-placed for mesh execution:
    leaves whose template carries a NamedSharding (e.g. ZeRO-1 Adam moments
    over "data") keep it; everything else is replicated over the mesh.
    Without this, Orbax hands back arrays COMMITTED to a single device,
    which conflicts with mesh-sharded leaves inside the next jitted train
    step ("incompatible devices for jitted computation" — found by
    tests/test_ckpt_mesh.py)."""
    import numpy as np

    ckptr = ocp.StandardCheckpointer()
    target = {
        "enc_params": template.enc_params,
        "opt_state": template.opt_state,
        "step": np.zeros((), np.int32),
        "epoch": np.zeros((), np.int32),
    }
    restored = ckptr.restore(path, target)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())

        def _place(t, r):
            if hasattr(t, "sharding") and isinstance(t.sharding, NamedSharding):
                return jax.device_put(r, t.sharding)
            return jax.device_put(r, rep)

        for key in ("enc_params", "opt_state"):
            restored[key] = jax.tree_util.tree_map(
                _place, getattr(template, key), restored[key]
            )
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
