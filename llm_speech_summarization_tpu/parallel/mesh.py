"""Device mesh construction + multi-host initialization.

The reference is single-GPU with no distributed backend at all
(reference: README.md:29,86; SURVEY.md §2.3). Here scaling is a first-class
axis of the design: a ("data"[, "seq"], "model") ``jax.sharding.Mesh`` whose
collectives XLA compiles onto ICI. Works identically on a real TPU slice
and on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N).

Multi-host: ``distributed_init`` wraps ``jax.distributed.initialize`` — on a
multi-host TPU slice (or a GPU/CPU cluster with an explicit coordinator) it
joins the cluster so ``jax.devices()`` returns the GLOBAL device set; mesh
construction below is then unchanged (the mesh spans hosts, XLA routes
intra-slice collectives over ICI and cross-slice over DCN). On a single
process it is a no-op, so single-chip behavior is untouched.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..configs import Config

_DISTRIBUTED_INITIALIZED = False


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host JAX cluster; returns True iff initialize() ran.

    Resolution order (idempotent — safe to call from every entry point):
      1. explicit args (tests / bespoke launchers);
      2. ``LSS_COORDINATOR`` + ``LSS_NUM_PROCESSES`` + ``LSS_PROCESS_ID``
         env vars (generic cluster launchers);
      3. TPU-pod auto-detection: on Cloud TPU multi-host slices
         ``jax.distributed.initialize()`` discovers everything from the
         metadata server — we call it bare iff ``TPU_WORKER_HOSTNAMES``-style
         env hints indicate more than one worker.
    Single-process (this environment, and the common one-chip case): no-op.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True

    env_coord = os.environ.get("LSS_COORDINATOR")
    if coordinator_address is None and env_coord:
        coordinator_address = env_coord
        if "LSS_NUM_PROCESSES" not in os.environ or "LSS_PROCESS_ID" not in os.environ:
            raise ValueError(
                "LSS_COORDINATOR is set but LSS_NUM_PROCESSES / "
                "LSS_PROCESS_ID are missing — the three variables form a "
                "set (parallel/mesh.py::distributed_init)"
            )
        num_processes = int(os.environ["LSS_NUM_PROCESSES"])
        process_id = int(os.environ["LSS_PROCESS_ID"])

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _DISTRIBUTED_INITIALIZED = True
        return True

    # TPU pod slice: the runtime publishes the worker list; >1 worker means
    # every process must join the cluster before touching the backend.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h]) > 1:
        jax.distributed.initialize()
        _DISTRIBUTED_INITIALIZED = True
        return True

    return False


def mesh_from_devices(
    data: int = -1,
    model: int = 1,
    axis_names: Optional[Sequence[str]] = None,
    devices: Optional[Sequence] = None,
    seq: int = 1,
) -> Mesh:
    """Build a ("data"[, "seq"], "model") mesh over the (global) device set.

    ``data=-1`` infers the data-parallel size from the device count. The
    "seq" axis only appears when seq > 1 (ring attention, config
    ``train.mesh.seq``), keeping existing 2-axis specs valid. Device order
    follows ``jax.devices()`` — the SAME globally-ordered list on every
    process (per-host blocks contiguous). The trailing mesh axes
    (seq/model, the chatty collectives) stay intra-host ONLY while
    model*seq divides the per-host device count — reorder with care, a
    model axis spanning hosts puts tensor-parallel collectives on DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * seq) == 0, f"{n} devices not divisible by model*seq={model * seq}"
        data = n // (model * seq)
    assert data * model * seq == n, f"mesh {data}x{seq}x{model} != {n} devices"
    if seq > 1:
        names = tuple(axis_names) if axis_names is not None else ("data", "seq", "model")
        if len(names) == 2:  # config default carries 2 names; insert "seq"
            names = (names[0], "seq", names[1])
        arr = np.asarray(devices).reshape(data, seq, model)
    else:
        names = tuple(axis_names) if axis_names is not None else ("data", "model")
        if len(names) == 3:  # 3-name config (e.g. copied from a ring
            # preset) with seq == 1: drop the unused axis name instead of
            # letting the Mesh constructor fail on a 2-D array w/ 3 names
            names = tuple(n for n in names if n != "seq")
            if len(names) != 2:
                raise ValueError(
                    f"axis_names {axis_names} needs exactly 'data'/'model' "
                    "(plus optional 'seq') for a seq=1 mesh"
                )
        arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, names)


def make_mesh(cfg: Config, devices: Optional[Sequence] = None) -> Mesh:
    m = cfg.train.mesh
    return mesh_from_devices(m.data, m.model, m.axis_names, devices, seq=m.seq)
