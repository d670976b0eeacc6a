"""Device mesh construction.

The reference is single-GPU with no distributed backend at all
(reference: README.md:29,86; SURVEY.md §2.3). Here scaling is a first-class
axis of the design: a ("data", "model") ``jax.sharding.Mesh`` whose
collectives XLA compiles onto ICI. Works identically on a real TPU slice
and on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..configs import Config


def mesh_from_devices(
    data: int = -1,
    model: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, tuple(axis_names))


def make_mesh(cfg: Config, devices: Optional[Sequence] = None) -> Mesh:
    m = cfg.train.mesh
    return mesh_from_devices(m.data, m.model, m.axis_names, devices)
