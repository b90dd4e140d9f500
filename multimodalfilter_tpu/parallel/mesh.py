"""Device mesh helpers.

The reference is single-device (SURVEY §2.5 — no distributed layer exists);
parallelism here is *new* TPU enablement: the trajectory-batch axis N shards
over a 1-D "data" mesh (the natural data-parallel axis for both training
batches and eval trajectory batches), and the particle axis M stays on-chip
(vmap/reshape). XLA inserts the ICI collectives from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def create_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Mesh over the first n devices: 1-D by default, or an explicit grid —
    e.g. ``create_mesh(8, ("data", "particle"), shape=(2, 4))`` for composed
    DP x particle sharding."""
    devices = jax.devices()
    if shape is not None:
        assert len(shape) == len(axis_names), (shape, axis_names)
        want = int(np.prod(shape))
        assert n_devices is None or n_devices == want, (n_devices, shape)
        n_devices = want
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"create_mesh({n_devices}) but only {len(devices)} "
                f"{devices[0].platform} device(s) are visible. For a virtual "
                "CPU mesh set XLA_FLAGS=--xla_force_host_platform_device_count"
                f"={n_devices} and jax.config.update('jax_platforms', 'cpu') "
                "BEFORE any backend is initialized (see tests/conftest.py)."
            )
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(tuple(shape)), axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0, axis_name: str = "data"):
    """NamedSharding that splits dimension `axis` of an ndim-array over the
    data axis of the mesh."""
    spec = [None] * ndim
    spec[axis] = axis_name
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, PartitionSpec())
