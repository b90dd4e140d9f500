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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host enablement: initialize the JAX distributed runtime so
    `jax.devices()` spans every host in the pod slice and the mesh helpers
    below build GLOBAL meshes (collectives ride ICI within a slice and DCN
    across slices — the GSPMD/pjit paths in this package are already
    global-mesh agnostic, so nothing else changes).

    On TPU pods the three arguments auto-detect from the metadata server;
    they are exposed for CPU/GPU fleets (or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID). Safe to call unconditionally:
    a no-op when already initialized or when single-process (no coordinator
    configured anywhere). Returns the process count.
    """
    if not jax.distributed.is_initialized():
        import os

        coordinator_address = coordinator_address or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        )
        # Only auto-detect (no explicit coordinator) on a real MULTI-HOST
        # TPU pod, and ONLY from the environment: probing the backend here
        # (e.g. jax.default_backend()) would initialize XLA first, after
        # which jax.distributed.initialize() refuses to run ("must be
        # called before any JAX computations"). The pod runtime sets
        # TPU_WORKER_HOSTNAMES to the comma-separated host list; a
        # single-entry list (incl. tunneled single-chip setups, where it is
        # "localhost") needs no distributed runtime and stays
        # single-process.
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        auto_tpu = len([h for h in hostnames.split(",") if h.strip()]) > 1
        if coordinator_address is None and not auto_tpu:
            return jax.process_count()  # single-process run; nothing to do
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count()


def create_hybrid_mesh(
    ici_shape: Sequence[int],
    dcn_shape: Sequence[int],
    axis_names: Sequence[str],
) -> Mesh:
    """Mesh for multi-slice topologies: `ici_shape` axes map onto the chips
    WITHIN a slice (fast ICI links), `dcn_shape` onto the slice axis
    (data-center network). Axis i of the mesh has size ici_shape[i] *
    dcn_shape[i]; keep cross-slice communication on pure-DP axes (gradient
    psum once per step) and tensor-ish axes (particle/pipe) at dcn=1 so
    per-timestep collectives never leave a slice.

    Degenerates to a topology-aware single-slice mesh when dcn_shape is all
    ones, so code written against it runs unchanged on one host/slice.
    """
    from jax.experimental import mesh_utils

    assert len(ici_shape) == len(dcn_shape) == len(axis_names), (
        ici_shape, dcn_shape, axis_names,
    )
    if all(d == 1 for d in dcn_shape):
        devices = mesh_utils.create_device_mesh(tuple(ici_shape))
    else:
        # The DCN granule is a TPU slice when devices expose slice_index
        # (multi-slice pods); otherwise fall back to process granularity —
        # CPU/GPU fleets (and the 2-process CPU integration test) have no
        # slice topology, so "one process = one DCN island" is the faithful
        # grouping.
        all_devices = jax.devices()
        slice_ids = {getattr(d, "slice_index", None) for d in all_devices}
        by_process = None in slice_ids or len(slice_ids) == 1
        devices = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), dcn_mesh_shape=tuple(dcn_shape),
            process_is_granule=by_process,
        )
    return Mesh(devices, tuple(axis_names))


def global_batch_from_process_local(
    mesh: Mesh, local_batch, axis_name: str = "data", axis: int = 0
):
    """Multi-host input pipeline glue: each process loads only ITS rows of
    the global batch (global_batch_size / process_count) and this assembles
    the global sharded array — no cross-host data movement, each shard is
    backed by the host that loaded it. Works unchanged single-process
    (the local batch IS the global batch). Pytrees map leaf-wise.
    """
    def one(x):
        spec = [None] * np.ndim(x)
        spec[axis] = axis_name
        sharding = NamedSharding(mesh, PartitionSpec(*spec))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(one, local_batch)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0, axis_name: str = "data"):
    """NamedSharding that splits dimension `axis` of an ndim-array over the
    data axis of the mesh."""
    spec = [None] * ndim
    spec[axis] = axis_name
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, PartitionSpec())
