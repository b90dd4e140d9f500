"""Eval batch assembly + belief initialization (device-resident, cached).

The reference batches all eval trajectories truncated to the common min
length, stacked on axis 1, and initializes beliefs at ground-truth state[0]
with 0.1*I covariance (reference eval_helpers.py:87-131). This module owns
that path plus the TPU-side additions: device-resident caching across the
20 stochastic repeats, DP-mesh sharding of the batch axis, repeat-tiling
for the batched-repeats fast path, and device-side blackout re-masking.
"""

from __future__ import annotations

import numpy as np

from multimodalfilter_tpu import native

from . import _eval_state as S


def put_fn(axis: int = 1):
    """device_put for eval arrays; shards `axis` over the DP mesh when one
    is configured (axis 1 for time-major (T, N, ...) batches, axis 0 for
    per-trajectory init tensors)."""
    import jax

    if S.mesh is None:
        return jax.device_put
    from jax.sharding import NamedSharding, PartitionSpec

    def put(v):
        spec = [None] * v.ndim
        spec[axis] = "data"
        return jax.device_put(v, NamedSharding(S.mesh, PartitionSpec(*spec)))

    return put


def check_batch_divisible(n_traj: int, mesh) -> None:
    """Shared DP-eval guard: the eval batch must split evenly over the
    mesh's data axis (both the trajectory batch and the init tensors)."""
    n_dev = mesh.shape["data"]
    if n_traj % n_dev != 0:
        raise ValueError(
            f"data-parallel eval needs the eval batch (N={n_traj} "
            f"trajectories) divisible by the mesh size ({n_dev}); "
            f"pass a mesh over a divisor of N (--data-parallel) or "
            f"evaluate unsharded"
        )


def get_eval_batch(tile: int = 1):
    """Load + batch eval trajectories, cached across repeated runs.

    The reference reloads everything from HDF5 on each of the 20 stochastic
    eval repeats (its blackout masks are sampled at load time). We load ONCE
    with masking disabled and re-apply the blackout on device per repeat
    (multimodalfilter_tpu.data.augment) — distributionally identical, no
    repeated host I/O."""
    blackout_ratio = S.dataset_args.get("image_blackout_ratio", 0.0)
    cache_key = tuple(sorted(S.dataset_args.items()))

    if cache_key not in S.batch_cache:
        load_args = dict(S.dataset_args)
        load_args["image_blackout_ratio"] = 0.0  # re-masked on device below
        trajectories = S.task.get_eval_trajectories(**load_args)
        assert type(trajectories) == list

        min_timesteps = min(s.shape[0] for s, o, c in trajectories)
        # Time-major (T, N, ...) batch assembly via the native host engine
        # (numpy fallback inside); bitwise np.stack([a[:t_min]], axis=1).
        states = native.stack_axis1(
            [s for s, o, c in trajectories], min_timesteps
        )
        controls = native.stack_axis1(
            [c for s, o, c in trajectories], min_timesteps
        )
        obs_keys = trajectories[0].observations.keys()
        observations = {
            k: native.stack_axis1(
                [o[k] for s, o, c in trajectories], min_timesteps
            )
            for k in obs_keys
        }
        # Keep observations/controls device-resident: run_eval_stats repeats
        # the filter 20x over the same batch, and re-uploading images through
        # the remote-TPU tunnel each repeat dominates otherwise. States stay
        # host-side (metrics are numpy). With a mesh, arrays shard over the
        # batch axis (index 1 of the (T, N, ...) layout) — GSPMD partitions
        # the filter's forward_loop from these shardings.
        if S.mesh is not None:
            check_batch_divisible(controls.shape[1], S.mesh)
        put = put_fn(axis=1)
        observations = {k: put(v) for k, v in observations.items()}
        controls = put(controls)
        S.batch_cache[cache_key] = (states, observations, controls)

    states, observations, controls = S.batch_cache[cache_key]
    if tile > 1:
        # Batched-repeats mode (eval_helpers._batched_repeat_results): the
        # clean batch repeated `tile`x along the trajectory axis,
        # repeat-major (row r*N+i = repeat r of trajectory i), cached
        # device-side.
        tiled_key = (cache_key, "tile", tile)
        if tiled_key not in S.batch_cache:
            import jax.numpy as jnp

            put = put_fn(axis=1)

            def reps(v):
                return (1, tile) + (1,) * (v.ndim - 2)

            observations = {
                k: put(jnp.tile(v, reps(v))) for k, v in observations.items()
            }
            controls = put(jnp.tile(controls, reps(controls)))
            states = np.tile(states, reps(states))
            S.batch_cache[tiled_key] = (states, observations, controls)
        states, observations, controls = S.batch_cache[tiled_key]
    if blackout_ratio > 0:
        import jax

        from multimodalfilter_tpu.data.augment import apply_image_blackout

        key = jax.random.PRNGKey(int(S.rng.integers(2**31)))
        observations = dict(observations)
        observations["image"] = apply_image_blackout(
            key, observations["image"], blackout_ratio
        )
    return states, observations, controls


def random_initialize_beliefs(states, state_dim: int) -> None:
    """The reference's random belief init (eval_helpers.py:113-131): mean =
    true initial state, covariance 0.1*I. Init tensors are cached
    device-side — repeated eval runs must not pay fresh host->device
    uploads per repeat (expensive through the tunnel)."""
    n = states.shape[1]
    init_key = ("init_tensors", n, state_dim, id(states))
    if init_key not in S.batch_cache:
        cov = np.tile(np.eye(state_dim, dtype=np.float32) * 0.1, (n, 1, 1))
        if S.mesh is not None:
            check_batch_divisible(n, S.mesh)
        put0 = put_fn(axis=0)
        S.batch_cache[init_key] = (put0(states[0]), put0(cov))
    mean0, cov = S.batch_cache[init_key]
    S.filter_model.initialize_beliefs(mean=mean0, covariance=cov)


def initialize_beliefs_for_eval(states, observations, measurement_initialize):
    """Measurement init when requested and supported, else random init
    (reference eval_helpers.py:113-131); shared by the sequential and
    batched-repeats eval paths."""
    if measurement_initialize and hasattr(
        S.filter_model.definition, "measurement_initialize_beliefs"
    ):
        S.filter_model.measurement_initialize_beliefs(
            {k: v[0] for k, v in observations.items()}
        )
        return "measurement"
    random_initialize_beliefs(states, S.filter_model.state_dim)
    return "random"
