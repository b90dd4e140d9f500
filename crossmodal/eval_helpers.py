"""Evaluation helpers.

Behavior parity with the reference ``crossmodal/eval_helpers.py``:
  - batch all eval trajectories, truncated to the common min length, stacked
    on axis 1 (:87-111)
  - beliefs initialized at ground-truth state[0] with 0.1*I covariance, or
    via measurement initialization (:113-131)
  - one jitted forward_loop over the full sequence (:133-142)
  - RMSE with the first 30 steps truncated, de-normalized with the dataset's
    hardcoded stddevs, converted to degrees/cm (:148-216) — identical metric
    names and constants
  - run_eval_stats: mean/std over 20 repeated (stochastic) runs (:41-67)

Adds the throughput instrumentation the reference lacks (BASELINE.md):
run_eval returns two figures —
  - `filter_steps_per_sec`: device-side throughput, measured by chaining
    dependent forward_loops inside one jitted program (the bench.py pattern;
    amortizes dispatch/tunnel latency). Disable the extra measurement with
    MMF_TPU_EVAL_DEVICE_THROUGHPUT=0 (it then falls back to the e2e figure).
  - `filter_steps_per_sec_e2e`: wall-clock for one forward_loop INCLUDING the
    device->host fetch of the estimates — honest end-to-end latency, but
    through a remote-TPU tunnel the fetch RTT dominates, so it is not a
    device throughput number.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import numpy as np

from multimodalfilter_tpu import native
from multimodalfilter_tpu.experiments import Buddy
from multimodalfilter_tpu.utils import to_numpy

from . import tasks

# Module globals, set by configure() (reference eval_helpers.py:10-29).
buddy: Buddy
filter_model = None
task = None
dataset_args: Dict = {}
mesh = None

_eval_batch_cache = {}


def configure(*, buddy: Buddy, task, dataset_args: Dict, mesh=None,
              pipeline_mesh=None, pipeline_microbatches=None):
    """`mesh` optionally shards eval trajectory batches data-parallel over a
    jax.sharding.Mesh (the eval batch axis N is the natural DP axis; GSPMD
    partitions the jitted forward_loop from the input shardings alone).

    `pipeline_mesh` instead routes the filter rollout through temporal
    pipeline parallelism (the TIME axis sharded over the mesh's "pipe"
    axis, belief relayed stage->stage — parallel/temporal_pipeline.py);
    T is padded to the stage count internally. Mutually exclusive with
    `mesh` (batch-DP) — to COMBINE batch-DP with pipelining, pass a 2-D
    ("data", "pipe") mesh as `pipeline_mesh` (the composed data x pipe
    grid; N shards over "data", each shard pipelines its own time axis).
    `pipeline_microbatches=None` auto-sizes from the eval batch (largest
    divisor of the per-data-shard N up to 8 — GPipe efficiency rises
    with micro)."""
    assert issubclass(task, tasks.Task)
    assert mesh is None or pipeline_mesh is None, (
        "mesh (batch-DP) and pipeline_mesh (time-pipeline) are exclusive"
    )
    globals()["buddy"] = buddy
    globals()["filter_model"] = buddy.model
    globals()["task"] = task
    globals()["dataset_args"] = dataset_args
    globals()["mesh"] = mesh
    buddy.model.use_pipeline(
        pipeline_mesh, num_microbatches=pipeline_microbatches
    )
    _eval_batch_cache.clear()


def log_eval(measurement_initialize=False) -> None:
    """Evaluate, print, and log metrics."""
    results = run_eval(measurement_initialize)
    with buddy.log_scope("eval"):
        for key, value in results.items():
            if type(value) == float:
                buddy.log_scalar(key, value)


def run_eval_stats(*eval_args, repeats: int = 20, **eval_kwargs) -> Dict[str, float]:
    """The reference's 20-repeat stochastic eval table
    (/root/reference/crossmodal/eval_helpers.py:219-243); `repeats`
    parameterizes the count for dry-runs (scripts/parity_rehearsal.py)."""
    batched = (
        os.environ.get("MMF_TPU_EVAL_BATCH_REPEATS", "0") == "1"
        and not eval_args
        and not eval_kwargs.get("eval_dynamics", False)
    )
    if batched:
        all_results = _batched_repeat_results(
            repeats,
            measurement_initialize=eval_kwargs.get(
                "measurement_initialize", False
            ),
        )
    else:
        all_results: Dict[str, List[float]] = {}
        for _ in range(repeats):
            results = run_eval(*eval_args, **eval_kwargs)
            results.pop("raw_rmse")
            for k, v in results.items():
                assert isinstance(v, float)
                all_results.setdefault(k, []).append(v)

    results_stats = {}
    for k, v in all_results.items():
        results_stats[f"{k}_mean"] = float(np.array(v).mean())
        results_stats[f"{k}_std"] = float(np.array(v).std())
    for k, v in results_stats.items():
        print(f"{k}: {v}")
    return results_stats


_eval_rng = np.random.default_rng(0)


def _put_fn(axis: int = 1):
    """device_put for eval arrays; shards `axis` over the DP mesh when one
    is configured (axis 1 for time-major (T, N, ...) batches, axis 0 for
    per-trajectory init tensors)."""
    import jax

    if mesh is None:
        return jax.device_put
    from jax.sharding import NamedSharding, PartitionSpec

    def put(v):
        spec = [None] * v.ndim
        spec[axis] = "data"
        return jax.device_put(v, NamedSharding(mesh, PartitionSpec(*spec)))

    return put


def _check_batch_divisible(n_traj: int, mesh) -> None:
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


def _burn_in_truncation(t: int) -> int:
    """Steps excluded from RMSE at the front of a T-step rollout.

    Reference truncation (eval_helpers.py:148-163): the first 30 steps are
    filter burn-in. Real eval trajectories are hundreds of steps; synthetic
    smoke evals can be shorter than 31, which would leave an EMPTY metric
    slice (RMSE = NaN from a mean over zero elements) — fall back to
    truncating the first half so short-T smoke runs stay meaningful.
    Real-length evals are unaffected. Single source of truth for both the
    sequential and the batched-repeats eval paths."""
    return 30 if (t - 1) > 30 else (t - 1) // 2


def _warm_up_loop(filter_model, obs_rest, controls_rest, batch: int) -> None:
    """One discarded forward_loop rollout, run only if this (filter, mode,
    pipeline-config, batch) tuple is not yet compiled — excludes jit compile
    and fresh-buffer registration from the timed run that follows.
    loop_cache_key() resolves to "pipeloop" when a pipeline is configured,
    so pipelined repeats don't double-roll. The belief is restored so the
    timed run regenerates the same trajectory."""
    warm_key = filter_model.loop_cache_key(batch=batch)
    if warm_key not in filter_model._fn_cache:
        saved_belief = filter_model.belief
        np.asarray(
            filter_model.forward_loop(
                observations=obs_rest, controls=controls_rest
            )
        )
        filter_model.belief = saved_belief


def _get_eval_batch(tile: int = 1):
    """Load + batch eval trajectories, cached across repeated runs.

    The reference reloads everything from HDF5 on each of the 20 stochastic
    eval repeats (its blackout masks are sampled at load time). We load ONCE
    with masking disabled and re-apply the blackout on device per repeat
    (multimodalfilter_tpu.data.augment) — distributionally identical, no
    repeated host I/O."""
    blackout_ratio = dataset_args.get("image_blackout_ratio", 0.0)
    cache_key = tuple(sorted(dataset_args.items()))

    if cache_key not in _eval_batch_cache:
        load_args = dict(dataset_args)
        load_args["image_blackout_ratio"] = 0.0  # re-masked on device below
        trajectories = task.get_eval_trajectories(**load_args)
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
        if mesh is not None:
            _check_batch_divisible(controls.shape[1], mesh)
        put = _put_fn(axis=1)
        observations = {k: put(v) for k, v in observations.items()}
        controls = put(controls)
        _eval_batch_cache[cache_key] = (states, observations, controls)

    states, observations, controls = _eval_batch_cache[cache_key]
    if tile > 1:
        # Batched-repeats mode (_batched_repeat_results): the clean batch
        # repeated `tile`x along the trajectory axis, repeat-major
        # (row r*N+i = repeat r of trajectory i), cached device-side.
        tiled_key = (cache_key, "tile", tile)
        if tiled_key not in _eval_batch_cache:
            import jax.numpy as jnp

            put = _put_fn(axis=1)

            def reps(v):
                return (1, tile) + (1,) * (v.ndim - 2)

            observations = {
                k: put(jnp.tile(v, reps(v))) for k, v in observations.items()
            }
            controls = put(jnp.tile(controls, reps(controls)))
            states = np.tile(states, reps(states))
            _eval_batch_cache[tiled_key] = (states, observations, controls)
        states, observations, controls = _eval_batch_cache[tiled_key]
    if blackout_ratio > 0:
        import jax

        from multimodalfilter_tpu.data.augment import apply_image_blackout

        key = jax.random.PRNGKey(int(_eval_rng.integers(2**31)))
        observations = dict(observations)
        observations["image"] = apply_image_blackout(
            key, observations["image"], blackout_ratio
        )
    return states, observations, controls


def _random_initialize_beliefs(states, state_dim: int) -> None:
    """The reference's random belief init (eval_helpers.py:113-131): mean =
    true initial state, covariance 0.1*I. Init tensors are cached
    device-side — repeated eval runs must not pay fresh host->device
    uploads per repeat (expensive through the tunnel)."""
    n = states.shape[1]
    init_key = ("init_tensors", n, state_dim, id(states))
    if init_key not in _eval_batch_cache:
        cov = np.tile(np.eye(state_dim, dtype=np.float32) * 0.1, (n, 1, 1))
        if mesh is not None:
            _check_batch_divisible(n, mesh)
        put0 = _put_fn(axis=0)
        _eval_batch_cache[init_key] = (put0(states[0]), put0(cov))
    mean0, cov = _eval_batch_cache[init_key]
    filter_model.initialize_beliefs(mean=mean0, covariance=cov)


def _batched_repeat_results(
    repeats: int, measurement_initialize: bool = False
) -> Dict[str, List[float]]:
    """Fast path for run_eval_stats (opt-in: MMF_TPU_EVAL_BATCH_REPEATS=1):
    fold the stochastic repeats into the batch axis instead of rolling out
    sequentially. The reference's N=16 eval leaves the chip ~16x
    under-filled (saturation is near N=256 — docs/PERFORMANCE.md), so
    batching R repeats into one (T, N*R) rollout buys most of that factor
    in eval wall time.

    Statistically identical to the sequential path — each repeat slice
    draws independent filter noise (per-batch-row draws) and independent
    blackout masks (applied after tiling) — but not bitwise the sequential
    key stream. Per-repeat RMSE comes from slicing the batch back apart, so
    the returned mean/std are computed over the same per-repeat statistics
    the sequential path produces. Device throughput is still measured at
    the ORIGINAL batch size (that is the config the persisted number
    describes); the e2e figure is the measured batched wall time.

    The per-rollout repeat count is capped so N*R stays at or below the
    chip's saturation batch (MMF_TPU_EVAL_BATCH_REPEATS_CAP, default 256) —
    beyond it there is no throughput left to win, only memory to lose."""
    states0, obs0, ctrl0 = _get_eval_batch()
    t, n = states0.shape[:2]
    state_dim = filter_model.state_dim
    cap = int(os.environ.get("MMF_TPU_EVAL_BATCH_REPEATS_CAP", "256"))
    rc = max(1, min(repeats, max(1, cap // n)))
    while repeats % rc:  # equal-size chunks: one compiled (T, N*rc) program
        rc -= 1
    chunks = repeats // rc
    print(
        f"[eval] batched repeats: {repeats} = {chunks} rollout(s) x {rc} "
        f"repeats (batch {n} -> {n * rc})"
    )
    filter_model.eval()

    raw_rmse_rows: List[np.ndarray] = []
    e2e_steps, e2e_time = 0, 0.0
    for _ in range(chunks):
        states, observations, controls = _get_eval_batch(tile=rc)
        nb = n * rc
        if measurement_initialize and hasattr(
            filter_model.definition, "measurement_initialize_beliefs"
        ):
            filter_model.measurement_initialize_beliefs(
                {k: v[0] for k, v in observations.items()}
            )
        else:
            _random_initialize_beliefs(states, state_dim)
        obs_rest = {k: v[1:] for k, v in observations.items()}
        _warm_up_loop(filter_model, obs_rest, controls[1:], batch=nb)
        start = time.perf_counter()
        predicted = np.asarray(
            filter_model.forward_loop(
                observations=obs_rest, controls=controls[1:]
            )
        )
        e2e_time += time.perf_counter() - start
        e2e_steps += (t - 1) * nb
        assert predicted.shape == (t - 1, nb, state_dim)
        true_states = states[1:]
        trunc = _burn_in_truncation(t)
        per_batch_mse = np.mean(
            (predicted[trunc:] - true_states[trunc:]) ** 2, axis=0
        )
        # Repeat-major tiling: row r*N + i is repeat r of trajectory i.
        per_repeat_mse = per_batch_mse.reshape(rc, n, state_dim).mean(axis=1)
        raw_rmse_rows.extend(np.sqrt(per_repeat_mse))

    e2e_sps = float(e2e_steps / e2e_time) if e2e_time > 0 else 0.0
    device_sps = e2e_sps
    if os.environ.get("MMF_TPU_EVAL_DEVICE_THROUGHPUT", "1") == "1":
        try:
            # The stored belief is the TILED (N*rc) one from the rollouts
            # above; the chained timer runs at the ORIGINAL batch (the
            # config the persisted number describes), so re-init first.
            if measurement_initialize and hasattr(
                filter_model.definition, "measurement_initialize_beliefs"
            ):
                filter_model.measurement_initialize_beliefs(
                    {k: v[0] for k, v in obs0.items()}
                )
            else:
                _random_initialize_beliefs(states0, state_dim)
            device_sps = _device_throughput(obs0, ctrl0, states0)
        except Exception as exc:  # pragma: no cover - measurement best-effort
            print(f"(device throughput measurement failed: {exc})")

    all_results: Dict[str, List[float]] = {}
    for raw_rmse in raw_rmse_rows:
        results = _metric_results(raw_rmse, device_sps, e2e_sps, verbose=False)
        results.pop("raw_rmse")
        for k, v in results.items():
            all_results.setdefault(k, []).append(v)
    return all_results


def _device_throughput(observations, controls, states, chain: int = 4) -> float:
    """Device-side filter throughput: `chain` dependent forward_loops inside
    ONE jitted program (the belief threads through, so none can be elided),
    timed with fresh PRNG keys and a single host scalar fetch per run. This
    amortizes the per-dispatch tunnel RTT and defeats the runtime's
    value-caching of identical executions (CLAUDE.md traps #2/#4).

    The chained body runs the SAME path run_eval executed: when a pipeline
    is configured (configure(pipeline_mesh=...)), the timer chains the
    pipelined loop (T padded to the stage count, exactly as
    StatefulFilter._pipelined_forward_loop pads) — the reported steps/s
    then reflects the configured stack, not the single-device scan."""
    import functools

    import jax
    import jax.numpy as jnp

    defn = filter_model.definition
    enabled = filter_model._enabled_tuple
    t, n = states.shape[:2]
    obs_rest = {k: v[1:] for k, v in observations.items()}
    ctrl_rest = controls[1:]
    belief = filter_model.belief

    pipeline = filter_model._pipeline
    if pipeline is not None:
        # Pad T-1 to the stage count once, outside the timed chain, via the
        # SAME helper _pipelined_forward_loop uses; the useful-step count
        # below stays (t-1)*n, so padding overhead is billed — the same
        # overhead real pipelined eval pays.
        from multimodalfilter_tpu.filtering.wrappers import pad_time_to_stages

        mesh, axis_name = pipeline[0], pipeline[1]
        obs_rest, ctrl_rest = pad_time_to_stages(
            obs_rest, ctrl_rest, mesh.shape[axis_name]
        )
        pipe_fn = filter_model._get_pipeline_fn(batch=n)

        def loop_fn(params, b, obs, ctrl, key):
            return pipe_fn(params, b, obs, ctrl, key)

    else:

        def loop_fn(params, b, obs, ctrl, key):
            return defn.forward_loop(
                params, b, obs, ctrl, key, train=False, enabled=enabled
            )

    cache_key = ("chained_loop", filter_model.loop_cache_key(batch=n), t, n)
    if cache_key not in _eval_batch_cache:

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(params, belief, obs, ctrl, key, reps: int):
            def body(carry, i):
                b, acc = carry
                # Per-rep i*1e-12 perturbation: numerically a no-op (below
                # fp32 eps for normalized data) but keeps the inputs
                # loop-variant so XLA cannot hoist the batched encoder pass
                # out of the chain — otherwise the reported steps/s would be
                # ~2-4x above true fresh-data throughput (see bench.py).
                eps = i.astype(jnp.float32) * 1e-12
                obs_i = jax.tree_util.tree_map(lambda v: v + eps, obs)
                nb, est = loop_fn(
                    params, b, obs_i, ctrl + eps, jax.random.fold_in(key, i)
                )
                return (nb, acc + est.sum()), None

            (_, acc), _ = jax.lax.scan(
                body, (belief, jnp.float32(0)), jnp.arange(reps)
            )
            return acc

        _eval_batch_cache[cache_key] = chained
    chained = _eval_batch_cache[cache_key]

    args = (filter_model.params, belief, obs_rest, ctrl_rest)
    float(chained(*args, jax.random.PRNGKey(997), chain))  # compile
    float(chained(*args, jax.random.PRNGKey(998), chain))  # transfers settled
    times = []
    for i in range(3):
        k = jax.random.PRNGKey(1000 + i)
        t0 = time.perf_counter()
        float(chained(*args, k, chain))
        times.append(time.perf_counter() - t0)
    return float((t - 1) * n * chain / min(times))


def run_eval(measurement_initialize=False, eval_dynamics=False) -> Dict[str, float]:
    """Evaluate the configured filter; print + return metrics."""
    states, observations, controls = _get_eval_batch()
    t, n = states.shape[:2]
    state_dim = filter_model.state_dim

    filter_model.eval()

    # --- Initialize beliefs (eval_helpers.py:113-131) ---
    # Init tensors are cached device-side: repeated eval runs must not pay
    # fresh host->device uploads per repeat (expensive through the tunnel).
    if measurement_initialize and hasattr(
        filter_model.definition, "measurement_initialize_beliefs"
    ):
        print("initialize with measurement")
        filter_model.measurement_initialize_beliefs(
            {k: v[0] for k, v in observations.items()}
        )
    else:
        print("init with random")
        _random_initialize_beliefs(states, state_dim)

    # --- Run the filter (timed; jit warm-up excluded via a pre-run) ---
    if eval_dynamics:
        defn = filter_model.definition.dynamics_model
        import jax

        from multimodalfilter_tpu.utils.pytree import get_by_path

        dyn_params = get_by_path(filter_model.params, "dynamics_model")
        loop = jax.jit(defn.forward_loop)
        predicted_states, _ = loop(dyn_params, states[0], controls[1:])
        np.asarray(predicted_states)  # warm-up (host fetch forces completion)
        start = time.perf_counter()
        predicted_states, _ = loop(dyn_params, states[0], controls[1:])
        predicted_states = np.asarray(predicted_states)
        elapsed = time.perf_counter() - start
    else:
        obs_rest = {k: v[1:] for k, v in observations.items()}
        _warm_up_loop(filter_model, obs_rest, controls[1:], batch=n)
        start = time.perf_counter()
        predicted_states = filter_model.forward_loop(
            observations=obs_rest, controls=controls[1:]
        )
        # np.asarray forces completion (block_until_ready is unreliable
        # through the remote-TPU tunnel); the timed region therefore includes
        # one device->host transfer of the estimates.
        predicted_states = np.asarray(predicted_states)
        elapsed = time.perf_counter() - start

    assert predicted_states.shape == (t - 1, n, state_dim)
    # End-to-end figure: the timed region above necessarily includes one
    # device->host fetch of the estimates, which through a remote-TPU tunnel
    # (~30ms RTT) can dominate — so it's labeled `_e2e`, and the device-side
    # `filter_steps_per_sec` is measured separately below by chaining
    # dependent loops inside one program (the bench.py pattern).
    filter_steps_per_sec_e2e = float((t - 1) * n / elapsed)
    filter_steps_per_sec = filter_steps_per_sec_e2e
    if not eval_dynamics and os.environ.get(
        "MMF_TPU_EVAL_DEVICE_THROUGHPUT", "1"
    ) == "1":
        try:
            filter_steps_per_sec = _device_throughput(
                observations, controls, states
            )
        except Exception as exc:  # pragma: no cover - measurement best-effort
            print(f"(device throughput measurement failed: {exc})")

    # --- RMSE (eval_helpers.py:148-163) ---
    true_states = states[1:]
    start_truncation = _burn_in_truncation(t)
    per_batch_mse = np.mean(
        to_numpy(predicted_states[start_truncation:] - true_states[start_truncation:])
        ** 2,
        axis=0,
    )
    assert per_batch_mse.shape == (n, state_dim)
    raw_rmse = np.sqrt(np.mean(per_batch_mse, axis=0))
    return _metric_results(
        raw_rmse, filter_steps_per_sec, filter_steps_per_sec_e2e
    )


def _metric_results(
    raw_rmse, filter_steps_per_sec, filter_steps_per_sec_e2e, verbose=True
) -> Dict[str, float]:
    """Task-specific de-normalized metric dict from a (state_dim,) raw RMSE
    (reference eval_helpers.py:165-216); shared by run_eval and the
    batched-repeats path."""
    if task is tasks.DoorTask:
        rmse = raw_rmse * np.array([0.39479038, 0.05650279, 0.0565098])
        results = {
            "raw_rmse": [float(x) for x in raw_rmse],
            "theta_rmse_deg": float(rmse[0] * 180.0 / np.pi),
            "x_rmse_cm": float(rmse[1] * 100.0),
            "y_rmse_cm": float(rmse[2] * 100.0),
            "filter_steps_per_sec": filter_steps_per_sec,
            "filter_steps_per_sec_e2e": filter_steps_per_sec_e2e,
        }
        if verbose:
            print()
            print("-----")
            print(f"Raw RMSE:   {results['raw_rmse']}")
            print("-----")
            print(f"Theta RMSE: {results['theta_rmse_deg']:.8f} degrees")
            print(f"X RMSE:     {results['x_rmse_cm']:.8f} cm")
            print(f"Y RMSE:     {results['y_rmse_cm']:.8f} cm")
            print(
                f"Throughput: {filter_steps_per_sec:.1f} filter-steps/sec "
                f"(device), {filter_steps_per_sec_e2e:.1f} e2e incl. host fetch"
            )
            print("-----")
    elif task is tasks.PushTask:
        # NOTE(reference eval_helpers.py:193-195): these constants are the
        # MuJoCo stddevs; slightly off for the kloss dataset (the reference
        # corrects in post-processing) — replicated as-is.
        rmse = raw_rmse * np.array([0.0572766, 0.06118315])
        results = {
            "raw_rmse": [float(x) for x in raw_rmse],
            "x_rmse_cm": float(rmse[0] * 100.0),
            "y_rmse_cm": float(rmse[1] * 100.0),
            "filter_steps_per_sec": filter_steps_per_sec,
            "filter_steps_per_sec_e2e": filter_steps_per_sec_e2e,
        }
        if verbose:
            print()
            print("-----")
            print(f"Raw RMSE:   {results['raw_rmse']}")
            print("-----")
            print(f"X RMSE:     {results['x_rmse_cm']:.8f} cm")
            print(f"Y RMSE:     {results['y_rmse_cm']:.8f} cm")
            print(
                f"Throughput: {filter_steps_per_sec:.1f} filter-steps/sec "
                f"(device), {filter_steps_per_sec_e2e:.1f} e2e incl. host fetch"
            )
            print("-----")
    else:
        assert False, "Invalid task!"

    return results
