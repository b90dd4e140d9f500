"""Eval throughput instrumentation (the reference has none — BASELINE.md).

Two figures, both produced here:
  - device-side `filter_steps_per_sec` via chained dependent forward_loops
    inside one jitted program (amortizes the ~30ms remote-TPU-tunnel RTT
    and defeats same-value execution caching — CLAUDE.md traps #2/#4);
  - the warm-up helper that keeps jit compiles out of the e2e-timed region.
"""

from __future__ import annotations

import time

import numpy as np

from . import _eval_state as S


def warm_up_loop(filter_model, obs_rest, controls_rest, batch: int) -> None:
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


def device_throughput(observations, controls, states, chain: int = 4) -> float:
    """Device-side filter throughput: `chain` dependent forward_loops inside
    ONE jitted program (the belief threads through, so none can be elided),
    timed with fresh PRNG keys and a single host scalar fetch per run.

    The chained body runs the SAME path run_eval executed: when a pipeline
    is configured (configure(pipeline_mesh=...)), the timer chains the
    pipelined loop (T padded to the stage count, exactly as
    StatefulFilter._pipelined_forward_loop pads) — the reported steps/s
    then reflects the configured stack, not the single-device scan."""
    import functools

    import jax
    import jax.numpy as jnp

    filter_model = S.filter_model
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
    if cache_key not in S.batch_cache:

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

        S.batch_cache[cache_key] = chained
    chained = S.batch_cache[cache_key]

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
