"""Temporal pipeline parallelism: the filter's TIME axis sharded over a mesh.

The filtering recursion is sequential in time, which normally pins a whole
trajectory to one device. For long-trajectory serving (the reference's eval
runs T=800 rollouts — crossmodal/eval_helpers.py batches full-length
trajectories) the time axis still shards as a *pipeline*: device d owns
timestep chunk [d*T/P, (d+1)*T/P) and the belief carry flows d -> d+1 over
ICI via `ppermute`, GPipe-style, with the trajectory batch N split into
`num_microbatches` slices so all stages stay busy after the (P-1)-step
fill:

  - each device scan-hoists its OWN obs chunk's encoder pass (the same
    (T_loc*N)-batched big-matmul trick as the single-device forward_loop),
    so encoder FLOPs split P ways;
  - the per-step ICI payload is one microbatch belief
    (N/micro x M x state_dim particles + log-weights) — a few KB at filter
    state dims, far below ICI bandwidth;
  - pipeline efficiency is micro/(P + micro - 1): at T=800 over 8 stages
    with micro=8 that is 8/15 ~ 53% of linear scaling, rising with micro.

PRNG semantics: the per-timestep key stream is `jax.random.split(key, T)`
sharded over the chunks — the SAME keys the single-device `forward_loop`
consumes — then folded with the microbatch index so concurrent microbatches
draw decorrelated noise (the same convention as particle_sharding.py's
per-data-row fold). Consequence (pinned by tests/test_temporal_pipeline.py):
the pipelined loop is BITWISE-identical to running the plain forward_loop
on each microbatch slice with that fold applied, and with micro=1 + the
fold disabled it is bitwise-identical to the plain full-batch loop.

This is a new TPU enablement like particle sharding (SURVEY §2.5: the
reference has no distributed layer); it completes the parallelism family:
dp (batch), particle sharding (the model-parallel analog), the composed
2-D data x particle grid, and now pp (time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from ..types import ParticleBelief


def make_pipelined_pf_loop(
    defn, mesh, axis_name: str = "pipe", num_microbatches: int = 2,
    train: bool = False, enabled=None, fold_microbatch_key: bool = True,
):
    """Build a time-pipelined forward_loop for a ParticleFilterDef.

    Args:
      defn: ParticleFilterDef (its dynamics/measurement defs are reused;
        the per-timestep body is the same `_step_core` the single-device
        loop runs — filtering/pf.py:73-142).
      mesh: Mesh containing `axis_name`; T must divide by its size.
      num_microbatches: slices of the trajectory batch N (N divisible by
        it). micro=1 degenerates to a sequential chunk relay; larger micro
        fills the pipeline.
      train/enabled: the same static knobs as FilterDef.forward_loop.
      fold_microbatch_key: fold each timestep key with the microbatch index
        so concurrent microbatches draw independent noise. Disable only for
        bitwise comparison against the plain full-batch loop at micro=1.

    Returns:
      loop(params, belief, obs_seq, ctrl_seq, key) -> (final_belief,
      estimates (T, N, D)) — the defn.forward_loop contract.
    """
    num_stages = mesh.shape[axis_name]
    micro = num_microbatches

    def per_device(params, particles0, log_w0, obs_chunk, ctrl_chunk, keys_chunk):
        """obs/ctrl/keys are sharded over T (this device sees T/P steps);
        the initial belief is replicated (only stage 0 reads it)."""
        stage = jax.lax.axis_index(axis_name)
        n, m_particles, d_state = particles0.shape
        assert n % micro == 0, (
            f"batch {n} not divisible by num_microbatches {micro}"
        )
        nm = n // micro
        t_loc = ctrl_chunk.shape[0]

        # Hoisted encoder pass over this device's chunk, all N at once —
        # encoders are batch-elementwise, so slicing microbatches out of
        # the precomputed features afterwards is exact.
        flat_obs = jax.tree_util.tree_map(
            lambda x: x.reshape((t_loc * n,) + x.shape[2:]), obs_chunk
        )
        features = defn.measurement_model.encode_observations(
            params["measurement_model"], flat_obs, enabled=enabled
        )
        features_seq = jax.tree_util.tree_map(
            lambda x: x.reshape((t_loc, n) + x.shape[1:]), features
        )

        def run_chunk(bel_p, bel_w, mc):
            """This device's t_loc timesteps for microbatch mc — the same
            scan body as ParticleFilterDef.forward_loop."""
            feats_mb = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, mc * nm, nm, axis=1),
                features_seq,
            )
            ctrl_mb = jax.lax.dynamic_slice_in_dim(ctrl_chunk, mc * nm, nm, axis=1)
            if fold_microbatch_key:
                keys_mb = jax.vmap(lambda k: jax.random.fold_in(k, mc))(
                    keys_chunk
                )
            else:
                keys_mb = keys_chunk

            def scan_step(carry, inputs):
                features_t, ctrl_t, key_t = inputs

                def log_lik_fn(parts):
                    return defn.measurement_model.log_likelihoods_from_features(
                        params["measurement_model"], parts, features_t,
                        enabled=enabled,
                    )

                return defn._step_core(
                    params, carry, log_lik_fn, ctrl_t, key_t, train=train
                )

            return jax.lax.scan(
                scan_step, ParticleBelief(bel_p, bel_w),
                (feats_mb, ctrl_mb, keys_mb),
            )

        def body(s, carry):
            out_p, out_w, est_buf, final_p, final_w = carry
            # Receive the belief the previous stage produced last step.
            perm = [(i, i + 1) for i in range(num_stages - 1)]
            recv_p = jax.lax.ppermute(out_p, axis_name, perm)
            recv_w = jax.lax.ppermute(out_w, axis_name, perm)

            mc = s - stage
            valid = jnp.logical_and(mc >= 0, mc < micro)
            mc_c = jnp.clip(mc, 0, micro - 1)

            # Stage 0 sources microbatch mc from the initial belief.
            init_p = jax.lax.dynamic_slice_in_dim(particles0, mc_c * nm, nm, axis=0)
            init_w = jax.lax.dynamic_slice_in_dim(log_w0, mc_c * nm, nm, axis=0)
            is_first = stage == 0
            bel_p = jnp.where(is_first, init_p, recv_p)
            bel_w = jnp.where(is_first, init_w, recv_w)

            belief_out, est = run_chunk(bel_p, bel_w, mc_c)

            est_buf = jnp.where(
                valid,
                jax.lax.dynamic_update_slice_in_dim(
                    est_buf, est, mc_c * nm, axis=1
                ),
                est_buf,
            )
            # The last stage drains completed trajectories.
            drain = jnp.logical_and(valid, stage == num_stages - 1)
            final_p = jnp.where(
                drain,
                jax.lax.dynamic_update_slice_in_dim(
                    final_p, belief_out.particles, mc_c * nm, axis=0
                ),
                final_p,
            )
            final_w = jnp.where(
                drain,
                jax.lax.dynamic_update_slice_in_dim(
                    final_w, belief_out.log_weights, mc_c * nm, axis=0
                ),
                final_w,
            )
            return (belief_out.particles, belief_out.log_weights,
                    est_buf, final_p, final_w)

        carry0 = (
            jnp.zeros((nm, m_particles, d_state), particles0.dtype),
            jnp.zeros((nm, m_particles), log_w0.dtype),
            jnp.zeros((t_loc, n, d_state), particles0.dtype),
            jnp.zeros_like(particles0),
            jnp.zeros_like(log_w0),
        )
        _, _, est_buf, final_p, final_w = jax.lax.fori_loop(
            0, num_stages + micro - 1, body, carry0
        )

        # Replicate the drained final belief (held by the last stage only).
        mask = (stage == num_stages - 1).astype(particles0.dtype)
        final_p = jax.lax.psum(final_p * mask, axis_name)
        final_w = jax.lax.psum(final_w * mask, axis_name)
        return est_buf, final_p, final_w

    replicated = PartitionSpec()
    time_spec = PartitionSpec(axis_name)

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(replicated, replicated, replicated, time_spec, time_spec,
                  time_spec),
        out_specs=(time_spec, replicated, replicated),
        check_vma=False,
    )

    @jax.jit
    def loop(params, belief, obs_seq, ctrl_seq, key):
        t = ctrl_seq.shape[0]
        assert t % num_stages == 0, (
            f"T={t} not divisible by pipeline stages {num_stages}"
        )
        # The SAME per-timestep key stream the single-device loop draws.
        keys = jax.random.split(key, t)
        est, final_p, final_w = sharded(
            params, belief.particles, belief.log_weights, obs_seq, ctrl_seq,
            keys,
        )
        return type(belief)(final_p, final_w), est

    return loop
