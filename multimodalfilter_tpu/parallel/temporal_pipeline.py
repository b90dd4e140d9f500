"""Temporal pipeline parallelism: the filter's TIME axis sharded over a mesh.

The filtering recursion is sequential in time, which normally pins a whole
trajectory to one device. For long-trajectory serving (the reference's eval
runs T=800 rollouts — crossmodal/eval_helpers.py batches full-length
trajectories) the time axis still shards as a *pipeline*: device d owns
timestep chunk [d*T/P, (d+1)*T/P) and the belief carry flows d -> d+1 over
ICI via `ppermute`, GPipe-style, with the trajectory batch N split into
`num_microbatches` slices so all stages stay busy after the (P-1)-step
fill:

  - the per-step ICI payload is one microbatch belief (particles/means +
    weights/covs for N/micro trajectories) — a few KB at filter state
    dims, far below ICI bandwidth;
  - pipeline efficiency is micro/(P + micro - 1): at T=800 over 8 stages
    with micro=8 that is 8/15 ~ 53% of linear scaling, rising with micro;
  - `make_pipelined_pf_loop` additionally scan-hoists each stage's OWN obs
    chunk through the encoders (the same (T_loc*N)-batched big-matmul
    trick as the single-device forward_loop), so the dominant encoder
    FLOPs split P ways; `make_pipelined_filter_loop` is the generic
    variant for ANY FilterDef (KF fusion, unimodal KF, EKF, LSTM — every
    belief in this framework carries batch on axis 0).

PRNG semantics: the per-timestep key stream is `jax.random.split(key, T)`
sharded over the chunks — the SAME keys the single-device `forward_loop`
consumes — then folded with the microbatch index so concurrent microbatches
draw decorrelated noise (the same convention as particle_sharding.py's
per-data-row fold). Consequence (pinned by tests/test_temporal_pipeline.py):
the pipelined loop matches running the plain forward_loop on each
microbatch slice with that fold applied (bitwise on the particle path),
and with micro=1 + the fold disabled it is bitwise the plain full-batch
loop.

The schedule is reverse-mode differentiable (round 3): it runs as a
`lax.scan` over the static `num_stages + micro - 1` schedule steps with a
checkpointed body, so BPTT through a pipelined rollout works — grads match
the plain-loop grads (tests/test_temporal_pipeline.py), with activation
memory bounded at one chunk scan per schedule step (the backward
rematerializes each chunk). `train=True` selects the defs' train-mode step
semantics (e.g. the PF's no-resample path, which is the differentiable
one); `train_e2e(pipeline_mesh=...)` trains through the pipelined loop.

This is a new TPU enablement like particle sharding (SURVEY §2.5: the
reference has no distributed layer); it completes the parallelism family:
dp (batch), particle sharding (the model-parallel analog), the composed
2-D data x particle grid, pp (time), and — via `data_axis_name` on either
maker — the composed 2-D data x pipe grid (batch DP across one mesh axis,
each data shard pipelining its own time axis; per-shard key streams folded
with the data index so shards draw independent noise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from ..types import ParticleBelief


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _tree_slice_batch(tree, start, size):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, start, size, axis=0), tree
    )


def _tree_update_batch(tree, update, start):
    return jax.tree_util.tree_map(
        lambda x, u: jax.lax.dynamic_update_slice_in_dim(x, u, start, axis=0),
        tree, update,
    )


def _run_pipeline(
    axis_name, num_stages, micro, nm, belief0, run_chunk, est_template
):
    """The GPipe schedule, shared by the PF-specialized and generic loops.

    belief0: full-batch initial belief (leaves batch-major, axis 0);
    run_chunk(belief_mb, mc) -> (belief_out, est (t_loc, nm, D)).
    Returns (final_belief replicated across the axis, est_buf local chunk).
    """
    stage = jax.lax.axis_index(axis_name)
    zeros_mb = jax.tree_util.tree_map(
        lambda x: jnp.zeros((nm,) + x.shape[1:], x.dtype), belief0
    )

    def body(carry, s):
        out_belief, est_buf, final_belief = carry
        # Receive the belief the previous stage produced last step.
        perm = [(i, i + 1) for i in range(num_stages - 1)]
        received = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), out_belief
        )

        mc = s - stage
        valid = jnp.logical_and(mc >= 0, mc < micro)
        mc_c = jnp.clip(mc, 0, micro - 1)

        # Stage 0 sources microbatch mc from the initial belief.
        init_mb = _tree_slice_batch(belief0, mc_c * nm, nm)
        belief_in = _tree_where(stage == 0, init_mb, received)

        belief_out, est = run_chunk(belief_in, mc_c)

        est_buf = jnp.where(
            valid,
            jax.lax.dynamic_update_slice_in_dim(est_buf, est, mc_c * nm, axis=1),
            est_buf,
        )
        # The last stage drains completed trajectories.
        drain = jnp.logical_and(valid, stage == num_stages - 1)
        final_belief = _tree_where(
            drain, _tree_update_batch(final_belief, belief_out, mc_c * nm),
            final_belief,
        )
        return (belief_out, est_buf, final_belief), None

    carry0 = (
        zeros_mb,
        jnp.zeros_like(est_template),
        jax.tree_util.tree_map(jnp.zeros_like, belief0),
    )
    # The schedule is a lax.scan over the static num_stages+micro-1 steps —
    # NOT fori_loop — so reverse-mode AD works (pipelined BPTT). Each
    # schedule step is checkpointed: the backward pass stores only the
    # inter-step carries (microbatch beliefs) and rematerializes each
    # chunk's scan, bounding activation memory at one chunk per stage.
    (_, est_buf, final_belief), _ = jax.lax.scan(
        jax.checkpoint(body), carry0, jnp.arange(num_stages + micro - 1)
    )

    # Replicate the drained final belief (held by the last stage only).
    mask = stage == num_stages - 1
    final_belief = jax.tree_util.tree_map(
        lambda x: jax.lax.psum(jnp.where(mask, x, jnp.zeros_like(x)), axis_name),
        final_belief,
    )
    return final_belief, est_buf


def _fold_keys(keys_chunk, mc, fold: bool):
    if not fold:
        return keys_chunk
    return jax.vmap(lambda k: jax.random.fold_in(k, mc))(keys_chunk)


def _fold_keys_data_axis(keys_chunk, mesh, data_axis_name):
    """Decorrelate the per-timestep key stream across data shards (the
    particle_sharding.py convention): without this, every data shard's
    trajectories would draw the SAME dynamics/resampling noise. Skipped when
    the data axis has size 1 so a (1, P) grid stays bitwise-identical to the
    1-D pipelined loop (pinned by tests)."""
    if data_axis_name is None or mesh.shape[data_axis_name] == 1:
        return keys_chunk
    idx = jax.lax.axis_index(data_axis_name)
    return jax.vmap(lambda k: jax.random.fold_in(k, idx))(keys_chunk)


def make_pipelined_pf_loop(
    defn, mesh, axis_name: str = "pipe", num_microbatches: int = 2,
    train: bool = False, enabled=None, fold_microbatch_key: bool = True,
    data_axis_name=None, particle_axis_name=None,
):
    """Build a time-pipelined forward_loop for a ParticleFilterDef.

    Scan-hoists each stage's obs chunk through the encoders before the
    schedule (filtering/pf.py:164-207's trick), so encoder FLOPs split
    across stages. For non-PF defs use make_pipelined_filter_loop.

    Args:
      defn: ParticleFilterDef (its per-timestep body is the same
        `_step_core` the single-device loop runs — filtering/pf.py:73-142).
      mesh: Mesh containing `axis_name`; T must divide by its size.
      num_microbatches: slices of the trajectory batch N (N divisible by
        it). micro=1 degenerates to a sequential chunk relay.
      train/enabled: the same static knobs as FilterDef.forward_loop.
      fold_microbatch_key: fold each timestep key with the microbatch index
        so concurrent microbatches draw independent noise. Disable only for
        bitwise comparison against the plain full-batch loop at micro=1.
      data_axis_name: composed grid — ALSO shard the trajectory batch N
        over this mesh axis (data-parallel), with the time axis pipelined
        over `axis_name` per data shard. The per-shard key stream folds
        with the data index (the particle_sharding.py convention) so shards
        draw independent noise; a size-1 data axis is bitwise the 1-D loop.
        N must divide by data_size * num_microbatches.
      particle_axis_name: composed grid — ALSO shard the particle axis M
        over this mesh axis (massive-M x long-T serving). The per-timestep
        body becomes particle_sharding.py's sharded step (global weight
        normalize/estimate via pmax+psum, global systematic resampling in
        eval mode, the train step's global-noise-slice in train mode), so
        its collectives ride the particle axis while the belief relay rides
        the pipe axis. The relayed belief is the particle-SHARDED local
        block ((nm, M/Q, D) per cell — the ppermute payload shrinks Q-fold
        vs the unsharded pipeline). With micro=1 + fold disabled this is
        bitwise the standalone make_particle_sharded_pf_loop on the same
        particle-axis size. Composes with data_axis_name into the full 3-D
        data x pipe x particle grid.

    Returns:
      loop(params, belief, obs_seq, ctrl_seq, key) -> (final_belief,
      estimates (T, N, D)) — the defn.forward_loop contract.
    """
    num_stages = mesh.shape[axis_name]
    micro = num_microbatches
    particle_shards = (
        mesh.shape[particle_axis_name] if particle_axis_name else 1
    )

    def per_device(params, particles0, log_w0, obs_chunk, ctrl_chunk, keys_chunk):
        n, m_particles, d_state = particles0.shape
        assert n % micro == 0, (
            f"per-shard batch {n} not divisible by num_microbatches {micro}"
        )
        nm = n // micro
        t_loc = ctrl_chunk.shape[0]
        keys_chunk = _fold_keys_data_axis(keys_chunk, mesh, data_axis_name)

        # Hoisted encoder pass over this device's chunk, all N at once —
        # encoders are batch-elementwise, so slicing microbatches out of
        # the precomputed features afterwards is exact. (With a particle
        # axis this pass is replicated across the particle shards — same
        # as the standalone particle-sharded loop; at massive M the
        # per-particle trunk, not the per-frame encoder, dominates.)
        flat_obs = jax.tree_util.tree_map(
            lambda x: x.reshape((t_loc * n,) + x.shape[2:]), obs_chunk
        )
        features = defn.measurement_model.encode_observations(
            params["measurement_model"], flat_obs, enabled=enabled
        )
        features_seq = jax.tree_util.tree_map(
            lambda x: x.reshape((t_loc, n) + x.shape[1:]), features
        )

        def run_chunk(belief_in, mc):
            feats_mb = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, mc * nm, nm, axis=1),
                features_seq,
            )
            ctrl_mb = jax.lax.dynamic_slice_in_dim(ctrl_chunk, mc * nm, nm, axis=1)
            keys_mb = _fold_keys(keys_chunk, mc, fold_microbatch_key)

            if particle_axis_name is not None:
                from .particle_sharding import (
                    sharded_pf_eval_step,
                    sharded_pf_train_step,
                )

                sharded_step_fn = (
                    sharded_pf_train_step if train else sharded_pf_eval_step
                )

                def scan_step(carry, inputs):
                    features_t, ctrl_t, key_t = inputs
                    (parts, log_w), est = sharded_step_fn(
                        defn, params, tuple(carry), features_t, ctrl_t,
                        key_t, axis_name=particle_axis_name,
                        num_shards=particle_shards, enabled=enabled,
                    )
                    return ParticleBelief(parts, log_w), est

            else:

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
                scan_step, belief_in, (feats_mb, ctrl_mb, keys_mb)
            )

        belief0 = ParticleBelief(particles0, log_w0)
        est_template = jnp.zeros((t_loc, n, d_state), particles0.dtype)
        final_belief, est_buf = _run_pipeline(
            axis_name, num_stages, micro, nm, belief0, run_chunk, est_template
        )
        return est_buf, final_belief.particles, final_belief.log_weights

    replicated = PartitionSpec()
    time_spec = PartitionSpec(axis_name)
    # With a data axis the belief shards over batch (leaf axis 0) and the
    # (T, N, ...) sequences over (pipe, data); keys stay time-sharded only
    # (every data shard consumes the same stream, decorrelated by the fold).
    # With a particle axis the belief ALSO shards over M (particles leaf
    # axis 1, weights leaf axis 1); estimates are psum-replicated across it.
    particle_spec = (
        PartitionSpec(data_axis_name, particle_axis_name, None)
        if particle_axis_name is not None
        else None
    )
    batch_spec = (
        replicated if data_axis_name is None else PartitionSpec(data_axis_name)
    )
    seq_spec = (
        time_spec if data_axis_name is None
        else PartitionSpec(axis_name, data_axis_name)
    )
    particles_spec = particle_spec if particle_spec else batch_spec
    weights_spec = (
        PartitionSpec(data_axis_name, particle_axis_name)
        if particle_axis_name is not None
        else batch_spec
    )

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(replicated, particles_spec, weights_spec, seq_spec,
                  seq_spec, time_spec),
        out_specs=(seq_spec, particles_spec, weights_spec),
        check_vma=False,
    )

    @jax.jit
    def loop(params, belief, obs_seq, ctrl_seq, key):
        t = ctrl_seq.shape[0]
        assert t % num_stages == 0, (
            f"T={t} not divisible by pipeline stages {num_stages}"
        )
        if particle_axis_name is not None:
            m_global = belief.particles.shape[1]
            assert m_global % particle_shards == 0, (
                f"M={m_global} not divisible by particle shards "
                f"{particle_shards}"
            )
        # The SAME per-timestep key stream the single-device loop draws.
        keys = jax.random.split(key, t)
        est, final_p, final_w = sharded(
            params, belief.particles, belief.log_weights, obs_seq, ctrl_seq,
            keys,
        )
        return type(belief)(final_p, final_w), est

    return loop


def make_pipelined_filter_loop(
    defn, mesh, axis_name: str = "pipe", num_microbatches: int = 2,
    train: bool = False, enabled=None, fold_microbatch_key: bool = True,
    data_axis_name=None,
):
    """Generic time-pipelined forward_loop for ANY FilterDef.

    Works with every belief in this framework (GaussianBelief, per-child
    tuples, ParticleBelief, LSTM carries) — all are batch-major pytrees.
    Runs `defn.step` per timestep inside each stage's chunk; unlike the PF
    variant it does not hoist encoders out of the chunk scan (generic
    `step` takes raw observations), so for PFs prefer
    make_pipelined_pf_loop. The `enabled` knob is forwarded to fusion defs.
    `data_axis_name` composes batch-DP with the pipeline on one 2-D grid
    (see make_pipelined_pf_loop).

    Returns loop(params, belief, obs_seq, ctrl_seq, key) -> (final_belief,
    estimates (T, N, D)).
    """
    num_stages = mesh.shape[axis_name]
    micro = num_microbatches

    def per_device(params, belief0, obs_chunk, ctrl_chunk, keys_chunk):
        n = ctrl_chunk.shape[1]
        assert n % micro == 0, (
            f"per-shard batch {n} not divisible by num_microbatches {micro}"
        )
        nm = n // micro
        t_loc = ctrl_chunk.shape[0]
        keys_chunk = _fold_keys_data_axis(keys_chunk, mesh, data_axis_name)

        def run_chunk(belief_in, mc):
            obs_mb = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, mc * nm, nm, axis=1),
                obs_chunk,
            )
            ctrl_mb = jax.lax.dynamic_slice_in_dim(ctrl_chunk, mc * nm, nm, axis=1)
            keys_mb = _fold_keys(keys_chunk, mc, fold_microbatch_key)

            def scan_step(carry, inputs):
                obs_t, ctrl_t, key_t = inputs
                return defn.step(
                    params, carry, obs_t, ctrl_t, key_t, train=train,
                    enabled=enabled,
                )

            return jax.lax.scan(scan_step, belief_in, (obs_mb, ctrl_mb, keys_mb))

        est_template = jnp.zeros(
            (t_loc, n, defn.state_dim), ctrl_chunk.dtype
        )
        final_belief, est_buf = _run_pipeline(
            axis_name, num_stages, micro, nm, belief0, run_chunk, est_template
        )
        return est_buf, final_belief

    replicated = PartitionSpec()
    time_spec = PartitionSpec(axis_name)
    batch_spec = (
        replicated if data_axis_name is None else PartitionSpec(data_axis_name)
    )
    seq_spec = (
        time_spec if data_axis_name is None
        else PartitionSpec(axis_name, data_axis_name)
    )

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(replicated, batch_spec, seq_spec, seq_spec, time_spec),
        out_specs=(seq_spec, batch_spec),
        check_vma=False,
    )

    @jax.jit
    def loop(params, belief, obs_seq, ctrl_seq, key):
        t = ctrl_seq.shape[0]
        assert t % num_stages == 0, (
            f"T={t} not divisible by pipeline stages {num_stages}"
        )
        keys = jax.random.split(key, t)
        est, final_belief = sharded(params, belief, obs_seq, ctrl_seq, keys)
        return final_belief, est

    return loop
