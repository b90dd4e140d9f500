"""Particle-axis sharding: the PF's M axis distributed over a mesh axis.

For this workload data parallelism over the batch N is the primary strategy
(SURVEY §2.5), but the particle axis is the natural *model-parallel* analog:
at large M (massive-particle smoothing / serving fleets) a single chip's HBM
and FLOPs bound M, and M shards cleanly:

  - dynamics propagation and per-particle measurement trunks are local
    (embarrassingly parallel over M);
  - the weight normalization is a global logsumexp: pmax + psum over the
    particle axis (two scalar-ish ICI collectives per step);
  - the weighted-mean estimate is a psum;
  - systematic resampling is global: shards exchange weight-mass offsets and
    all_gather the (M, D) particle matrix — tiny for state_dim<=3 — then each
    shard gathers only its own M/P output slots.

Built with shard_map + explicit collectives; statistically identical to the
single-device systematic-resampling path (same stratified positions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec


def sharded_pf_eval_step(
    defn, params, belief, features_t, ctrl_t, key_t, *, axis_name,
    num_shards, enabled=None,
):
    """One particle-sharded PF EVAL timestep (must run inside shard_map).

    belief = (particles (N, Mp, D), log_w (N, Mp)) with log_w normalized
    GLOBALLY (logsumexp over all `axis_name` shards == 0). Dynamics noise
    is decorrelated per shard (key fold with the shard index); the weight
    normalize/estimate are global (pmax + psum); resampling is global
    systematic with shard weight-mass offsets + all_gather, each shard
    producing its own Mp output slots. Shared by the standalone
    `make_particle_sharded_pf_loop` and the pipelined composition
    (temporal_pipeline.make_pipelined_pf_loop(particle_axis_name=...)).

    Returns ((particles, log_w), estimate (N, D) replicated across the
    particle axis)."""
    particles, log_w = belief
    my_shard = jax.lax.axis_index(axis_name)
    n, mp, d = particles.shape
    m_global = mp * num_shards
    k_noise, k_resample = jax.random.split(key_t)
    # Decorrelate dynamics noise across shards.
    k_noise = jax.random.fold_in(k_noise, my_shard)

    # --- local dynamics propagation ---
    flat = particles.reshape(n * mp, d)
    ctrl_rep = jnp.repeat(ctrl_t, mp, axis=0)
    pred, tril = defn.dynamics_model.apply(
        params["dynamics_model"], flat, ctrl_rep
    )
    eps = jax.random.normal(k_noise, pred.shape, pred.dtype)
    particles = (pred + jnp.einsum("bij,bj->bi", tril, eps)).reshape(
        n, mp, d
    )

    # --- local log-liks + GLOBAL normalize (pmax + psum) ---
    log_liks = defn.measurement_model.log_likelihoods_from_features(
        params["measurement_model"], particles, features_t, enabled=enabled
    )
    log_w = log_w + log_liks
    w_max = jax.lax.pmax(jnp.max(log_w, axis=1), axis_name)  # (N,)
    exp_w = jnp.exp(log_w - w_max[:, None])
    total = jax.lax.psum(jnp.sum(exp_w, axis=1), axis_name)  # (N,)
    log_w = log_w - w_max[:, None] - jnp.log(total)[:, None]
    probs = jnp.exp(log_w)

    # --- estimate: psum of local weighted sums ---
    estimate = jax.lax.psum(
        jnp.einsum("nm,nmd->nd", probs, particles), axis_name
    )

    # --- global systematic resampling ---
    # Shard weight-mass offsets: mass of all lower shards.
    local_mass = jnp.sum(probs, axis=1)  # (N,)
    masses = jax.lax.all_gather(local_mass, axis_name)  # (P, N)
    offset = jnp.sum(
        jnp.where(
            (jnp.arange(num_shards) < my_shard)[:, None], masses, 0.0
        ),
        axis=0,
    )  # (N,)
    local_cdf = jnp.cumsum(probs, axis=1) + offset[:, None]

    # Everyone needs all source particles for the gather; (M, D) is
    # tiny at filter state dims.
    all_particles = jax.lax.all_gather(
        particles, axis_name, axis=1, tiled=True
    )  # (N, M_global, D)
    all_cdf = jax.lax.all_gather(
        local_cdf, axis_name, axis=1, tiled=True
    )  # (N, M_global) — monotone by construction
    all_cdf = all_cdf / all_cdf[:, -1:]

    # Stratified positions; identical u0 on every shard, each shard
    # produces its own Mp output slots.
    u0 = jax.random.uniform(k_resample, (n, 1))
    slots = my_shard * mp + jnp.arange(mp)[None, :]
    positions = (u0 + slots) / m_global
    idx = jax.vmap(jnp.searchsorted)(all_cdf, positions)
    idx = jnp.clip(idx, 0, m_global - 1)
    particles = jnp.take_along_axis(all_particles, idx[:, :, None], axis=1)
    log_w = jnp.full((n, mp), -jnp.log(float(m_global)))
    return (particles, log_w), estimate


def sharded_pf_train_step(
    defn, params, belief, features_t, ctrl_t, key_t, *, axis_name,
    num_shards, enabled=None,
):
    """One particle-sharded PF TRAIN timestep (must run inside shard_map).

    Train-mode PF has no resampling (gradients flow through the weight
    recursion), so M-sharding is a pure execution transform: local
    dynamics + trunks, one pmax + two psum on the particle axis. The
    dynamics noise is SLICED FROM THE GLOBAL key stream, so outputs and
    parameter grads match ``defn.forward_loop(train=True)`` up to fp
    reassociation. Shared by `make_particle_sharded_pf_train_loop` and the
    pipelined composition.

    Returns ((particles, log_w), estimate (N, D))."""
    particles, log_w = belief
    my_shard = jax.lax.axis_index(axis_name)
    n, mp, d = particles.shape
    m_global = mp * num_shards
    k_noise, _ = jax.random.split(key_t)

    # --- local dynamics propagation, GLOBAL noise stream sliced ---
    flat = particles.reshape(n * mp, d)
    ctrl_rep = jnp.repeat(ctrl_t, mp, axis=0)
    pred, tril = defn.dynamics_model.apply(
        params["dynamics_model"], flat, ctrl_rep
    )
    eps_global = jax.random.normal(k_noise, (n, m_global, d), pred.dtype)
    eps = jax.lax.dynamic_slice_in_dim(
        eps_global, my_shard * mp, mp, axis=1
    ).reshape(n * mp, d)
    particles = (pred + jnp.einsum("bij,bj->bi", tril, eps)).reshape(
        n, mp, d
    )

    # --- local log-liks + GLOBAL normalize + estimate ---
    log_liks = defn.measurement_model.log_likelihoods_from_features(
        params["measurement_model"], particles, features_t, enabled=enabled
    )
    log_w = log_w + log_liks
    # The global max is a pure numerical stabilizer — the normalized
    # result is invariant to it, so its gradient contribution cancels
    # exactly. stop_gradient makes that structural (jax has no transpose
    # rule for pmax; this is the standard logsumexp treatment, same as
    # jax.scipy.special.logsumexp's own max).
    w_max = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.max(log_w, axis=1)), axis_name
    )  # (N,)
    exp_w = jnp.exp(log_w - w_max[:, None])
    total = jax.lax.psum(jnp.sum(exp_w, axis=1), axis_name)
    log_w = log_w - w_max[:, None] - jnp.log(total)[:, None]
    estimate = jax.lax.psum(
        jnp.einsum("nm,nmd->nd", jnp.exp(log_w), particles), axis_name
    )
    # No resampling: train-mode BPTT keeps the weight recursion.
    return (particles, log_w), estimate


def make_particle_sharded_pf_loop(
    defn, mesh, axis_name: str = "particle", data_axis_name: str = None
):
    """Build a forward_loop over a particle-sharded belief.

    Args:
      defn: a ParticleFilterDef (its dynamics/measurement defs are reused).
      mesh: Mesh with `axis_name`; M must divide by its size. If
        `data_axis_name` is given the mesh is 2-D (data x particle): the
        batch N additionally shards over the data axis (N divisible by its
        size), the per-step collectives (pmax/psum/all_gather) stay on the
        particle axis only, and each data row of the mesh filters its own
        trajectory slice — DP eval and massive-M sharding composed on one
        device grid.

    Returns:
      loop(params, belief, obs_seq, ctrl_seq, key) -> (belief, estimates)
      where belief.particles is (N, M, D) globally (sharded over M, and
      over N too in the 2-D case).
    """
    num_shards = mesh.shape[axis_name]

    def per_device_loop(params, particles, log_weights, obs_seq, ctrl_seq, key):
        """Runs on each shard: particles (N, Mp, D); log_weights (N, Mp)
        normalized GLOBALLY (logsumexp over all shards == 0)."""
        if data_axis_name is not None:
            # Decorrelate the whole per-shard key stream across data rows:
            # each row holds different trajectories, so strata and noise
            # must be independent (matching what a per-row single-mesh run
            # would draw from its own fold).
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis_name))
        n, _, _ = particles.shape

        t = jax.tree_util.tree_leaves(ctrl_seq)[0].shape[0]
        flat_obs = jax.tree_util.tree_map(
            lambda x: x.reshape((t * n,) + x.shape[2:]), obs_seq
        )
        features = defn.measurement_model.encode_observations(
            params["measurement_model"], flat_obs
        )
        features_seq = jax.tree_util.tree_map(
            lambda x: x.reshape((t, n) + x.shape[1:]), features
        )
        keys = jax.random.split(key, t)

        def step(carry, inputs):
            features_t, ctrl_t, key_t = inputs
            return sharded_pf_eval_step(
                defn, params, carry, features_t, ctrl_t, key_t,
                axis_name=axis_name, num_shards=num_shards,
            )

        (particles, log_w), estimates = jax.lax.scan(
            step, (particles, log_weights), (features_seq, ctrl_seq, keys)
        )
        return particles, log_w, estimates

    batch_axis = data_axis_name  # None -> batch replicated (1-D mesh)
    particle_spec = PartitionSpec(batch_axis, axis_name, None)
    weight_spec = PartitionSpec(batch_axis, axis_name)
    replicated = PartitionSpec()
    # Sequences are time-major (T, N, ...): shard N in the 2-D case.
    seq_spec = PartitionSpec(None, batch_axis) if batch_axis else replicated
    est_spec = PartitionSpec(None, batch_axis) if batch_axis else replicated

    sharded = jax.shard_map(
        per_device_loop,
        mesh=mesh,
        in_specs=(replicated, particle_spec, weight_spec, seq_spec,
                  seq_spec, replicated),
        out_specs=(particle_spec, weight_spec, est_spec),
        check_vma=False,
    )

    @jax.jit
    def loop(params, belief, obs_seq, ctrl_seq, key):
        particles, log_w, estimates = sharded(
            params, belief.particles, belief.log_weights, obs_seq, ctrl_seq, key
        )
        return type(belief)(particles, log_w), estimates

    return loop


def make_particle_sharded_pf_train_loop(
    defn, mesh, axis_name: str = "particle", data_axis_name: str = None,
    enabled=None,
):
    """Differentiable (BPTT-capable) particle-sharded PF loop — massive-M
    TRAINING, the gradient story the eval loop above deliberately lacks.

    Train-mode PF semantics have no resampling (torchfilter's
    ``resample=None`` default — gradients flow through the weights), which
    makes M-sharding a *pure execution transform*: per step the shards run
    local dynamics + measurement trunks and meet only at one pmax + two
    psum on the particle axis (global weight normalize + estimate), all of
    which reverse-mode differentiates (psum/pmax transposes are
    collectives themselves). The dynamics noise is SLICED FROM THE GLOBAL
    key stream (each shard generates the full (N, M, D) normal draw and
    takes its slice — counter-based PRNG, so this is cheap and exactly the
    single-device draw), so outputs AND parameter gradients match
    ``defn.forward_loop(train=True)`` up to fp reassociation
    (tests/test_particle_sharding.py pins this).

    With ``data_axis_name`` the mesh is 2-D (data x particle) and the batch
    axis shards too — note the per-row key fold then decorrelates noise
    from the single-mesh run (statistical, not bitwise, equivalence).

    Returns loop(params, belief, obs_seq, ctrl_seq, key) ->
    (final_belief, estimates (T, N, D)); differentiable in params/belief.
    """
    num_shards = mesh.shape[axis_name]

    def per_device_loop(params, particles, log_weights, obs_seq, ctrl_seq, key):
        if data_axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis_name))
        n, _, _ = particles.shape

        t = jax.tree_util.tree_leaves(ctrl_seq)[0].shape[0]
        flat_obs = jax.tree_util.tree_map(
            lambda x: x.reshape((t * n,) + x.shape[2:]), obs_seq
        )
        features = defn.measurement_model.encode_observations(
            params["measurement_model"], flat_obs, enabled=enabled
        )
        features_seq = jax.tree_util.tree_map(
            lambda x: x.reshape((t, n) + x.shape[1:]), features
        )
        keys = jax.random.split(key, t)

        def step(carry, inputs):
            features_t, ctrl_t, key_t = inputs
            return sharded_pf_train_step(
                defn, params, carry, features_t, ctrl_t, key_t,
                axis_name=axis_name, num_shards=num_shards, enabled=enabled,
            )

        (particles, log_w), estimates = jax.lax.scan(
            step, (particles, log_weights), (features_seq, ctrl_seq, keys)
        )
        return particles, log_w, estimates

    batch_axis = data_axis_name
    particle_spec = PartitionSpec(batch_axis, axis_name, None)
    weight_spec = PartitionSpec(batch_axis, axis_name)
    replicated = PartitionSpec()
    seq_spec = PartitionSpec(None, batch_axis) if batch_axis else replicated
    est_spec = PartitionSpec(None, batch_axis) if batch_axis else replicated

    sharded = jax.shard_map(
        per_device_loop,
        mesh=mesh,
        in_specs=(replicated, particle_spec, weight_spec, seq_spec,
                  seq_spec, replicated),
        out_specs=(particle_spec, weight_spec, est_spec),
        check_vma=False,
    )

    @jax.jit
    def loop(params, belief, obs_seq, ctrl_seq, key):
        particles, log_w, estimates = sharded(
            params, belief.particles, belief.log_weights, obs_seq, ctrl_seq, key
        )
        return type(belief)(particles, log_w), estimates

    return loop
