"""Particle-axis sharding: the PF loop with M sharded over 8 devices must
track the linear-Gaussian oracle as well as the single-device filter."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfilter_tpu.parallel.mesh import create_mesh
from multimodalfilter_tpu.parallel.particle_sharding import (
    make_particle_sharded_pf_loop,
)

import sys

sys.path.insert(0, "tests")
from test_filter_core import (  # noqa: E402
    OBS_SPEC,
    STATE_DIM,
    CONTROL_DIM,
    _GaussianMeasurementNet,
    _LinearDynamicsNet,
    _closed_form_kf,
    _simulate,
)
from multimodalfilter_tpu.filtering import (  # noqa: E402
    DynamicsDef,
    MeasurementDef,
    ParticleFilterDef,
)


def test_particle_sharded_pf_tracks_kf():
    key = jax.random.PRNGKey(2)
    states, obs, controls = _simulate(key, timesteps=30, batch=2)
    pf = ParticleFilterDef(
        dynamics_model=DynamicsDef(
            _LinearDynamicsNet(), state_dim=STATE_DIM, control_dim=CONTROL_DIM
        ),
        measurement_model=MeasurementDef(
            _GaussianMeasurementNet(), state_dim=STATE_DIM, obs_spec=OBS_SPEC
        ),
        state_dim=STATE_DIM,
        control_dim=CONTROL_DIM,
        obs_spec=OBS_SPEC,
        num_particles_eval=2048,  # 256 per device on the 8-device mesh
    )
    params = pf.init(key)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (2, STATE_DIM, STATE_DIM))
    belief = pf.initialize_beliefs(params, key, mean0, cov0, train=False)

    mesh = create_mesh(8, axis_names=("particle",))
    loop = make_particle_sharded_pf_loop(pf, mesh)
    final_belief, estimates = loop(params, belief, {"y": obs}, controls, key)

    assert final_belief.particles.shape == (2, 2048, STATE_DIM)
    # Global weights normalized (logsumexp over the full M axis == 0).
    lse = jax.scipy.special.logsumexp(final_belief.log_weights, axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)

    expected = _closed_form_kf(mean0, cov0, obs, controls)
    err = np.abs(np.asarray(estimates[5:]) - expected[5:])
    assert err.mean() < 0.08, err.mean()


def test_2d_mesh_data_x_particle_tracks_kf():
    """Composed sharding: batch N over a 2-wide data axis AND M over a
    4-wide particle axis on one 2x4 grid. Estimates must track the
    closed-form KF oracle like the 1-D variants do."""
    key = jax.random.PRNGKey(5)
    states, obs, controls = _simulate(key, timesteps=30, batch=4)
    pf = ParticleFilterDef(
        dynamics_model=DynamicsDef(
            _LinearDynamicsNet(), state_dim=STATE_DIM, control_dim=CONTROL_DIM
        ),
        measurement_model=MeasurementDef(
            _GaussianMeasurementNet(), state_dim=STATE_DIM, obs_spec=OBS_SPEC
        ),
        state_dim=STATE_DIM,
        control_dim=CONTROL_DIM,
        obs_spec=OBS_SPEC,
        num_particles_eval=1024,  # 256 per particle-shard
    )
    params = pf.init(key)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (4, STATE_DIM, STATE_DIM))
    belief = pf.initialize_beliefs(params, key, mean0, cov0, train=False)

    mesh = create_mesh(8, axis_names=("data", "particle"), shape=(2, 4))
    loop = make_particle_sharded_pf_loop(pf, mesh, data_axis_name="data")
    final_belief, estimates = loop(params, belief, {"y": obs}, controls, key)

    assert final_belief.particles.shape == (4, 1024, STATE_DIM)
    assert estimates.shape == (30, 4, STATE_DIM)
    lse = jax.scipy.special.logsumexp(final_belief.log_weights, axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)

    expected = _closed_form_kf(mean0, cov0, obs, controls)
    err = np.abs(np.asarray(estimates[5:]) - expected[5:])
    assert err.mean() < 0.08, err.mean()

    # The data rows must be filtering DIFFERENT trajectories independently:
    # per-trajectory errors should all be small (no row collapsed).
    per_traj = err.mean(axis=(0, 2))
    assert (per_traj < 0.15).all(), per_traj


def test_particle_sharded_chunked_kernel_composes():
    """Sharding x chunked Pallas kernel (round-2 verdict weak #7): global
    M=16384 over 8 devices leaves each shard at M=2048 — inside the chunked
    kernel's band (1024 < M <= 16384) — with pallas_resample=True (interpret
    mode on CPU). Must still track the oracle and match the identical loop
    with the jnp tail bitwise (the chunked kernel's particle indices are
    bitwise vs jnp; the estimate einsum reassociates ~1e-6)."""
    key = jax.random.PRNGKey(6)
    states, obs, controls = _simulate(key, timesteps=12, batch=2)

    def make_pf(pallas):
        return ParticleFilterDef(
            dynamics_model=DynamicsDef(
                _LinearDynamicsNet(), state_dim=STATE_DIM,
                control_dim=CONTROL_DIM,
            ),
            measurement_model=MeasurementDef(
                _GaussianMeasurementNet(), state_dim=STATE_DIM,
                obs_spec=OBS_SPEC,
            ),
            state_dim=STATE_DIM,
            control_dim=CONTROL_DIM,
            obs_spec=OBS_SPEC,
            num_particles_eval=16384,  # 2048/device -> chunked kernel
            pallas_resample=True,
        )

    pf = make_pf(pallas=True)
    params = pf.init(key)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (2, STATE_DIM, STATE_DIM))
    belief = pf.initialize_beliefs(params, key, mean0, cov0, train=False)

    mesh = create_mesh(8, axis_names=("particle",))
    loop = make_particle_sharded_pf_loop(pf, mesh)
    final_p, est_p = loop(params, belief, {"y": obs}, controls, key)

    assert final_p.particles.shape == (2, 16384, STATE_DIM)
    lse = jax.scipy.special.logsumexp(final_p.log_weights, axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)

    expected = _closed_form_kf(mean0, cov0, obs, controls)
    err = np.abs(np.asarray(est_p[5:]) - expected[5:])
    assert err.mean() < 0.08, err.mean()

    # Same sharded loop with the jnp tail: particle paths must be bitwise.
    pf_jnp = make_pf(pallas=True).__class__(**{
        **{f.name: getattr(pf, f.name) for f in __import__("dataclasses").fields(pf)},
        "pallas_resample": False,
    })
    loop_jnp = make_particle_sharded_pf_loop(pf_jnp, mesh)
    final_j, est_j = loop_jnp(params, belief, {"y": obs}, controls, key)
    np.testing.assert_array_equal(
        np.asarray(final_p.particles), np.asarray(final_j.particles)
    )
    np.testing.assert_allclose(
        np.asarray(est_p), np.asarray(est_j), atol=1e-5, rtol=1e-5
    )


def test_particle_sharded_train_loop_matches_plain_bptt():
    """The M-sharded TRAIN loop (no resampling; global noise stream sliced
    per shard) is a pure execution transform of forward_loop(train=True):
    estimates, final weights, AND parameter gradients match the
    single-device loop within fp reassociation."""
    from multimodalfilter_tpu.parallel.particle_sharding import (
        make_particle_sharded_pf_train_loop,
    )

    key = jax.random.PRNGKey(7)
    states, obs, controls = _simulate(key, timesteps=10, batch=2)
    pf = ParticleFilterDef(
        dynamics_model=DynamicsDef(
            _LinearDynamicsNet(), state_dim=STATE_DIM, control_dim=CONTROL_DIM
        ),
        measurement_model=MeasurementDef(
            _GaussianMeasurementNet(), state_dim=STATE_DIM, obs_spec=OBS_SPEC
        ),
        state_dim=STATE_DIM,
        control_dim=CONTROL_DIM,
        obs_spec=OBS_SPEC,
        num_particles_train=64,  # 8 per device on the 8-device mesh
    )
    params = pf.init(key)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (2, STATE_DIM, STATE_DIM))
    belief = pf.initialize_beliefs(params, key, mean0, cov0, train=True)

    mesh = create_mesh(8, axis_names=("particle",))
    loop = make_particle_sharded_pf_train_loop(pf, mesh)

    def loss_sharded(p):
        _, est = loop(p, belief, {"y": obs}, controls, key)
        return jnp.mean((est - states[1:]) ** 2)

    def loss_plain(p):
        _, est = pf.forward_loop(
            p, belief, {"y": obs}, controls, key, train=True
        )
        return jnp.mean((est - states[1:]) ** 2)

    # Forward equivalence.
    bel_s, est_s = loop(params, belief, {"y": obs}, controls, key)
    bel_p, est_p = pf.forward_loop(
        params, belief, {"y": obs}, controls, key, train=True
    )
    np.testing.assert_allclose(
        np.asarray(est_s), np.asarray(est_p), atol=1e-5, rtol=1e-5
    )
    # log-weights accumulate T steps of pmax/psum-vs-logsumexp
    # reassociation (~3e-7 relative on O(100) magnitudes).
    np.testing.assert_allclose(
        np.asarray(bel_s.log_weights), np.asarray(bel_p.log_weights),
        atol=1e-4, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(bel_s.particles), np.asarray(bel_p.particles), atol=1e-6
    )

    # Gradient equivalence (BPTT through the collectives).
    ls, gs = jax.value_and_grad(loss_sharded)(params)
    lp, gp = jax.value_and_grad(loss_plain)(params)
    np.testing.assert_allclose(float(ls), float(lp), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gp)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )
