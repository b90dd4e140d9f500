"""Temporal pipeline parallelism (parallel/temporal_pipeline.py).

The time axis of the PF loop sharded over pipeline stages must reproduce
the single-device forward_loop: with micro=1 and the microbatch key-fold
disabled the PARTICLE path is BITWISE the plain loop (estimates reassociate
~1e-7 under the shard_map context); with microbatching it matches the plain
loop run per-slice with the documented key fold; and it
must track the linear-Gaussian closed-form KF oracle end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfilter_tpu.parallel.mesh import create_mesh
from multimodalfilter_tpu.parallel.temporal_pipeline import (
    make_pipelined_pf_loop,
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


def _make_pf(num_particles=64):
    return ParticleFilterDef(
        dynamics_model=DynamicsDef(
            _LinearDynamicsNet(), state_dim=STATE_DIM, control_dim=CONTROL_DIM
        ),
        measurement_model=MeasurementDef(
            _GaussianMeasurementNet(), state_dim=STATE_DIM, obs_spec=OBS_SPEC
        ),
        state_dim=STATE_DIM,
        control_dim=CONTROL_DIM,
        obs_spec=OBS_SPEC,
        num_particles_eval=num_particles,
    )


def _setup(key, timesteps, batch):
    states, obs, controls = _simulate(key, timesteps=timesteps, batch=batch)
    pf = _make_pf()
    params = pf.init(key)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (batch, STATE_DIM, STATE_DIM)
    )
    belief = pf.initialize_beliefs(params, key, mean0, cov0, train=False)
    return pf, params, belief, states, obs, controls


def test_pipeline_bitwise_micro1():
    """micro=1, key fold off: the pipeline is a sequential chunk relay and
    must be BITWISE the single-device forward_loop."""
    key = jax.random.PRNGKey(0)
    pf, params, belief, _, obs, controls = _setup(key, timesteps=24, batch=4)

    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_pf_loop(
        pf, mesh, num_microbatches=1, fold_microbatch_key=False
    )
    final_p, est_p = loop(params, belief, {"y": obs}, controls, key)

    final_s, est_s = pf.forward_loop(
        params, belief, {"y": obs}, controls, key, train=False
    )
    # Particles/weights are bitwise; the estimate einsum reassociates under
    # the shard_map program context (~1e-7), so allclose there.
    np.testing.assert_allclose(
        np.asarray(est_p), np.asarray(est_s), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(final_p.particles), np.asarray(final_s.particles)
    )
    np.testing.assert_array_equal(
        np.asarray(final_p.log_weights), np.asarray(final_s.log_weights)
    )


def test_pipeline_bitwise_microbatched():
    """micro=2 over 4 stages: equals the plain loop run per microbatch
    slice with the documented per-timestep key fold."""
    key = jax.random.PRNGKey(1)
    batch, micro = 6, 2
    pf, params, belief, _, obs, controls = _setup(key, timesteps=16, batch=batch)

    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_pf_loop(pf, mesh, num_microbatches=micro)
    final_p, est_p = loop(params, belief, {"y": obs}, controls, key)

    # Reference: per-slice scan with keys folded by microbatch index.
    nm = batch // micro
    t = controls.shape[0]
    keys = jax.random.split(key, t)
    for mc in range(micro):
        sl = slice(mc * nm, (mc + 1) * nm)
        bel_mc = type(belief)(belief.particles[sl], belief.log_weights[sl])
        keys_mc = jax.vmap(lambda k: jax.random.fold_in(k, mc))(keys)

        # Re-run the plain scan with explicit keys (forward_loop's body).
        feats = pf.measurement_model.encode_observations(
            params["measurement_model"],
            jax.tree_util.tree_map(
                lambda x: x[:, sl].reshape((t * nm,) + x.shape[2:]),
                {"y": obs},
            ),
        )
        feats_seq = jax.tree_util.tree_map(
            lambda x: x.reshape((t, nm) + x.shape[1:]), feats
        )

        def scan_step(carry, inputs):
            f_t, c_t, k_t = inputs

            def llf(parts):
                return pf.measurement_model.log_likelihoods_from_features(
                    params["measurement_model"], parts, f_t
                )

            return pf._step_core(params, carry, llf, c_t, k_t, train=False)

        final_mc, est_mc = jax.lax.scan(
            scan_step, bel_mc, (feats_seq, controls[:, sl], keys_mc)
        )
        np.testing.assert_allclose(
            np.asarray(est_p[:, sl]), np.asarray(est_mc), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(final_p.particles[sl]), np.asarray(final_mc.particles)
        )


def test_pipeline_tracks_kf_oracle_8stages():
    """Full 8-stage pipeline with micro=4 tracks the closed-form KF."""
    key = jax.random.PRNGKey(2)
    pf, params, belief, states, obs, controls = _setup(
        key, timesteps=32, batch=4
    )
    mesh = create_mesh(8, axis_names=("pipe",))
    loop = make_pipelined_pf_loop(pf, mesh, num_microbatches=4)
    final_p, est = loop(params, belief, {"y": obs}, controls, key)

    assert est.shape == (32, 4, STATE_DIM)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (4, STATE_DIM, STATE_DIM))
    expected = _closed_form_kf(mean0, cov0, obs, controls)
    err = np.abs(np.asarray(est[5:]) - expected[5:])
    assert err.mean() < 0.12, err.mean()
    # Final belief replicated + weights normalized per trajectory.
    lse = jax.scipy.special.logsumexp(final_p.log_weights, axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)


def test_generic_pipeline_ekf_matches_plain_loop():
    """The generic (any-FilterDef) pipeline on a deterministic EKF must
    reproduce the plain forward_loop (per microbatch slice; the EKF ignores
    keys so the microbatch fold is inert)."""
    from test_filter_core import _make_ekf
    from multimodalfilter_tpu.parallel.temporal_pipeline import (
        make_pipelined_filter_loop,
    )

    key = jax.random.PRNGKey(4)
    batch, micro, t = 4, 2, 16
    states, obs, controls = _simulate(key, timesteps=t, batch=batch)
    ekf = _make_ekf()
    params = ekf.init(key)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (batch, STATE_DIM, STATE_DIM)
    )
    belief = ekf.initialize_beliefs(params, key, mean0, cov0, train=False)

    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_filter_loop(ekf, mesh, num_microbatches=micro)
    final_p, est_p = loop(params, belief, {"y": obs}, controls, key)

    final_s, est_s = ekf.forward_loop(
        params, belief, {"y": obs}, controls, key, train=False
    )
    np.testing.assert_allclose(
        np.asarray(est_p), np.asarray(est_s), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(final_p.mean), np.asarray(final_s.mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(final_p.cov), np.asarray(final_s.cov), atol=1e-5
    )


def test_generic_pipeline_pf_matches_specialized():
    """The generic loop and the encoder-hoisting PF loop must agree
    (hoisting is exact; both use the same keys and fold)."""
    from multimodalfilter_tpu.parallel.temporal_pipeline import (
        make_pipelined_filter_loop,
    )

    key = jax.random.PRNGKey(5)
    pf, params, belief, _, obs, controls = _setup(key, timesteps=16, batch=4)
    mesh = create_mesh(4, axis_names=("pipe",))
    loop_g = make_pipelined_filter_loop(pf, mesh, num_microbatches=2)
    loop_s = make_pipelined_pf_loop(pf, mesh, num_microbatches=2)
    final_g, est_g = loop_g(params, belief, {"y": obs}, controls, key)
    final_s, est_s = loop_s(params, belief, {"y": obs}, controls, key)
    np.testing.assert_allclose(
        np.asarray(est_g), np.asarray(est_s), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(final_g.particles), np.asarray(final_s.particles)
    )


def test_generic_pipeline_lstm_matches_plain_loop():
    """The generic pipeline also carries the LSTM baseline's (h, c) tuple
    belief through the stage relay (deterministic net -> tight match)."""
    from crossmodal.door_models import DoorLSTMFilter
    from multimodalfilter_tpu.parallel.temporal_pipeline import (
        make_pipelined_filter_loop,
    )

    model = DoorLSTMFilter()
    defn = model.definition
    key = jax.random.PRNGKey(6)
    ks = jax.random.split(key, 5)
    t, n = 8, 4
    obs = {
        "image": jax.random.normal(ks[0], (t, n, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (t, n, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (t, n, 7)),
    }
    controls = jax.random.normal(ks[3], (t, n, 7))
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(model.params, ks[4], mean, cov, train=False)

    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_filter_loop(defn, mesh, num_microbatches=2)
    final_p, est_p = loop(model.params, belief, obs, controls, key)

    final_s, est_s = defn.forward_loop(
        model.params, belief, obs, controls, key, train=False
    )
    np.testing.assert_allclose(
        np.asarray(est_p), np.asarray(est_s), atol=1e-5, rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(final_p), jax.tree_util.tree_leaves(final_s)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_generic_pipeline_crossmodal_kf_matches_plain_loop():
    """Fusion defs pipeline too: the crossmodal KF's fused GaussianBelief
    (the write-back carry) relays through the stages."""
    from crossmodal.door_models import DoorCrossmodalKalmanFilter
    from multimodalfilter_tpu.parallel.temporal_pipeline import (
        make_pipelined_filter_loop,
    )

    model = DoorCrossmodalKalmanFilter()
    defn = model.definition
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 5)
    t, n = 8, 4
    obs = {
        "image": jax.random.normal(ks[0], (t, n, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (t, n, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (t, n, 7)),
    }
    controls = jax.random.normal(ks[3], (t, n, 7))
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(model.params, ks[4], mean, cov, train=False)

    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_filter_loop(
        defn, mesh, num_microbatches=2, enabled=(True, True)
    )
    final_p, est_p = loop(model.params, belief, obs, controls, key)

    final_s, est_s = defn.forward_loop(
        model.params, belief, obs, controls, key, train=False,
        enabled=(True, True),
    )
    np.testing.assert_allclose(
        np.asarray(est_p), np.asarray(est_s), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(final_p.mean), np.asarray(final_s.mean), atol=1e-4
    )


# ---------------------------------------------------------------------------
# Composed 2-D data x pipe grid (round 3): batch DP across one mesh axis,
# each data shard pipelining its own time axis.
# ---------------------------------------------------------------------------


def test_data_pipe_grid_size1_data_axis_bitwise_1d():
    """A (1, P) grid must be BITWISE the 1-D pipelined loop: the data-axis
    key fold is skipped at size 1 (pinned contract)."""
    key = jax.random.PRNGKey(11)
    pf, params, belief, _, obs, controls = _setup(key, timesteps=16, batch=4)

    mesh_1d = create_mesh(4, axis_names=("pipe",))
    loop_1d = make_pipelined_pf_loop(pf, mesh_1d, num_microbatches=2)
    final_1d, est_1d = loop_1d(params, belief, {"y": obs}, controls, key)

    mesh_2d = create_mesh(4, axis_names=("data", "pipe"), shape=(1, 4))
    loop_2d = make_pipelined_pf_loop(
        pf, mesh_2d, num_microbatches=2, data_axis_name="data"
    )
    final_2d, est_2d = loop_2d(params, belief, {"y": obs}, controls, key)

    np.testing.assert_allclose(
        np.asarray(est_2d), np.asarray(est_1d), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(final_2d.particles), np.asarray(final_1d.particles)
    )


def test_data_pipe_grid_pf_bitwise_decomposition():
    """(2 data x 4 pipe) grid: each data shard's rollout equals the plain
    per-microbatch scan with the documented DOUBLE key fold — per-timestep
    keys folded first with the data index, then with the microbatch index."""
    key = jax.random.PRNGKey(12)
    data_shards, micro = 2, 2
    batch = 8  # 4 rows per data shard, 2 per microbatch
    pf, params, belief, _, obs, controls = _setup(key, timesteps=16, batch=batch)

    mesh = create_mesh(8, axis_names=("data", "pipe"), shape=(2, 4))
    loop = make_pipelined_pf_loop(
        pf, mesh, num_microbatches=micro, data_axis_name="data"
    )
    final_p, est_p = loop(params, belief, {"y": obs}, controls, key)

    t = controls.shape[0]
    n_loc = batch // data_shards
    nm = n_loc // micro
    keys = jax.random.split(key, t)
    for d in range(data_shards):
        keys_d = jax.vmap(lambda k: jax.random.fold_in(k, d))(keys)
        for mc in range(micro):
            sl = slice(d * n_loc + mc * nm, d * n_loc + (mc + 1) * nm)
            bel_mc = type(belief)(belief.particles[sl], belief.log_weights[sl])
            keys_mc = jax.vmap(lambda k: jax.random.fold_in(k, mc))(keys_d)

            def scan_step(carry, inputs):
                o_t, c_t, k_t = inputs
                return pf.step(params, carry, {"y": o_t}, c_t, k_t, train=False)

            final_mc, est_mc = jax.lax.scan(
                scan_step, bel_mc, (obs[:, sl], controls[:, sl], keys_mc)
            )
            np.testing.assert_allclose(
                np.asarray(est_p[:, sl]), np.asarray(est_mc),
                atol=1e-5, rtol=1e-5,
            )
            np.testing.assert_array_equal(
                np.asarray(final_p.particles[sl]),
                np.asarray(final_mc.particles),
            )


def test_data_pipe_grid_tracks_kf_oracle():
    """(2 data x 4 pipe) PF grid tracks the closed-form KF oracle, with
    every trajectory filtered independently (no row collapse)."""
    key = jax.random.PRNGKey(13)
    pf, params, belief, states, obs, controls = _setup(
        key, timesteps=32, batch=8
    )
    mesh = create_mesh(8, axis_names=("data", "pipe"), shape=(2, 4))
    loop = make_pipelined_pf_loop(
        pf, mesh, num_microbatches=2, data_axis_name="data"
    )
    final_p, est = loop(params, belief, {"y": obs}, controls, key)

    assert est.shape == (32, 8, STATE_DIM)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (8, STATE_DIM, STATE_DIM))
    expected = _closed_form_kf(mean0, cov0, obs, controls)
    err = np.abs(np.asarray(est[5:]) - expected[5:])
    assert err.mean() < 0.12, err.mean()
    per_traj = err.mean(axis=(0, 2))
    assert (per_traj < 0.25).all(), per_traj
    lse = jax.scipy.special.logsumexp(final_p.log_weights, axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)


def test_data_pipe_grid_generic_ekf_matches_plain():
    """Generic variant on the 2-D grid: a deterministic EKF ignores keys, so
    the grid must reproduce the plain forward_loop exactly."""
    from test_filter_core import _make_ekf
    from multimodalfilter_tpu.parallel.temporal_pipeline import (
        make_pipelined_filter_loop,
    )

    key = jax.random.PRNGKey(14)
    batch, t = 8, 16
    states, obs, controls = _simulate(key, timesteps=t, batch=batch)
    ekf = _make_ekf()
    params = ekf.init(key)
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (batch, STATE_DIM, STATE_DIM)
    )
    belief = ekf.initialize_beliefs(params, key, states[0], cov0, train=False)

    mesh = create_mesh(8, axis_names=("data", "pipe"), shape=(2, 4))
    loop = make_pipelined_filter_loop(
        ekf, mesh, num_microbatches=2, data_axis_name="data"
    )
    final_p, est_p = loop(params, belief, {"y": obs}, controls, key)

    final_s, est_s = ekf.forward_loop(
        params, belief, {"y": obs}, controls, key, train=False
    )
    np.testing.assert_allclose(
        np.asarray(est_p), np.asarray(est_s), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(final_p.mean), np.asarray(final_s.mean), atol=1e-5
    )


def test_pipeline_rejects_indivisible_t():
    key = jax.random.PRNGKey(3)
    pf, params, belief, _, obs, controls = _setup(key, timesteps=30, batch=4)
    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_pf_loop(pf, mesh, num_microbatches=2)
    try:
        loop(params, belief, {"y": obs}, controls, key)
    except AssertionError as e:
        assert "not divisible" in str(e)
    else:
        raise AssertionError("expected divisibility assertion")


# ---------------------------------------------------------------------------
# BPTT through the pipeline (round 3): the schedule is a checkpointed
# lax.scan, so reverse-mode grads flow through the stage relay.
# ---------------------------------------------------------------------------


def _param_grads_close(ga, gb, atol=1e-4, rtol=1e-3):
    la, lb = jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=rtol
        )


def test_pipeline_bptt_grads_match_plain_ekf():
    """Grads of an MSE rollout loss through the pipelined generic loop
    (micro=1, fold off -> forward is bitwise the plain loop) must match the
    plain forward_loop grads."""
    from test_filter_core import _make_ekf
    from multimodalfilter_tpu.parallel.temporal_pipeline import (
        make_pipelined_filter_loop,
    )

    key = jax.random.PRNGKey(8)
    batch, t = 4, 16
    states, obs, controls = _simulate(key, timesteps=t, batch=batch)
    ekf = _make_ekf()
    params = ekf.init(key)
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (batch, STATE_DIM, STATE_DIM)
    )
    belief = ekf.initialize_beliefs(params, key, states[0], cov0, train=True)

    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_filter_loop(
        ekf, mesh, num_microbatches=1, train=True, fold_microbatch_key=False
    )

    def loss_pipelined(p):
        _, est = loop(p, belief, {"y": obs}, controls, key)
        return jnp.mean((est - states[1:]) ** 2)

    def loss_plain(p):
        _, est = ekf.forward_loop(
            p, belief, {"y": obs}, controls, key, train=True
        )
        return jnp.mean((est - states[1:]) ** 2)

    lp, gp = jax.value_and_grad(loss_pipelined)(params)
    ls, gs = jax.value_and_grad(loss_plain)(params)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    _param_grads_close(gp, gs)


def test_pipeline_bptt_grads_match_plain_pf():
    """PF train-mode BPTT (soft/no-resample path) through the pipelined PF
    loop: grads match the plain train-mode forward_loop (micro=1, fold
    off)."""
    key = jax.random.PRNGKey(9)
    batch, t = 4, 16
    states, obs, controls = _simulate(key, timesteps=t, batch=batch)
    pf = _make_pf(num_particles=32)
    params = pf.init(key)
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (batch, STATE_DIM, STATE_DIM)
    )
    belief = pf.initialize_beliefs(params, key, states[0], cov0, train=True)

    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_pf_loop(
        pf, mesh, num_microbatches=1, train=True, fold_microbatch_key=False
    )

    def loss_pipelined(p):
        _, est = loop(p, belief, {"y": obs}, controls, key)
        return jnp.mean((est - states[1:]) ** 2)

    def loss_plain(p):
        _, est = pf.forward_loop(
            p, belief, {"y": obs}, controls, key, train=True
        )
        return jnp.mean((est - states[1:]) ** 2)

    lp, gp = jax.value_and_grad(loss_pipelined)(params)
    ls, gs = jax.value_and_grad(loss_plain)(params)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    _param_grads_close(gp, gs)


def test_pipeline_bptt_grads_microbatched():
    """micro=2: pipelined grads equal the sum-consistent grads of the
    per-microbatch-slice plain loops with the documented key fold (the same
    decomposition the forward equivalence test pins)."""
    key = jax.random.PRNGKey(10)
    batch, micro, t = 4, 2, 16
    states, obs, controls = _simulate(key, timesteps=t, batch=batch)
    pf = _make_pf(num_particles=32)
    params = pf.init(key)
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (batch, STATE_DIM, STATE_DIM)
    )
    belief = pf.initialize_beliefs(params, key, states[0], cov0, train=True)

    mesh = create_mesh(4, axis_names=("pipe",))
    loop = make_pipelined_pf_loop(pf, mesh, num_microbatches=micro, train=True)

    def loss_pipelined(p):
        _, est = loop(p, belief, {"y": obs}, controls, key)
        return jnp.mean((est - states[1:]) ** 2)

    nm = batch // micro
    keys = jax.random.split(key, t)

    def loss_sliced(p):
        total = 0.0
        for mc in range(micro):
            sl = slice(mc * nm, (mc + 1) * nm)
            bel_mc = type(belief)(belief.particles[sl], belief.log_weights[sl])
            keys_mc = jax.vmap(lambda k: jax.random.fold_in(k, mc))(keys)

            def scan_step(carry, inputs):
                o_t, c_t, k_t = inputs
                return pf.step(p, carry, {"y": o_t}, c_t, k_t, train=True)

            _, est_mc = jax.lax.scan(
                scan_step, bel_mc, (obs[:, sl], controls[:, sl], keys_mc)
            )
            total = total + jnp.sum((est_mc - states[1:, sl]) ** 2)
        return total / (t * batch * STATE_DIM)

    lp, gp = jax.value_and_grad(loss_pipelined)(params)
    ls, gs = jax.value_and_grad(loss_sliced)(params)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    _param_grads_close(gp, gs, atol=1e-4, rtol=5e-3)


# ---- composed pipe x particle (and the full 3-D data x pipe x particle) ----


def test_pipe_particle_grid_bitwise_vs_standalone_sharded():
    """(2 pipe x 4 particle) grid with micro=1 + fold disabled is BITWISE
    the standalone particle-sharded loop on a 4-shard particle mesh: the
    pipeline chunks the SAME per-timestep key stream and relays exact
    carries, and the per-step body is literally particle_sharding.py's
    shared sharded_pf_eval_step."""
    from multimodalfilter_tpu.parallel.particle_sharding import (
        make_particle_sharded_pf_loop,
    )

    key = jax.random.PRNGKey(21)
    pf, params, belief, _, obs, controls = _setup(key, timesteps=16, batch=4)

    mesh_1d = create_mesh(4, axis_names=("particle",))
    loop_ref = make_particle_sharded_pf_loop(pf, mesh_1d)
    final_ref, est_ref = loop_ref(params, belief, {"y": obs}, controls, key)

    mesh = create_mesh(8, axis_names=("pipe", "particle"), shape=(2, 4))
    loop = make_pipelined_pf_loop(
        pf, mesh, num_microbatches=1, fold_microbatch_key=False,
        particle_axis_name="particle",
    )
    final_p, est_p = loop(params, belief, {"y": obs}, controls, key)

    np.testing.assert_array_equal(
        np.asarray(final_p.particles), np.asarray(final_ref.particles)
    )
    np.testing.assert_array_equal(
        np.asarray(final_p.log_weights), np.asarray(final_ref.log_weights)
    )
    np.testing.assert_allclose(
        np.asarray(est_p), np.asarray(est_ref), atol=1e-6, rtol=1e-6
    )


def test_pipe_particle_grid_tracks_kf_oracle():
    """(2 pipe x 4 particle) grid, microbatched: tracks the closed-form KF
    oracle, with the GLOBAL weight normalization holding across particle
    shards (logsumexp over the sharded M axis == 0)."""
    key = jax.random.PRNGKey(22)
    pf, params, belief, states, obs, controls = _setup(
        key, timesteps=32, batch=4
    )
    mesh = create_mesh(8, axis_names=("pipe", "particle"), shape=(2, 4))
    loop = make_pipelined_pf_loop(
        pf, mesh, num_microbatches=2, particle_axis_name="particle"
    )
    final_p, est = loop(params, belief, {"y": obs}, controls, key)

    assert est.shape == (32, 4, STATE_DIM)
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (4, STATE_DIM, STATE_DIM)
    )
    expected = _closed_form_kf(states[0], cov0, obs, controls)
    err = np.abs(np.asarray(est[5:]) - expected[5:])
    assert err.mean() < 0.12, err.mean()
    lse = jax.scipy.special.logsumexp(final_p.log_weights, axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)


def test_data_pipe_particle_3d_grid_tracks_kf_oracle():
    """Full 3-D (2 data x 2 pipe x 2 particle) grid: batch DP x time
    pipelining x particle sharding on one 8-device mesh. Tracks the KF
    oracle with every trajectory filtered independently (no row collapse)
    and globally-normalized weights."""
    key = jax.random.PRNGKey(23)
    pf, params, belief, states, obs, controls = _setup(
        key, timesteps=32, batch=8
    )
    mesh = create_mesh(
        8, axis_names=("data", "pipe", "particle"), shape=(2, 2, 2)
    )
    loop = make_pipelined_pf_loop(
        pf, mesh, num_microbatches=2, data_axis_name="data",
        particle_axis_name="particle",
    )
    final_p, est = loop(params, belief, {"y": obs}, controls, key)

    assert est.shape == (32, 8, STATE_DIM)
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (8, STATE_DIM, STATE_DIM)
    )
    expected = _closed_form_kf(states[0], cov0, obs, controls)
    err = np.abs(np.asarray(est[5:]) - expected[5:])
    assert err.mean() < 0.12, err.mean()
    per_traj = err.mean(axis=(0, 2))
    assert (per_traj < 0.25).all(), per_traj
    lse = jax.scipy.special.logsumexp(final_p.log_weights, axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)


def test_pipe_particle_grid_bptt_grads_match_plain():
    """Train-mode (2 pipe x 4 particle) grid: loss and parameter grads
    match the plain forward_loop(train=True) — the sharded train step
    slices the GLOBAL noise stream (exactly the single-device draw), and
    micro=1 + fold off consumes the same per-timestep keys."""
    import dataclasses

    key = jax.random.PRNGKey(24)
    batch, t = 4, 16
    states, obs, controls = _simulate(key, timesteps=t, batch=batch)
    pf = dataclasses.replace(
        _make_pf(num_particles=32), num_particles_train=32
    )
    params = pf.init(key)
    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (batch, STATE_DIM, STATE_DIM)
    )
    belief = pf.initialize_beliefs(params, key, states[0], cov0, train=True)

    mesh = create_mesh(8, axis_names=("pipe", "particle"), shape=(2, 4))
    loop = make_pipelined_pf_loop(
        pf, mesh, num_microbatches=1, train=True, fold_microbatch_key=False,
        particle_axis_name="particle",
    )

    def loss_grid(p):
        _, est = loop(p, belief, {"y": obs}, controls, key)
        return jnp.mean((est - states[1:]) ** 2)

    def loss_plain(p):
        _, est = pf.forward_loop(
            p, belief, {"y": obs}, controls, key, train=True
        )
        return jnp.mean((est - states[1:]) ** 2)

    lg, gg = jax.value_and_grad(loss_grid)(params)
    ls, gs = jax.value_and_grad(loss_plain)(params)
    np.testing.assert_allclose(float(lg), float(ls), rtol=1e-6)
    _param_grads_close(gg, gs)


def test_facade_pipe_particle_grid_routing():
    """StatefulFilter.use_pipeline auto-detects a "particle" mesh axis (PF
    defs only): the cache key carries it, forward_loop runs the composed
    grid with globally-normalized sharded weights, and a non-PF def is
    rejected at configuration time."""
    import pytest

    from multimodalfilter_tpu.filtering.wrappers import StatefulFilter

    key = jax.random.PRNGKey(25)
    batch, t = 4, 16
    states, obs, controls = _simulate(key, timesteps=t, batch=batch)

    sf = StatefulFilter(_make_pf())
    sf.eval()
    mesh = create_mesh(8, axis_names=("pipe", "particle"), shape=(2, 4))
    sf.use_pipeline(mesh, num_microbatches=2)
    assert "particle" in sf.loop_cache_key(batch=batch)[4:]

    cov0 = jnp.broadcast_to(
        0.1 * jnp.eye(STATE_DIM), (batch, STATE_DIM, STATE_DIM)
    )
    sf.initialize_beliefs(mean=states[0], covariance=cov0)
    est = sf.forward_loop(observations={"y": obs}, controls=controls)
    assert est.shape == (t, batch, STATE_DIM)
    assert np.isfinite(np.asarray(est)).all()
    lse = jax.scipy.special.logsumexp(sf.belief.log_weights, axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)

    # Non-PF defs cannot shard a particle axis.
    from test_filter_core import _make_ekf  # noqa: E402

    sf2 = StatefulFilter(_make_ekf())
    with pytest.raises(ValueError, match="particle"):
        sf2.use_pipeline(mesh)


def test_use_pipeline_config_validation():
    """Misconfigurations fail loudly at use_pipeline time, not with a
    KeyError deep inside the first forward_loop: a mesh without the
    pipeline axis is rejected, and a Pallas-enabled PF def warns that the
    particle-sharded step bypasses the fused kernel."""
    import dataclasses
    import warnings

    import pytest

    from multimodalfilter_tpu.filtering.wrappers import StatefulFilter

    sf = StatefulFilter(_make_pf())
    # Plain DP mesh (axis "data") has no "pipe" axis.
    with pytest.raises(ValueError, match="pipe"):
        sf.use_pipeline(create_mesh(8))

    # Pallas PF def + particle axis -> loud bypass warning (the sharded
    # resampler is collective; the fused kernel cannot apply inside it).
    pallas_def = dataclasses.replace(_make_pf(), pallas_resample=True)
    sf2 = StatefulFilter(pallas_def)
    mesh = create_mesh(8, axis_names=("pipe", "particle"), shape=(2, 4))
    with pytest.warns(UserWarning, match="Pallas"):
        sf2.use_pipeline(mesh)
