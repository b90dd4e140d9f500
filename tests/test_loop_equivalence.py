"""The TPU-optimized forward_loop (obs encoders / virtual sensors / gates
hoisted out of the scan) must produce IDENTICAL estimates to stepping the
filter one timestep at a time with the same per-step keys."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossmodal.tasks import DoorTask

MODELS = [
    "DoorParticleFilter",
    "DoorCrossmodalParticleFilter",
    "DoorUnimodalParticleFilter",
    "DoorKalmanFilter",
    "DoorCrossmodalKalmanFilter",
    "DoorUnimodalKalmanFilter",
    "DoorMeasurementCrossmodalKalmanFilter",
    "DoorMeasurementUnimodalKalmanFilter",
]


def _sequence(n=2, t=4):
    rng = np.random.default_rng(42)

    def arr(*shape):
        return rng.normal(size=shape).astype(np.float32)

    obs = {
        "image": arr(t, n, 32, 32),
        "gripper_pos": arr(t, n, 3),
        "gripper_sensors": arr(t, n, 7),
    }
    return obs, arr(t, n, 7)


@pytest.mark.parametrize("name", MODELS)
@pytest.mark.parametrize("train", [True, False])
def test_loop_matches_stepwise(name, train):
    model = DoorTask.model_types[name]()
    defn = model.definition
    params = model.params
    n, t = 2, 4
    key = jax.random.PRNGKey(0)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    obs_seq, ctrl_seq = _sequence(n, t)
    obs_seq = {k: jnp.asarray(v) for k, v in obs_seq.items()}
    ctrl_seq = jnp.asarray(ctrl_seq)
    enabled = model._enabled_tuple

    belief0 = defn.initialize_beliefs(params, key, mean, cov, train=train)

    # Hoisted loop.
    _, loop_estimates = defn.forward_loop(
        params, belief0, obs_seq, ctrl_seq, key, train=train, enabled=enabled
    )

    # Step-by-step with the same key schedule (matching base.forward_loop).
    keys = jax.random.split(key, t)
    belief = belief0
    step_estimates = []
    for i in range(t):
        obs_t = {k: v[i] for k, v in obs_seq.items()}
        belief, est = defn.step(
            params, belief, obs_t, ctrl_seq[i], keys[i], train=train,
            enabled=enabled,
        )
        step_estimates.append(est)
    step_estimates = jnp.stack(step_estimates)

    np.testing.assert_allclose(
        np.asarray(loop_estimates), np.asarray(step_estimates),
        rtol=2e-4, atol=2e-5,
    )


def test_loop_matches_stepwise_subset_enabled():
    model = DoorTask.model_types["DoorCrossmodalKalmanFilter"]()
    defn = model.definition
    params = model.params
    n, t = 2, 3
    key = jax.random.PRNGKey(1)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    obs_seq, ctrl_seq = _sequence(n, t)
    obs_seq = {k: jnp.asarray(v) for k, v in obs_seq.items()}
    ctrl_seq = jnp.asarray(ctrl_seq)

    belief0 = defn.initialize_beliefs(params, key, mean, cov, train=True)
    _, loop_est = defn.forward_loop(
        params, belief0, obs_seq, ctrl_seq, key, train=True, enabled=(True, False)
    )
    keys = jax.random.split(key, t)
    belief = belief0
    for i in range(t):
        obs_t = {k: v[i] for k, v in obs_seq.items()}
        belief, est = defn.step(
            params, belief, obs_t, ctrl_seq[i], keys[i], train=True,
            enabled=(True, False),
        )
    np.testing.assert_allclose(
        np.asarray(loop_est[-1]), np.asarray(est), rtol=2e-4, atol=2e-5
    )
