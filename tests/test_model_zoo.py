"""Model zoo tests: all 21 reference model classes instantiate, register in
the task registries, and run a filter step / loop with correct shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import crossmodal
from crossmodal.tasks import DoorTask, PushTask
from multimodalfilter_tpu.filtering.wrappers import (
    ModuleHandle,
    freeze_module,
    unfreeze_module,
)

DOOR_MODEL_NAMES = {
    "DoorCrossmodalKalmanFilter",
    "DoorCrossmodalParticleFilter",
    "DoorCrossmodalParticleFilterSeq5",
    "DoorKalmanFilter",
    "DoorLSTMFilter",
    "DoorMeasurementCrossmodalKalmanFilter",
    "DoorMeasurementUnimodalKalmanFilter",
    "DoorParticleFilter",
    "DoorUnimodalKalmanFilter",
    "DoorUnimodalParticleFilter",
}

PUSH_MODEL_NAMES = {
    "PushCrossmodalKalmanFilter",
    "PushCrossmodalParticleFilter",
    "PushCrossmodalParticleFilterSeq5",
    "PushKalmanFilter",
    "PushLSTMFilter",
    "PushMeasurementCrossmodalKalmanFilter",
    "PushMeasurementUnimodalKalmanFilter",
    "PushParticleFilter",
    "PushUnimodalKalmanFilter",
    "PushUnimodalParticleFilter",
}


def _dummy_batch(n, t=None, control_dim=7):
    rng = np.random.default_rng(0)

    def arr(*shape):
        return rng.normal(size=shape).astype(np.float32)

    lead = (t, n) if t else (n,)
    obs = {
        "image": arr(*lead, 32, 32),
        "gripper_pos": arr(*lead, 3),
        "gripper_sensors": arr(*lead, 7),
    }
    controls = arr(*lead, control_dim)
    return obs, controls


def test_registries_complete():
    assert DOOR_MODEL_NAMES <= set(DoorTask.model_types.keys())
    assert PUSH_MODEL_NAMES <= set(PushTask.model_types.keys())
    # Registries are task-local (reference tasks/_task.py:15-28).
    assert not (DOOR_MODEL_NAMES & set(PushTask.model_types.keys()))


@pytest.mark.parametrize("name", sorted(DOOR_MODEL_NAMES))
def test_door_model_smoke(name):
    model = DoorTask.model_types[name]()
    n, state_dim = 2, 3
    model.train()
    mean = np.zeros((n, state_dim), np.float32)
    cov = np.tile(np.eye(state_dim, dtype=np.float32) * 0.1, (n, 1, 1))
    model.initialize_beliefs(mean=mean, covariance=cov)
    obs, controls = _dummy_batch(n)
    est = model.forward(observations=obs, controls=controls)
    assert est.shape == (n, state_dim)
    assert np.all(np.isfinite(np.asarray(est)))

    # Short forward_loop.
    obs_seq, controls_seq = _dummy_batch(n, t=3)
    model.initialize_beliefs(mean=mean, covariance=cov)
    est_seq = model.forward_loop(observations=obs_seq, controls=controls_seq)
    assert est_seq.shape == (3, n, state_dim)
    assert np.all(np.isfinite(np.asarray(est_seq)))


@pytest.mark.parametrize(
    "name", sorted(PUSH_MODEL_NAMES - {"PushCrossmodalParticleFilterSeq5"})
)
def test_push_model_smoke(name):
    model = PushTask.model_types[name]()
    n, state_dim = 2, 2
    model.eval()
    mean = np.zeros((n, state_dim), np.float32)
    cov = np.tile(np.eye(state_dim, dtype=np.float32) * 0.1, (n, 1, 1))
    model.initialize_beliefs(mean=mean, covariance=cov)
    obs, controls = _dummy_batch(n)
    est = model.forward(observations=obs, controls=controls)
    assert est.shape == (n, state_dim)
    assert np.all(np.isfinite(np.asarray(est)))


def test_pf_particle_counts_by_mode():
    model = DoorTask.model_types["DoorParticleFilter"]()
    n = 2
    mean = np.zeros((n, 3), np.float32)
    cov = np.tile(np.eye(3, dtype=np.float32) * 0.1, (n, 1, 1))
    model.train()
    model.initialize_beliefs(mean=mean, covariance=cov)
    assert model.belief.particles.shape[1] == 30
    model.eval()
    model.initialize_beliefs(mean=mean, covariance=cov)
    assert model.belief.particles.shape[1] == 300


def test_enabled_models_and_handles():
    model = DoorTask.model_types["DoorCrossmodalParticleFilter"]()
    mm = model.measurement_model
    assert isinstance(mm, ModuleHandle)
    assert mm.enabled_models == [True, True]
    mm.enabled_models = [True, False]
    assert model.enabled_models == [True, False]

    # Handle paths address the params pytree.
    dyn = model.dynamics_model
    assert dyn.path == "dynamics_model"
    assert "shared_dense_in" in dyn.params
    gate = mm.crossmodal_weight_model
    assert gate.path == "measurement_model.crossmodal_weight_model"

    # Filter still runs with one modality disabled.
    n = 2
    model.train()
    mean = np.zeros((n, 3), np.float32)
    cov = np.tile(np.eye(3, dtype=np.float32) * 0.1, (n, 1, 1))
    model.initialize_beliefs(mean=mean, covariance=cov)
    obs, controls = _dummy_batch(n)
    est = model.forward(observations=obs, controls=controls)
    assert est.shape == (n, 3)


def test_crossmodal_kf_child_handles():
    model = DoorTask.model_types["DoorCrossmodalKalmanFilter"]()
    image_model = model.filter_models[0]
    assert image_model.path == "filter_models.0"
    assert image_model.dynamics_model.path == "filter_models.0.dynamics_model"
    freeze_module(model.crossmodal_weight_model)
    assert "crossmodal_weight_model" in model.frozen_paths
    unfreeze_module(model.crossmodal_weight_model)
    assert "crossmodal_weight_model" not in model.frozen_paths
    freeze_module(model.filter_models)
    assert "filter_models" in model.frozen_paths


def test_know_image_blackout_pf():
    """Blackout frames must force the image modality's gate weight to -inf
    equivalent (door crossmodal_pf.py:98-104)."""
    model = DoorTask.model_types["DoorCrossmodalParticleFilterSeq5"]()
    assert model.know_image_blackout
    defn = model.definition.measurement_model.crossmodal_weight_model
    params = model.params["measurement_model"]["crossmodal_weight_model"]
    n = 2
    obs, _ = _dummy_batch(n)
    obs["image"] = np.zeros_like(obs["image"])  # all-blackout
    lw = defn.log_weights(params, {k: jnp.asarray(v) for k, v in obs.items()})
    assert np.all(np.asarray(lw[:, 0]) < -1e8)

    obs2, _ = _dummy_batch(n)
    lw2 = defn.log_weights(params, {k: jnp.asarray(v) for k, v in obs2.items()})
    assert np.all(np.asarray(lw2[:, 0]) > -1e8)


def test_know_image_blackout_setter():
    model = DoorTask.model_types["DoorCrossmodalParticleFilter"]()
    assert not model.know_image_blackout
    model.know_image_blackout = True
    assert model.know_image_blackout
    assert model.definition.measurement_model.crossmodal_weight_model.know_image_blackout

    kf = DoorTask.model_types["DoorCrossmodalKalmanFilter"]()
    kf.know_image_blackout = True
    assert kf.definition.know_image_blackout


def test_measurement_initialize_paths():
    """measurement_initialize_beliefs: EKF (z, R), crossmodal KF (weighted
    fusion — crossmodal_kf.py:208-240), unimodal KF (per-child init)."""
    for name in (
        "DoorKalmanFilter",
        "DoorCrossmodalKalmanFilter",
        "DoorUnimodalKalmanFilter",
    ):
        model = DoorTask.model_types[name]()
        obs, _ = _dummy_batch(2)
        model.measurement_initialize_beliefs(obs)
        belief = model.belief
        leaves = jax.tree_util.tree_leaves(belief)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves), name
        # Filter runs from the measurement-initialized belief.
        obs2, controls = _dummy_batch(2)
        est = model.forward(observations=obs2, controls=controls)
        assert est.shape == (2, 3)


def test_weight_normalization():
    """KF gate weights sum to ~1 over modalities (crossmodal_kf.py:165)."""
    model = DoorTask.model_types["DoorCrossmodalKalmanFilter"]()
    defn = model.definition.crossmodal_weight_model
    params = model.params["crossmodal_weight_model"]
    obs, _ = _dummy_batch(3)
    w = defn.apply(params, {k: jnp.asarray(v) for k, v in obs.items()})
    assert w.shape == (2, 3, 3)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=0)), 1.0, atol=1e-4)
