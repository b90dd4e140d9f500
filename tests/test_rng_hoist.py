"""Hoisted-RNG forward_loop (pf.py `hoist_rng`): pre-drawing every step's
noise/uniforms in one batched op outside the scan must be BITWISE identical
to the in-scan draws — threefry is counter-based, so the same step keys
produce the same bits batched or not. Covers eval + train, the plain jnp
path, the fused Pallas path (interpret mode), soft resampling, and the
crossmodal fusion measurement model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _inputs(n, t, key_seed=7):
    key = jax.random.PRNGKey(key_seed)
    ks = jax.random.split(key, 5)
    obs = {
        "image": jax.random.normal(ks[0], (t, n, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (t, n, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (t, n, 7)),
    }
    ctrl = jax.random.normal(ks[3], (t, n, 7))
    return obs, ctrl, ks[4]


def _run(defn, params, obs, ctrl, key, train):
    n = ctrl.shape[1]
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    k_init, k_loop = jax.random.split(key)
    belief = defn.initialize_beliefs(params, k_init, mean, cov, train=train)
    final, est = jax.jit(
        lambda p, b: defn.forward_loop(
            p, b, obs, ctrl, k_loop, train=train, enabled=(True, True)
        )
    )(params, belief)
    return final, est


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("pallas", [False, True])
def test_hoist_bitwise_cmpf(train, pallas):
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    model = DoorCrossmodalParticleFilter()
    defn = dataclasses.replace(
        model.definition, num_particles_train=8, num_particles_eval=16,
        pallas_resample=pallas,
    )
    obs, ctrl, key = _inputs(n=2, t=5)
    hoisted = dataclasses.replace(defn, hoist_rng=True)
    inscan = dataclasses.replace(defn, hoist_rng=False)
    fh, eh = _run(hoisted, model.params, obs, ctrl, key, train)
    fi, ei = _run(inscan, model.params, obs, ctrl, key, train)
    np.testing.assert_array_equal(np.asarray(eh), np.asarray(ei))
    np.testing.assert_array_equal(
        np.asarray(fh.particles), np.asarray(fi.particles)
    )
    np.testing.assert_array_equal(
        np.asarray(fh.log_weights), np.asarray(fi.log_weights)
    )


def test_hoist_bitwise_soft_resample():
    from crossmodal.door_models import DoorParticleFilter

    model = DoorParticleFilter()
    defn = dataclasses.replace(
        model.definition, num_particles_eval=16, soft_resample_alpha=0.5
    )
    obs, ctrl, key = _inputs(n=2, t=4, key_seed=3)
    fh, eh = _run(
        dataclasses.replace(defn, hoist_rng=True),
        model.params, obs, ctrl, key, False,
    )
    fi, ei = _run(
        dataclasses.replace(defn, hoist_rng=False),
        model.params, obs, ctrl, key, False,
    )
    np.testing.assert_array_equal(np.asarray(eh), np.asarray(ei))
    np.testing.assert_array_equal(
        np.asarray(fh.log_weights), np.asarray(fi.log_weights)
    )


@pytest.mark.parametrize("train", [False, True])
def test_ctrl_hoist_bitwise(train):
    """Hoisting the dynamics control encoder out of the scan (one (T*N)
    batch, broadcast over M in the body) must match the in-scan per-(N*M)
    encoding bitwise: identical per-row math."""
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    model = DoorCrossmodalParticleFilter()
    defn = dataclasses.replace(
        model.definition, num_particles_train=8, num_particles_eval=16
    )
    obs, ctrl, key = _inputs(n=2, t=5, key_seed=21)
    fh, eh = _run(
        dataclasses.replace(defn, hoist_ctrl=True),
        model.params, obs, ctrl, key, train,
    )
    fi, ei = _run(
        dataclasses.replace(defn, hoist_ctrl=False),
        model.params, obs, ctrl, key, train,
    )
    np.testing.assert_array_equal(np.asarray(eh), np.asarray(ei))
    np.testing.assert_array_equal(
        np.asarray(fh.particles), np.asarray(fi.particles)
    )


def test_dynamics_net_split_matches_call():
    """encode_controls + from_control_features == __call__ (param paths
    unchanged by the setup-style restructure)."""
    from crossmodal.door_models import DoorParticleFilter

    model = DoorParticleFilter()
    dyn = model.definition.dynamics_model
    params = model.params["dynamics_model"]
    assert set(params.keys()) == {
        "control_layers", "state_layers", "shared_dense_in",
        "shared_resblock0", "shared_resblock1", "shared_resblock2",
        "shared_dense_out",
    }
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (6, 3))
    c = jax.random.normal(jax.random.fold_in(key, 1), (6, 7))
    new_a, tril_a = dyn.apply(params, s, c)
    feat = dyn.encode_controls(params, c)
    new_b, tril_b = dyn.apply_with_control_features(params, s, feat)
    np.testing.assert_array_equal(np.asarray(new_a), np.asarray(new_b))
    np.testing.assert_array_equal(np.asarray(tril_a), np.asarray(tril_b))


def test_hoist_bitwise_bf16_compute():
    """The eps dtype probe must reproduce the bf16-mode draw exactly."""
    from crossmodal.door_models import DoorParticleFilter
    from multimodalfilter_tpu.utils.precision import with_compute_dtype

    model = DoorParticleFilter()
    defn = dataclasses.replace(model.definition, num_particles_eval=16)
    defn = with_compute_dtype(defn, jnp.bfloat16)
    obs, ctrl, key = _inputs(n=2, t=3, key_seed=11)
    fh, eh = _run(
        dataclasses.replace(defn, hoist_rng=True),
        model.params, obs, ctrl, key, False,
    )
    fi, ei = _run(
        dataclasses.replace(defn, hoist_rng=False),
        model.params, obs, ctrl, key, False,
    )
    np.testing.assert_array_equal(np.asarray(eh), np.asarray(ei))
