"""with_compute_dtype: rebuilds def trees with bf16 encoder compute; outputs
stay fp32 and close to the fp32 reference."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfilter_tpu.utils.precision import with_compute_dtype


def test_with_compute_dtype_rebuilds_and_stays_close():
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    model = DoorCrossmodalParticleFilter()
    defn16 = with_compute_dtype(model.definition, jnp.bfloat16)

    # All nets with a dtype field got it set.
    mm16 = defn16.measurement_model
    assert mm16.measurement_models[0].net.dtype == jnp.bfloat16
    assert mm16.crossmodal_weight_model.net.dtype == jnp.bfloat16
    # Original untouched.
    assert model.definition.measurement_model.measurement_models[0].net.dtype is None

    rng = np.random.default_rng(0)
    n = 2
    obs = {
        "image": jnp.asarray(rng.normal(size=(n, 32, 32)), jnp.float32),
        "gripper_pos": jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        "gripper_sensors": jnp.asarray(rng.normal(size=(n, 7)), jnp.float32),
    }
    controls = jnp.asarray(rng.normal(size=(n, 7)), jnp.float32)
    key = jax.random.PRNGKey(0)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))

    belief = model.definition.initialize_beliefs(
        model.params, key, mean, cov, train=True
    )
    _, est32 = model.definition.step(
        model.params, belief, obs, controls, key, train=True
    )
    _, est16 = defn16.step(model.params, belief, obs, controls, key, train=True)
    assert est16.dtype == jnp.float32
    # Same params, bf16 encoder compute: close but not identical.
    np.testing.assert_allclose(
        np.asarray(est32), np.asarray(est16), rtol=0.15, atol=0.05
    )


def test_with_scan_unroll_kf_bitwise_pf_close():
    """with_scan_unroll: forward_loop unrolling keeps deterministic filters
    BITWISE-identical and PF estimates within tie-flip tolerance (cross-step
    fp reassociation can flip a tie-level resample draw — see
    ParticleFilterDef.scan_unroll). Serving knob MMF_TPU_SCAN_UNROLL."""
    import dataclasses

    from crossmodal.door_models import (
        DoorCrossmodalParticleFilter,
        DoorKalmanFilter,
    )
    from multimodalfilter_tpu.utils.precision import with_scan_unroll

    rng = np.random.default_rng(1)
    t, n = 12, 2
    obs = {
        "image": jnp.asarray(rng.normal(size=(t, n, 32, 32)), jnp.float32),
        "gripper_pos": jnp.asarray(rng.normal(size=(t, n, 3)), jnp.float32),
        "gripper_sensors": jnp.asarray(rng.normal(size=(t, n, 7)), jnp.float32),
    }
    ctrl = jnp.asarray(rng.normal(size=(t, n, 7)), jnp.float32)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    key = jax.random.PRNGKey(3)

    def run(defn, params):
        belief = defn.initialize_beliefs(params, key, mean, cov, train=False)
        _, est = jax.jit(
            lambda p, b: defn.forward_loop(
                p, b, obs, ctrl, key, train=False, enabled=(True, True)
            )
        )(params, belief)
        return np.asarray(est)

    kf = DoorKalmanFilter()
    est1 = run(kf.definition, kf.params)
    est4 = run(with_scan_unroll(kf.definition, 4), kf.params)
    assert with_scan_unroll(kf.definition, 4).scan_unroll == 4
    np.testing.assert_array_equal(est1, est4)  # deterministic: bitwise

    pf = DoorCrossmodalParticleFilter()
    defn = dataclasses.replace(pf.definition, num_particles_eval=25)
    est1 = run(defn, pf.params)
    est4 = run(with_scan_unroll(defn, 4), pf.params)
    np.testing.assert_allclose(est1, est4, rtol=1e-3, atol=1e-3)
