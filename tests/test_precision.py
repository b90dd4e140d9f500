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
