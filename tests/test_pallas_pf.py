"""The fused Pallas PF kernel must match the jnp reference path bitwise
(same uniforms -> same gather) in interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfilter_tpu.ops.pallas_pf import pf_update_and_resample


def _inputs(n=3, m=100, d=3):
    key = jax.random.PRNGKey(0)
    particles = jax.random.normal(key, (n, m, d))
    logits = jax.random.normal(jax.random.PRNGKey(1), (n, m))
    lw = logits - jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)
    ll = jax.random.normal(jax.random.PRNGKey(2), (n, m))
    uniforms = jax.random.uniform(jax.random.PRNGKey(3), (n, m))
    return particles, lw, ll, uniforms


def test_kernel_matches_reference():
    particles, lw, ll, uniforms = _inputs()
    n, m, d = particles.shape
    p2, lw2, est = pf_update_and_resample(lw, ll, particles, uniforms, interpret=True)

    # Reference: normalize, estimate, inverse-CDF gather.
    lw_new = lw + ll
    lw_new = lw_new - jax.scipy.special.logsumexp(lw_new, axis=1, keepdims=True)
    ref_est = jnp.einsum("nm,nmd->nd", jnp.exp(lw_new), particles)
    np.testing.assert_allclose(np.asarray(est), np.asarray(ref_est), atol=1e-6)

    probs = jnp.exp(lw_new)
    cdf = jnp.cumsum(probs, axis=-1)
    cdf = cdf / cdf[..., -1:]
    idx = jnp.clip(jax.vmap(jnp.searchsorted)(cdf, uniforms), 0, m - 1)
    ref_parts = jnp.take_along_axis(particles, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(ref_parts))
    np.testing.assert_allclose(np.asarray(lw2), -np.log(m), rtol=1e-6)


def test_pf_def_pallas_flag_matches_default():
    """A full eval-mode PF step with pallas_resample=True must equal the
    default path exactly (same keys)."""
    from crossmodal.door_models import DoorParticleFilter

    model = DoorParticleFilter()
    base_def = dataclasses.replace(model.definition, num_particles_eval=64)
    pallas_def = dataclasses.replace(base_def, pallas_resample=True)

    n = 2
    key = jax.random.PRNGKey(5)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    rng = np.random.default_rng(0)
    obs = {
        "image": jnp.asarray(rng.normal(size=(n, 32, 32)), jnp.float32),
        "gripper_pos": jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        "gripper_sensors": jnp.asarray(rng.normal(size=(n, 7)), jnp.float32),
    }
    controls = jnp.asarray(rng.normal(size=(n, 7)), jnp.float32)

    belief = base_def.initialize_beliefs(model.params, key, mean, cov, train=False)
    b1, e1 = base_def.step(model.params, belief, obs, controls, key, train=False)
    b2, e2 = pallas_def.step(model.params, belief, obs, controls, key, train=False)

    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(b1.particles), np.asarray(b2.particles), atol=1e-6
    )
