"""The fused Pallas PF kernels must match the jnp reference path — bitwise
for the resampling gathers (same uniforms -> same indices), tolerance for the
log-space arithmetic — in interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfilter_tpu.ops.pallas_pf import (
    pf_update_and_resample,
    pf_update_estimate,
)
from multimodalfilter_tpu.ops.resampling import soft_resample


def _inputs(n=3, m=100, d=3):
    key = jax.random.PRNGKey(0)
    particles = jax.random.normal(key, (n, m, d))
    logits = jax.random.normal(jax.random.PRNGKey(1), (n, m))
    lw = logits - jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)
    ll = jax.random.normal(jax.random.PRNGKey(2), (n, m))
    uniforms = jax.random.uniform(jax.random.PRNGKey(3), (n, m))
    return particles, lw, ll, uniforms


def _jnp_update(lw, ll, particles):
    lw_new = lw + ll
    lw_new = lw_new - jax.scipy.special.logsumexp(lw_new, axis=1, keepdims=True)
    est = jnp.einsum("nm,nmd->nd", jnp.exp(lw_new), particles)
    return lw_new, est


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


def test_soft_kernel_matches_reference():
    """Small-M soft-resampling kernel vs ops/resampling.py:soft_resample
    (same uniforms -> same indices -> identical gathered particles)."""
    particles, lw, ll, uniforms = _inputs()
    alpha = 0.7
    p2, lw2, est = pf_update_and_resample(
        lw, ll, particles, uniforms, alpha=alpha, interpret=True
    )

    lw_new, ref_est = _jnp_update(lw, ll, particles)
    np.testing.assert_allclose(np.asarray(est), np.asarray(ref_est), atol=1e-6)

    # soft_resample draws its own uniforms from the key; replicate by patching
    # the sampling through a fixed-uniform variant of the same math.
    probs = jnp.exp(lw_new)
    m = probs.shape[1]
    mixture = alpha * probs + (1.0 - alpha) / m
    log_mixture = jnp.log(mixture)
    cdf = jnp.cumsum(mixture, axis=-1)
    cdf = cdf / cdf[..., -1:]
    idx = jnp.clip(jax.vmap(jnp.searchsorted)(cdf, uniforms), 0, m - 1)
    ref_parts = jnp.take_along_axis(particles, idx[:, :, None], axis=1)
    ref_lw = jnp.take_along_axis(lw_new, idx, axis=1) - jnp.take_along_axis(
        log_mixture, idx, axis=1
    )
    ref_lw = ref_lw - jax.scipy.special.logsumexp(ref_lw, axis=1, keepdims=True)

    np.testing.assert_array_equal(np.asarray(p2), np.asarray(ref_parts))
    np.testing.assert_allclose(np.asarray(lw2), np.asarray(ref_lw), atol=1e-6)


def test_chunked_kernel_multinomial_large_m():
    """M > 1024 dispatches to the chunked kernel; indices must still match
    the jnp inverse-CDF search exactly (fixed seed keeps uniforms away from
    CDF boundaries)."""
    particles, lw, ll, uniforms = _inputs(n=2, m=2048)
    n, m, d = particles.shape
    p2, lw2, est = pf_update_and_resample(lw, ll, particles, uniforms, interpret=True)

    lw_new, ref_est = _jnp_update(lw, ll, particles)
    np.testing.assert_allclose(
        np.asarray(est), np.asarray(ref_est), atol=1e-5
    )
    probs = jnp.exp(lw_new)
    cdf = jnp.cumsum(probs, axis=-1)
    cdf = cdf / cdf[..., -1:]
    idx = jnp.clip(jax.vmap(jnp.searchsorted)(cdf, uniforms), 0, m - 1)
    ref_parts = jnp.take_along_axis(particles, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(ref_parts))
    np.testing.assert_allclose(np.asarray(lw2), -np.log(m), rtol=1e-6)


def test_chunked_kernel_soft_large_m():
    particles, lw, ll, uniforms = _inputs(n=2, m=1536)
    n, m, d = particles.shape
    alpha = 0.5
    p2, lw2, est = pf_update_and_resample(
        lw, ll, particles, uniforms, alpha=alpha, interpret=True
    )

    lw_new, _ = _jnp_update(lw, ll, particles)
    probs = jnp.exp(lw_new)
    mixture = alpha * probs + (1.0 - alpha) / m
    log_mixture = jnp.log(mixture)
    cdf = jnp.cumsum(mixture, axis=-1)
    cdf = cdf / cdf[..., -1:]
    idx = jnp.clip(jax.vmap(jnp.searchsorted)(cdf, uniforms), 0, m - 1)
    ref_parts = jnp.take_along_axis(particles, idx[:, :, None], axis=1)
    ref_lw = jnp.take_along_axis(lw_new, idx, axis=1) - jnp.take_along_axis(
        log_mixture, idx, axis=1
    )
    ref_lw = ref_lw - jax.scipy.special.logsumexp(ref_lw, axis=1, keepdims=True)

    np.testing.assert_array_equal(np.asarray(p2), np.asarray(ref_parts))
    np.testing.assert_allclose(np.asarray(lw2), np.asarray(ref_lw), atol=1e-5)


def test_update_estimate_forward_matches_jnp():
    particles, lw, ll, _ = _inputs()
    lw2, est = pf_update_estimate(lw, ll, particles, True)
    ref_lw, ref_est = _jnp_update(lw, ll, particles)
    np.testing.assert_allclose(np.asarray(lw2), np.asarray(ref_lw), atol=1e-6)
    np.testing.assert_allclose(np.asarray(est), np.asarray(ref_est), atol=1e-6)


def test_update_estimate_grads_match_jnp():
    """The custom-VJP backward kernel must match jax.grad through the jnp
    composite for a loss touching BOTH outputs."""
    particles, lw, ll, _ = _inputs(n=2, m=64)

    def loss_pallas(lw, ll, particles):
        lw2, est = pf_update_estimate(lw, ll, particles, True)
        return jnp.sum(est**2) + jnp.sum(jnp.exp(lw2) * jnp.cos(lw2))

    def loss_jnp(lw, ll, particles):
        lw2, est = _jnp_update(lw, ll, particles)
        return jnp.sum(est**2) + jnp.sum(jnp.exp(lw2) * jnp.cos(lw2))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(lw, ll, particles)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(lw, ll, particles)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _door_pf_inputs(n=2):
    from crossmodal.door_models import DoorParticleFilter

    model = DoorParticleFilter()
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
    return model, key, mean, cov, obs, controls


def test_pf_def_pallas_soft_matches_default():
    """Eval-mode step with soft resampling (alpha < 1): pallas flag on/off
    must agree (same keys)."""
    model, key, mean, cov, obs, controls = _door_pf_inputs()
    base_def = dataclasses.replace(
        model.definition, num_particles_eval=64, soft_resample_alpha=0.8
    )
    pallas_def = dataclasses.replace(base_def, pallas_resample=True)

    belief = base_def.initialize_beliefs(model.params, key, mean, cov, train=False)
    b1, e1 = base_def.step(model.params, belief, obs, controls, key, train=False)
    b2, e2 = pallas_def.step(model.params, belief, obs, controls, key, train=False)

    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(b1.particles), np.asarray(b2.particles)
    )
    np.testing.assert_allclose(
        np.asarray(b1.log_weights), np.asarray(b2.log_weights), atol=1e-5
    )


def test_pf_def_pallas_train_matches_default():
    """Train-mode step AND its gradients with the fused custom-VJP kernel
    must match the default jnp path."""
    model, key, mean, cov, obs, controls = _door_pf_inputs()
    base_def = dataclasses.replace(model.definition, num_particles_train=32)
    pallas_def = dataclasses.replace(base_def, pallas_resample=True)

    belief = base_def.initialize_beliefs(model.params, key, mean, cov, train=True)

    def loss(params, defn):
        _, est = defn.step(params, belief, obs, controls, key, train=True)
        return jnp.mean(est**2)

    l1, g1 = jax.value_and_grad(loss)(model.params, base_def)
    l2, g2 = jax.value_and_grad(loss)(model.params, pallas_def)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0],
        jax.tree_util.tree_flatten_with_path(g2)[0],
    ):
        assert p1 == p2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=f"grad mismatch at {p1}",
        )


def test_env_opt_in_enables_pallas(monkeypatch):
    """MMF_TPU_PALLAS=1 flips pallas_resample on any PF built through the
    StatefulFilter facade (production opt-in; CLAUDE.md)."""
    monkeypatch.setenv("MMF_TPU_PALLAS", "1")
    from crossmodal.door_models import DoorCrossmodalParticleFilter, DoorKalmanFilter

    assert DoorCrossmodalParticleFilter().definition.pallas_resample
    DoorKalmanFilter()  # non-PF defs pass through untouched
    monkeypatch.delenv("MMF_TPU_PALLAS")
    assert not DoorCrossmodalParticleFilter().definition.pallas_resample
