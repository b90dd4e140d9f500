"""Fused whole-trajectory step kernel (ops/pallas_fused_step.py) vs the
scan path: same hoisted RNG stream, so estimates must agree to fp
reassociation tolerance (the concat->dense split + in-kernel reductions
reassociate; tie-level resample draws may flip — same class as the
documented large-M cumsum reassociation, so comparisons are tolerance,
not bitwise)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalfilter_tpu.utils.precision import with_fused_step


def _run(model, fused: bool, *, t=8, n=2, m=50, enabled=None, seed=0):
    defn = dataclasses.replace(model.definition, num_particles_eval=m)
    defn = dataclasses.replace(defn, pallas_resample=True)
    if fused:
        defn = with_fused_step(defn, True)
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    obs_spec = defn.obs_spec
    obs_seq = {
        k: jax.random.normal(ks[0], (t, n) + shape, jnp.float32) * 0.1
        for k, shape in obs_spec
    }
    controls_seq = jax.random.normal(ks[1], (t, n, defn.control_dim)) * 0.1
    d = defn.state_dim
    mean = jnp.zeros((n, d))
    cov = jnp.broadcast_to(jnp.eye(d) * 0.1, (n, d, d))
    belief = defn.initialize_beliefs(model.params, ks[2], mean, cov, train=False)
    kwargs = {} if enabled is None else {"enabled": enabled}
    nb, est = defn.forward_loop(
        model.params, belief, obs_seq, controls_seq, ks[3], train=False,
        **kwargs,
    )
    return nb, est


def _check_model(model, **kw):
    from multimodalfilter_tpu.ops import pallas_fused_step as pfs

    nb_ref, est_ref = _run(model, fused=False, **kw)
    nb_fused, est_fused = _run(model, fused=True, **kw)
    assert pfs.packing_report() is None, pfs.packing_report()
    np.testing.assert_allclose(
        np.asarray(est_fused), np.asarray(est_ref), rtol=2e-4, atol=2e-5
    )
    # Final belief: resampled particle SETS match up to tie-level draw
    # flips — compare weighted means instead of raw particle order.
    pm_ref = np.asarray(nb_ref.particles).mean(axis=1)
    pm_fused = np.asarray(nb_fused.particles).mean(axis=1)
    np.testing.assert_allclose(pm_fused, pm_ref, rtol=2e-3, atol=2e-4)


def test_door_crossmodal_pf_fused_matches_scan():
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    _check_model(DoorCrossmodalParticleFilter())


def test_door_plain_pf_fused_matches_scan():
    from crossmodal.door_models import DoorParticleFilter

    _check_model(DoorParticleFilter())


def test_door_crossmodal_pf_fused_enabled_subset():
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    _check_model(DoorCrossmodalParticleFilter(), enabled=(True, False))
    _check_model(DoorCrossmodalParticleFilter(), enabled=(False, True))


def test_push_crossmodal_pf_fused_matches_scan():
    from crossmodal.push_models import PushCrossmodalParticleFilter

    _check_model(PushCrossmodalParticleFilter())


def test_fused_falls_back_when_unsupported():
    """Soft resampling is unsupported -> scan path runs (and matches the
    plain scan path bitwise, since the fallback IS the scan path)."""
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    from multimodalfilter_tpu.ops import pallas_fused_step as pfs

    model = DoorCrossmodalParticleFilter()
    defn = dataclasses.replace(
        model.definition, num_particles_eval=30, soft_resample_alpha=0.9,
        pallas_resample=True,
    )
    defn_fused = with_fused_step(defn, True)
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    t, n, d = 4, 1, defn.state_dim
    obs_seq = {
        k: jax.random.normal(ks[0], (t, n) + shape) * 0.1
        for k, shape in defn.obs_spec
    }
    ctrl = jax.random.normal(ks[1], (t, n, defn.control_dim)) * 0.1
    mean = jnp.zeros((n, d))
    cov = jnp.broadcast_to(jnp.eye(d) * 0.1, (n, d, d))
    belief = defn.initialize_beliefs(model.params, ks[2], mean, cov, train=False)
    nb_a, est_a = defn.forward_loop(
        model.params, belief, obs_seq, ctrl, ks[3], train=False
    )
    nb_b, est_b = defn_fused.forward_loop(
        model.params, belief, obs_seq, ctrl, ks[3], train=False
    )
    assert pfs.packing_report() == "soft resampling"
    np.testing.assert_array_equal(np.asarray(est_a), np.asarray(est_b))
