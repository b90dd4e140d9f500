"""MMF_TPU_RBG: RngBitGenerator-backed PRNG for serving (utils/rng.py).

The knob flips the process-default PRNG implementation, so the risk it
carries is non-threefry key arrays (shape (4,) uint32 for rbg) flowing
through forward_loop's key split, the hoisted encoder pass, and the
resampling draws. These tests exercise exactly that on the CPU mesh; the
on-chip latency A/B lives in docs/PERFORMANCE.md.
"""

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossmodal.tasks import DoorTask
from multimodalfilter_tpu.utils.rng import prng_impl_from_env


@contextmanager
def _prng_impl(name):
    old = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", name)
    try:
        yield
    finally:
        jax.config.update("jax_default_prng_impl", old)


def _sequence(n=2, t=6):
    rng = np.random.default_rng(7)

    def arr(*shape):
        return rng.normal(size=shape).astype(np.float32)

    obs = {
        "image": jnp.asarray(arr(t, n, 32, 32)),
        "gripper_pos": jnp.asarray(arr(t, n, 3)),
        "gripper_sensors": jnp.asarray(arr(t, n, 7)),
    }
    return obs, jnp.asarray(arr(t, n, 7))


def _rollout(model, key, train=False):
    defn, params = model.definition, model.params
    n, t = 2, 6
    obs_seq, ctrl_seq = _sequence(n, t)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief0 = defn.initialize_beliefs(params, key, mean, cov, train=train)
    _, est = defn.forward_loop(
        params, belief0, obs_seq, ctrl_seq, key,
        train=train, enabled=model._enabled_tuple,
    )
    return np.asarray(est)


def test_env_parsing():
    assert prng_impl_from_env({"MMF_TPU_RBG": "0"}) is None
    assert prng_impl_from_env({}) is None
    assert prng_impl_from_env({"MMF_TPU_RBG": "1"}) == "rbg"
    assert prng_impl_from_env({"MMF_TPU_RBG": "rbg"}) == "rbg"
    assert prng_impl_from_env({"MMF_TPU_RBG": "unsafe"}) == "unsafe_rbg"
    assert prng_impl_from_env({"MMF_TPU_RBG": "UNSAFE_RBG"}) == "unsafe_rbg"
    with pytest.raises(ValueError):
        prng_impl_from_env({"MMF_TPU_RBG": "fast"})


@pytest.mark.parametrize(
    "name", ["DoorKalmanFilter", "DoorCrossmodalKalmanFilter", "DoorLSTMFilter"]
)
def test_deterministic_filters_bitwise_under_rbg(name):
    """Eval-mode KFs/EKFs/LSTM never materialize key draws into math: the
    rollout must be bitwise-identical whatever PRNG impl the key uses."""
    model = DoorTask.model_types[name]()  # params initialized under threefry
    base = _rollout(model, jax.random.PRNGKey(3))
    with _prng_impl("unsafe_rbg"):
        rbg_key = jax.random.PRNGKey(3)
        assert rbg_key.shape == (4,)  # actually a non-threefry key
        got = _rollout(model, rbg_key)
    np.testing.assert_array_equal(base, got)


@pytest.mark.parametrize("impl", ["rbg", "unsafe_rbg"])
def test_pf_rollout_under_rbg(impl):
    """PF resampling/process-noise draws under rbg: deterministic per key,
    finite, and statistically in-family with the threefry rollout."""
    model = DoorTask.model_types["DoorParticleFilter"]()
    base = _rollout(model, jax.random.PRNGKey(11))
    with _prng_impl(impl):
        a = _rollout(model, jax.random.PRNGKey(11))
        b = _rollout(model, jax.random.PRNGKey(11))
    np.testing.assert_array_equal(a, b)  # same key -> same rollout
    assert np.isfinite(a).all()
    # Different draw stream, same params/obs: estimates move, but stay on
    # the same scale as the threefry rollout (states are z-scored).
    assert np.abs(a - base).max() < 3.0
    assert abs(a.mean() - base.mean()) < 1.0


def test_pf_train_mode_under_rbg():
    """Soft-resampling train path (grads flow through weights) under rbg."""
    model = DoorTask.model_types["DoorParticleFilter"]()
    with _prng_impl("unsafe_rbg"):
        est = _rollout(model, jax.random.PRNGKey(5), train=True)
    assert np.isfinite(est).all()
