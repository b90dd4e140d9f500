"""Device-side sensor-fault injection ops (data/augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfilter_tpu.data.augment import (
    apply_image_blackout,
    apply_sequential_rate,
)


def test_blackout_distribution():
    key = jax.random.PRNGKey(0)
    images = jnp.ones((2000, 8, 8))
    out = apply_image_blackout(key, images, 0.3)
    frame_sums = np.asarray(out).reshape(2000, -1).sum(axis=1)
    dropped = float((frame_sums == 0).mean())
    assert 0.25 < dropped < 0.35  # iid Bernoulli(0.3)
    # Kept frames untouched.
    kept = np.asarray(out)[frame_sums > 0]
    np.testing.assert_array_equal(kept, np.ones_like(kept))


def test_blackout_zero_ratio_identity():
    key = jax.random.PRNGKey(1)
    images = jnp.asarray(np.random.default_rng(0).normal(size=(5, 4, 4)))
    out = apply_image_blackout(key, images, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images))


def test_sequential_rate():
    images = jnp.ones((9, 4, 4))
    out = np.asarray(apply_sequential_rate(images, rate=3))
    sums = out.reshape(9, -1).sum(axis=1)
    np.testing.assert_array_equal(sums > 0, np.arange(9) % 3 == 0)
