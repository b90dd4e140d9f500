"""Folded image-encoder tail (models/encoders.py::_fold_tail_weights).

conv3 -> [dual spanning avg-pool] -> flatten -> dense has no intervening
nonlinearity (reference door layers.py:43-63 / push layers.py:68-104), so
the composition into one matmul is mathematically exact — these tests pin
the fp-reassociation error to ~1e-5 and prove parameter-structure
compatibility (same checkpoint drives both modes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalfilter_tpu.models.encoders import ImageEncoder
from multimodalfilter_tpu.utils.precision import with_fold_tail


@pytest.mark.parametrize("spanning", [False, True])
def test_fold_matches_unfolded(spanning):
    key = jax.random.PRNGKey(0)
    enc = ImageEncoder(64, spanning_avg_pool=spanning)
    enc_folded = ImageEncoder(64, spanning_avg_pool=spanning, fold_tail=True)
    x = jax.random.normal(key, (8, 32, 32))
    params = enc.init(key, x)
    y0 = enc.apply(params, x)
    y1 = enc_folded.apply(params, x)
    assert y0.shape == y1.shape == (8, 64)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5, rtol=2e-5)


def test_fold_param_structure_identical():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 32, 32))
    p0 = ImageEncoder(64).init(key, x)
    p1 = ImageEncoder(64, fold_tail=True).init(key, x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        assert a.shape == b.shape


def test_fold_gradients_flow():
    key = jax.random.PRNGKey(2)
    enc = ImageEncoder(32, fold_tail=True)
    x = jax.random.normal(key, (4, 32, 32))
    params = ImageEncoder(32).init(key, x)

    def loss(p):
        return enc.apply(p, x).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(v).all()) for v in leaves)
    # conv3 + dense grads must be nonzero (they feed the folded matmul).
    gp = g["params"]
    assert float(jnp.abs(gp["conv3"]["kernel"]).max()) > 0
    assert float(jnp.abs(gp["dense"]["kernel"]).max()) > 0


def test_with_fold_tail_on_filter_def():
    """with_fold_tail flips the flag on every ImageEncoder in a full filter
    def, and the resulting filter runs + stays close to the unfolded one."""
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    model = DoorCrossmodalParticleFilter()
    defn = model.definition
    folded = with_fold_tail(defn, True)

    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    n, t = 3, 4
    obs = {
        "image": jax.random.normal(ks[0], (t, n, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (t, n, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (t, n, 7)),
    }
    controls = jax.random.normal(ks[3], (t, n, 7))
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(model.params, ks[4], mean, cov, train=False)

    _, est0 = defn.forward_loop(
        model.params, belief, obs, controls, key, train=False, enabled=(True, True)
    )
    _, est1 = folded.forward_loop(
        model.params, belief, obs, controls, key, train=False, enabled=(True, True)
    )
    # Same PRNG stream; particles diverge only through the ~1e-5 feature
    # reassociation feeding the measurement weights.
    np.testing.assert_allclose(np.asarray(est0), np.asarray(est1), atol=1e-3)
