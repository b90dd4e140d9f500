"""Hoisted-control-features EKF forward_loop (ekf.py `hoist_ctrl`): running
the dynamics control encoder once over all T*N rows outside the scan must be
BITWISE identical to the in-scan per-step passes — the control branch carries
no jacfwd tangents either way, and batched matmul rows reduce over the
feature axis only. Covers the plain virtual-sensor EKF, the crossmodal KF
(gate fusion), the unimodal KF, and the measurement-fusion variants, in eval
and (gradient) train modes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalfilter_tpu.utils.precision import with_hoist_ctrl


def _inputs(n, t, key_seed=11):
    key = jax.random.PRNGKey(key_seed)
    ks = jax.random.split(key, 5)
    obs = {
        "image": jax.random.normal(ks[0], (t, n, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (t, n, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (t, n, 7)),
    }
    ctrl = jax.random.normal(ks[3], (t, n, 7))
    return obs, ctrl, ks[4]


def _run(defn, params, obs, ctrl, key, train=False):
    n = ctrl.shape[1]
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    k_init, k_loop = jax.random.split(key)
    belief = defn.initialize_beliefs(params, k_init, mean, cov, train=train)
    final, est = jax.jit(
        lambda p, b: defn.forward_loop(
            p, b, obs, ctrl, k_loop, train=train
        )
    )(params, belief)
    return final, est


MODELS = [
    "DoorKalmanFilter",
    "DoorCrossmodalKalmanFilter",
    "DoorUnimodalKalmanFilter",
    "DoorMeasurementCrossmodalKalmanFilter",
    "DoorMeasurementUnimodalKalmanFilter",
]


@pytest.mark.parametrize("model_name", MODELS)
def test_ekf_hoist_bitwise(model_name):
    import crossmodal.door_models as door_models

    model = getattr(door_models, model_name)()
    obs, ctrl, key = _inputs(n=2, t=5)
    hoisted = with_hoist_ctrl(model.definition, True)
    inscan = with_hoist_ctrl(model.definition, False)
    fh, eh = _run(hoisted, model.params, obs, ctrl, key)
    fi, ei = _run(inscan, model.params, obs, ctrl, key)
    np.testing.assert_array_equal(np.asarray(eh), np.asarray(ei))
    for lh, li in zip(
        jax.tree_util.tree_leaves(fh), jax.tree_util.tree_leaves(fi)
    ):
        np.testing.assert_array_equal(np.asarray(lh), np.asarray(li))


def test_ekf_hoist_gradients_match():
    """BPTT through the hoisted loop: gradients agree with the in-scan
    path (same math graph reassociated only at the batching level — exact
    equality is not guaranteed through the conv stack, so allclose)."""
    from crossmodal.door_models import DoorKalmanFilter

    model = DoorKalmanFilter()
    obs, ctrl, key = _inputs(n=2, t=4)
    target = jax.random.normal(jax.random.PRNGKey(3), (4, 2, 3))

    def loss(defn, params):
        _, est = _run(defn, params, obs, ctrl, key, train=True)
        return jnp.mean((est - target) ** 2)

    gh = jax.grad(lambda p: loss(with_hoist_ctrl(model.definition, True), p))(
        model.params
    )
    gi = jax.grad(
        lambda p: loss(with_hoist_ctrl(model.definition, False), p)
    )(model.params)
    for lh, li in zip(
        jax.tree_util.tree_leaves(gh), jax.tree_util.tree_leaves(gi)
    ):
        np.testing.assert_allclose(
            np.asarray(lh), np.asarray(li), rtol=1e-5, atol=1e-6
        )


def test_dynamics_rollout_hoist_bitwise():
    """DynamicsDef.forward_loop (eval_dynamics / train_dynamics_recurrent
    rollout): hoisted control features must be bitwise vs the in-scan
    path, forward and gradient."""
    from crossmodal.door_models import DoorKalmanFilter

    model = DoorKalmanFilter()
    dyn = model.definition.dynamics_model
    dyn_params = model.params["dynamics_model"]
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 3)
    init = jax.random.normal(ks[0], (3, 3))
    ctrl = jax.random.normal(ks[1], (6, 3, 7))
    target = jax.random.normal(ks[2], (6, 3, 3))

    hoisted = dataclasses.replace(dyn, hoist_ctrl=True)
    inscan = dataclasses.replace(dyn, hoist_ctrl=False)
    sh, th = jax.jit(lambda p: hoisted.forward_loop(p, init, ctrl))(dyn_params)
    si, ti = jax.jit(lambda p: inscan.forward_loop(p, init, ctrl))(dyn_params)
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(si))
    np.testing.assert_array_equal(np.asarray(th), np.asarray(ti))

    def loss(d, p):
        pred, _ = d.forward_loop(p, init, ctrl)
        return jnp.mean((pred - target) ** 2)

    gh = jax.grad(lambda p: loss(hoisted, p))(dyn_params)
    gi = jax.grad(lambda p: loss(inscan, p))(dyn_params)
    for lh, li in zip(
        jax.tree_util.tree_leaves(gh), jax.tree_util.tree_leaves(gi)
    ):
        np.testing.assert_allclose(
            np.asarray(lh), np.asarray(li), rtol=1e-6, atol=1e-7
        )


def test_ekf_hoist_default_on():
    from crossmodal.door_models import DoorKalmanFilter

    defn = DoorKalmanFilter().definition
    assert defn.hoist_ctrl
    assert defn.dynamics_model.supports_control_hoist


@pytest.mark.parametrize("hoist", [True, False])
@pytest.mark.parametrize(
    "model_name", ["DoorCrossmodalKalmanFilter", "DoorUnimodalKalmanFilter"]
)
def test_stacked_children_bitwise(model_name, hoist):
    """`stack_children` (one vmapped child update per scan step) must be
    bitwise vs the per-child Python loop, with and without the control
    hoist — both fusion semantics (crossmodal write-back carry, unimodal
    independent stacked carries)."""
    import crossmodal.door_models as door_models

    model = getattr(door_models, model_name)()
    obs, ctrl, key = _inputs(n=2, t=5)
    base = with_hoist_ctrl(model.definition, hoist)
    stacked = dataclasses.replace(base, stack_children=True)
    looped = dataclasses.replace(base, stack_children=False)
    fs, es = _run(stacked, model.params, obs, ctrl, key)
    fl, el = _run(looped, model.params, obs, ctrl, key)
    np.testing.assert_array_equal(np.asarray(es), np.asarray(el))
    for lh, li in zip(
        jax.tree_util.tree_leaves(fs), jax.tree_util.tree_leaves(fl)
    ):
        np.testing.assert_array_equal(np.asarray(lh), np.asarray(li))


def test_cmkf_stacked_children_gate():
    """The stacked path requires >1 enabled structurally-identical children;
    an enabled subset of one falls back to the loop and still matches the
    explicitly-unstacked def."""
    from crossmodal.door_models import DoorCrossmodalKalmanFilter

    model = DoorCrossmodalKalmanFilter()
    obs, ctrl, key = _inputs(n=2, t=4)
    n = ctrl.shape[1]
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    k_init, k_loop = jax.random.split(key)
    for enabled in [(True, False), (False, True)]:
        outs = []
        for stack in (True, False):
            defn = dataclasses.replace(model.definition, stack_children=stack)
            belief = defn.initialize_beliefs(
                model.params, k_init, mean, cov, train=False
            )
            _, est = jax.jit(
                lambda p, b, d=defn: d.forward_loop(
                    p, b, obs, ctrl, k_loop, train=False, enabled=enabled
                )
            )(model.params, belief)
            outs.append(np.asarray(est))
        np.testing.assert_array_equal(outs[0], outs[1])
