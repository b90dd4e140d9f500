"""Multi-instance encoder stacking (models/stacked.py + fusion injection).

The channel-stacked pass must be numerically the same encoder math (grouped
convs are block-diagonal; fp reassociation only), param-structure-neutral,
config-gated (mixed architectures fall back), differentiable, and wired
through the MMF_TPU_STACK_ENC / MMF_TPU_SERVING knobs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalfilter_tpu.models.encoders import ImageEncoder
from multimodalfilter_tpu.models.stacked import (
    encoder_stack_config,
    stacked_image_features,
)

rng = np.random.default_rng(7)


def _make_encoders(k, units=64, spanning=False, dtype=None, fold=False):
    encs, params = [], []
    for i in range(k):
        enc = ImageEncoder(
            units, spanning_avg_pool=spanning, dtype=dtype, fold_tail=fold
        )
        p = enc.init(jax.random.PRNGKey(100 + i), jnp.zeros((1, 32, 32)))[
            "params"
        ]
        encs.append(enc)
        params.append(p)
    return encs, params


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("spanning", [False, True])
@pytest.mark.parametrize("fold", [False, True])
def test_stacked_matches_individual(k, spanning, fold):
    encs, params = _make_encoders(k, spanning=spanning, fold=fold)
    images = jnp.asarray(rng.standard_normal((5, 32, 32)), jnp.float32)
    stacked = stacked_image_features(
        params, images, spanning_avg_pool=spanning, fold_tail=fold
    )
    assert len(stacked) == k
    for enc, p, feat in zip(encs, params, stacked):
        ref = enc.apply({"params": p}, images)
        np.testing.assert_allclose(
            np.asarray(feat), np.asarray(ref), atol=2e-5, rtol=2e-5
        )


def test_stacked_bf16_matches_individual_bf16():
    encs, params = _make_encoders(2, dtype=jnp.bfloat16, fold=True)
    images = jnp.asarray(rng.standard_normal((4, 32, 32)), jnp.float32)
    stacked = stacked_image_features(
        params, images, dtype=jnp.bfloat16, fold_tail=True
    )
    for enc, p, feat in zip(encs, params, stacked):
        ref = enc.apply({"params": p}, images)
        assert feat.dtype == ref.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(feat, np.float32), np.asarray(ref, np.float32),
            atol=0.15, rtol=0.1,
        )


def test_stacked_grads_match_individual():
    """The stacked pass is an exact execution transform, so param grads
    through it match per-encoder grads."""
    encs, params = _make_encoders(2)
    images = jnp.asarray(rng.standard_normal((3, 32, 32)), jnp.float32)

    def loss_stacked(ps):
        feats = stacked_image_features(ps, images)
        return sum(jnp.sum(f**2) for f in feats)

    def loss_individual(ps):
        return sum(
            jnp.sum(enc.apply({"params": p}, images) ** 2)
            for enc, p in zip(encs, ps)
        )

    gs = jax.grad(loss_stacked)(params)
    gi = jax.grad(loss_individual)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gi)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        )


def _door_obs(key, n):
    ks = jax.random.split(key, 3)
    return {
        "image": jax.random.normal(ks[0], (n, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (n, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (n, 7)),
    }


def _door_obs_seq(key, t, n):
    ks = jax.random.split(key, 3)
    return {
        "image": jax.random.normal(ks[0], (t, n, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (t, n, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (t, n, 7)),
    }


def _stacked_def(defn):
    from multimodalfilter_tpu.utils.precision import with_stacked_encoders

    return with_stacked_encoders(defn, True)


def test_cmpf_stacked_matches_unstacked():
    """Crossmodal PF: the image measurement model's encoder + the gate's
    stack; log-likelihoods and hoisted features match the per-instance
    path."""
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    model = DoorCrossmodalParticleFilter()
    defn = model.definition
    mm = defn.measurement_model
    mm_stacked = _stacked_def(mm)
    assert mm_stacked.stack_image_encoders

    params = model.params["measurement_model"]
    key = jax.random.PRNGKey(11)
    obs = _door_obs(key, n=6)
    states = jax.random.normal(jax.random.fold_in(key, 1), (6, 10, 3))

    ll_ref = mm.log_likelihoods(params, states, obs)
    ll_st = mm_stacked.log_likelihoods(params, states, obs)
    np.testing.assert_allclose(
        np.asarray(ll_st), np.asarray(ll_ref), atol=1e-4, rtol=1e-4
    )

    f_ref = mm.encode_observations(params, obs)
    f_st = mm_stacked.encode_observations(params, obs)
    assert set(f_ref.keys()) == set(f_st.keys())
    for k in f_ref:
        for a, b in zip(
            jax.tree_util.tree_leaves(f_st[k]),
            jax.tree_util.tree_leaves(f_ref[k]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )


def test_cmekf_stacked_matches_unstacked():
    """Crossmodal KF: the image child's virtual-sensor encoder + the gate's
    stack in both step and the hoisted forward_loop."""
    from crossmodal.door_models import DoorCrossmodalKalmanFilter

    model = DoorCrossmodalKalmanFilter()
    defn = model.definition
    defn_st = _stacked_def(defn)
    assert defn_st.stack_image_encoders

    key = jax.random.PRNGKey(12)
    t, n = 6, 4
    obs_seq = _door_obs_seq(key, t, n)
    controls = jax.random.normal(jax.random.fold_in(key, 2), (t, n, 7))
    mean0 = jnp.zeros((n, 3))
    cov0 = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(model.params, key, mean0, cov0, train=False)

    bel_ref, est_ref = defn.forward_loop(
        model.params, belief, obs_seq, controls, key, train=False
    )
    bel_st, est_st = defn_st.forward_loop(
        model.params, belief, obs_seq, controls, key, train=False
    )
    np.testing.assert_allclose(
        np.asarray(est_st), np.asarray(est_ref), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bel_st.cov), np.asarray(bel_ref.cov), atol=1e-4
    )

    obs0 = {k: v[0] for k, v in obs_seq.items()}
    _, step_ref = defn.step(
        model.params, belief, obs0, controls[0], None, train=False
    )
    _, step_st = defn_st.step(
        model.params, belief, obs0, controls[0], None, train=False
    )
    np.testing.assert_allclose(
        np.asarray(step_st), np.asarray(step_ref), atol=1e-4, rtol=1e-4
    )

    # Disabled-subset path (no gate -> single image encoder): must fall back
    # and still agree.
    _, sub_ref = defn.step(
        model.params, belief, obs0, controls[0], None, train=False,
        enabled=(True, False),
    )
    _, sub_st = defn_st.step(
        model.params, belief, obs0, controls[0], None, train=False,
        enabled=(True, False),
    )
    np.testing.assert_allclose(np.asarray(sub_st), np.asarray(sub_ref), atol=1e-5)


def test_measurement_cmekf_stacked_matches_unstacked():
    """Measurement-fusion KF: CrossmodalVirtualSensorDef stacks the image
    virtual sensor with the gate."""
    from crossmodal.door_models import DoorMeasurementCrossmodalKalmanFilter

    model = DoorMeasurementCrossmodalKalmanFilter()
    defn = model.definition
    defn_st = _stacked_def(defn)
    assert defn_st.virtual_sensor_model.stack_image_encoders

    key = jax.random.PRNGKey(13)
    obs = _door_obs(key, n=5)
    z_ref, tril_ref = defn.virtual_sensor_model.apply(
        model.params["virtual_sensor_model"], obs
    )
    z_st, tril_st = defn_st.virtual_sensor_model.apply(
        model.params["virtual_sensor_model"], obs
    )
    np.testing.assert_allclose(np.asarray(z_st), np.asarray(z_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tril_st), np.asarray(tril_ref), atol=1e-4
    )


def test_mixed_configs_fall_back():
    """Participants with different encoder architectures must not stack."""
    from multimodalfilter_tpu.models import LogLikelihoodNet, PFWeightNet

    a = LogLikelihoodNet(3, ("image",), units=64, spanning_avg_pool=True)
    b = PFWeightNet(units=64)  # flatten variant -> different architecture
    assert encoder_stack_config(a.obs_encoders if False else a) != (
        encoder_stack_config(b)
    )
    from multimodalfilter_tpu.filtering.fusion import _stacked_image_injection

    # Signature mismatch -> injection declines.
    assert _stacked_image_injection(
        [("0", a, {}), ("_gate", b, {})], {"image": jnp.zeros((2, 32, 32))}
    ) is None


def test_serving_switch_composes_stack(monkeypatch):
    """MMF_TPU_SERVING=1 applies the full serving stack (Pallas+bf16+fold —
    stacked encoders are excluded: measured TPU regression, see
    docs/PERFORMANCE.md) via the def-tree rewrites, and the composed
    rewrite equals the hand-stacked one; per-knob envs override
    individually."""
    from crossmodal.door_models import DoorCrossmodalParticleFilter
    from multimodalfilter_tpu.utils.precision import (
        with_compute_dtype,
        with_fold_tail,
    )

    monkeypatch.setenv("MMF_TPU_SERVING", "1")
    model = DoorCrossmodalParticleFilter()
    defn = model.definition
    assert defn.pallas_resample
    # Stacking is NOT in the serving default (measured regression)...
    assert not defn.measurement_model.stack_image_encoders
    mm_net = defn.measurement_model.measurement_models[0].net
    assert mm_net.dtype == jnp.bfloat16
    assert mm_net.fold_tail

    # The env-composed def equals applying the rewrites by hand.
    monkeypatch.delenv("MMF_TPU_SERVING")
    plain = DoorCrossmodalParticleFilter().definition
    import dataclasses

    hand = dataclasses.replace(plain, pallas_resample=True)
    hand = with_compute_dtype(hand, jnp.bfloat16)
    hand = with_fold_tail(hand, True)
    assert hand == defn

    # ...but the explicit env still enables it on top of serving.
    monkeypatch.setenv("MMF_TPU_SERVING", "1")
    monkeypatch.setenv("MMF_TPU_STACK_ENC", "1")
    stacked = DoorCrossmodalParticleFilter().definition
    assert stacked.measurement_model.stack_image_encoders
    monkeypatch.delenv("MMF_TPU_STACK_ENC")

    # Individual override: serving minus bf16.
    monkeypatch.setenv("MMF_TPU_BF16", "0")
    model2 = DoorCrossmodalParticleFilter()
    net2 = model2.definition.measurement_model.measurement_models[0].net
    assert net2.dtype is None
    assert net2.fold_tail
    assert model2.definition.pallas_resample


def test_serving_stack_rollout_matches_plain():
    """End-to-end: a full serving-stack rollout (stack+fold, fp32) matches
    the plain fp32 rollout within encoder-reassociation tolerance."""
    from crossmodal.door_models import DoorCrossmodalParticleFilter
    from multimodalfilter_tpu.utils.precision import (
        with_fold_tail,
        with_stacked_encoders,
    )

    model = DoorCrossmodalParticleFilter()
    defn = model.definition
    defn_st = with_stacked_encoders(with_fold_tail(defn, True), True)

    key = jax.random.PRNGKey(14)
    t, n = 6, 4
    obs_seq = _door_obs_seq(key, t, n)
    controls = jax.random.normal(jax.random.fold_in(key, 2), (t, n, 7))
    mean0 = jnp.zeros((n, 3))
    cov0 = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(model.params, key, mean0, cov0, train=False)

    _, est_ref = defn.forward_loop(
        model.params, belief, obs_seq, controls, key, train=False
    )
    _, est_st = defn_st.forward_loop(
        model.params, belief, obs_seq, controls, key, train=False
    )
    # Same resampling decisions (particle indices are argmax-stable under
    # ~1e-6 feature reassociation at these scales) -> tight estimates.
    np.testing.assert_allclose(
        np.asarray(est_st), np.asarray(est_ref), atol=5e-4, rtol=5e-4
    )


def test_training_strips_serving_transforms(monkeypatch, tmp_path):
    """Training programs strip the serving execution transforms — the
    folded tail and stacked encoders (param-identical forward rewrites) AND
    the bf16 compute dtype (a numerics change): a model built under the
    full MMF_TPU_SERVING=1 switch trains BITWISE identically to a
    plain-built model — so leaving the switch on across a train+eval CLI
    run cannot regress or perturb training (round-2 verdict next #6). The
    one knob NOT stripped is the Pallas fused train kernel (a train-path
    optimization, +14% BPTT on TPU, fp-reassociation-level numerics;
    MMF_TPU_PALLAS=0 here keeps the comparison bitwise on the CPU env)."""
    from multimodalfilter_tpu.data.datasets import SubsequenceDataset
    from multimodalfilter_tpu.experiments import Buddy
    from multimodalfilter_tpu.train import train_e2e
    from multimodalfilter_tpu.types import Trajectory

    rng_np = np.random.default_rng(3)
    t = 16
    trajs = [
        Trajectory(
            states=rng_np.standard_normal((t, 3)).astype(np.float32),
            observations={
                "image": rng_np.standard_normal((t, 32, 32)).astype(np.float32),
                "gripper_pos": rng_np.standard_normal((t, 3)).astype(np.float32),
                "gripper_sensors": rng_np.standard_normal((t, 7)).astype(
                    np.float32
                ),
            },
            controls=rng_np.standard_normal((t, 7)).astype(np.float32),
        )
        for _ in range(2)
    ]
    dataset = SubsequenceDataset(trajs, subsequence_length=5)

    def run(serving_on):
        if serving_on:
            monkeypatch.setenv("MMF_TPU_SERVING", "1")
            monkeypatch.setenv("MMF_TPU_STACK_ENC", "1")
            monkeypatch.setenv("MMF_TPU_PALLAS", "0")
        else:
            for var in ("MMF_TPU_SERVING", "MMF_TPU_STACK_ENC",
                        "MMF_TPU_PALLAS"):
                monkeypatch.delenv(var, raising=False)
        from crossmodal.door_models import DoorCrossmodalParticleFilter

        model = DoorCrossmodalParticleFilter()
        if serving_on:
            # The EVAL def really does carry the transforms...
            mm = model.definition.measurement_model
            assert mm.stack_image_encoders
            assert mm.measurement_models[0].net.fold_tail
            assert mm.measurement_models[0].net.dtype == jnp.bfloat16
        d = tmp_path / f"serving_{serving_on}"
        buddy = Buddy(
            "strip_test", model,
            checkpoint_dir=str(d / "c"), metadata_dir=str(d / "m"),
            log_dir=str(d / "l"), verbose=False,
        )
        train_e2e(buddy, model, dataset, epochs=1, batch_size=4)
        return model.params

    params_plain = run(False)
    params_serving = run(True)
    # ...but the TRAIN program is the stripped (plain) one: bitwise equal.
    for a, b in zip(
        jax.tree_util.tree_leaves(params_plain),
        jax.tree_util.tree_leaves(params_serving),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
