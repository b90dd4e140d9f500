"""End-to-end pipeline tests on synthetic data: dataset loading ->
curriculum training primitives -> checkpointing/surgery -> eval metrics.
(SURVEY §7 build-order step 3: the minimum end-to-end slice.)"""

import os

import numpy as np
import pytest

import multimodalfilter_tpu.data.cache as cache_mod
from multimodalfilter_tpu.data import set_cache_path
from multimodalfilter_tpu.experiments import Buddy
from multimodalfilter_tpu.filtering.wrappers import freeze_module
from multimodalfilter_tpu.utils.pytree import get_by_path


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    cache_dir = tmp_path_factory.mktemp("cache")
    os.environ["MMF_TPU_SYNTHESIZE_DATA"] = "1"
    os.environ["MMF_TPU_SYNTH_TRAJ"] = "4"
    os.environ["MMF_TPU_SYNTH_T"] = "48"
    set_cache_path(str(cache_dir))
    yield cache_dir
    cache_mod._cache_path = None


@pytest.fixture(scope="module")
def door_trajectories(synth_env):
    from crossmodal.tasks import DoorTask

    return DoorTask.get_train_trajectories(
        use_vision=True,
        use_proprioception=True,
        use_haptics=True,
        image_blackout_ratio=0.0,
        sequential_image_rate=1,
    )


def test_door_loader_shapes(door_trajectories):
    trajs = door_trajectories
    assert len(trajs) == 8  # 4 per file x 2 files
    for traj in trajs:
        t = traj.states.shape[0]
        assert traj.states.shape == (t, 3)
        assert traj.controls.shape == (t, 7)
        assert traj.observations["image"].shape == (t, 32, 32)
        assert traj.observations["gripper_pos"].shape == (t, 3)
        assert traj.observations["gripper_sensors"].shape == (t, 7)
        for v in [traj.states, traj.controls]:
            assert np.all(np.isfinite(v))


def test_push_loader_shapes(synth_env):
    from crossmodal.tasks import PushTask

    for kloss in (False, True):
        trajs = PushTask.get_eval_trajectories(
            use_vision=True,
            use_proprioception=True,
            use_haptics=True,
            image_blackout_ratio=0.0,
            sequential_image_rate=1,
            kloss_dataset=kloss,
        )
        assert len(trajs) >= 1
        traj = trajs[0]
        assert traj.states.shape[1] == 2
        assert traj.observations["image"].shape[1:] == (32, 32)


def test_sequential_image_rate(synth_env):
    from crossmodal.tasks import DoorTask

    trajs = DoorTask.get_eval_trajectories(
        use_vision=True,
        use_proprioception=True,
        use_haptics=True,
        image_blackout_ratio=0.0,
        sequential_image_rate=4,
    )
    image = trajs[0].observations["image"]
    sums = np.abs(image).reshape(image.shape[0], -1).sum(axis=1)
    assert np.all(sums[1::4][: len(sums[1::4])] == 0)  # masked frames zeroed
    assert sums[0] > 0  # kept frames survive


@pytest.fixture(scope="module")
def trained_pf(tmp_path_factory, door_trajectories):
    """Run a miniature PF curriculum (1-epoch phases) on synthetic data."""
    import crossmodal
    from crossmodal.tasks import DoorTask

    workdir = tmp_path_factory.mktemp("experiments")
    model = DoorTask.model_types["DoorParticleFilter"]()
    buddy = Buddy(
        "pf_test",
        model,
        checkpoint_dir=str(workdir / "checkpoints"),
        metadata_dir=str(workdir / "metadata"),
        log_dir=str(workdir / "logs"),
        verbose=False,
    )
    th = crossmodal.train_helpers
    th.configure(buddy=buddy, trajectories=door_trajectories)
    losses = {}
    losses["dyn1"] = th.train_pf_dynamics_single_step(epochs=2)
    losses["dynR"] = th.train_pf_dynamics_recurrent(subsequence_length=4, epochs=1)
    freeze_module(model.dynamics_model)
    losses["meas"] = th.train_pf_measurement(epochs=1, batch_size=32)
    losses["e2e"] = th.train_e2e(subsequence_length=4, epochs=1, batch_size=8)
    return model, buddy, losses, workdir


def test_training_losses_finite(trained_pf):
    _, _, losses, _ = trained_pf
    for name, loss in losses.items():
        assert loss is not None and np.isfinite(loss), (name, loss)


def test_frozen_dynamics_unchanged(trained_pf, door_trajectories):
    import crossmodal

    model, buddy, _, _ = trained_pf
    before = get_by_path(model.params, "dynamics_model")
    before = {k: np.array(v) for k, v in jax_flatten(before)}
    crossmodal.train_helpers.train_e2e(
        subsequence_length=4, epochs=1, batch_size=8
    )
    after = get_by_path(model.params, "dynamics_model")
    after = {k: np.array(v) for k, v in jax_flatten(after)}
    for k in before:
        np.testing.assert_array_equal(before[k], after[k])


def jax_flatten(tree):
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [("/".join(str(p) for p in path), leaf) for path, leaf in flat]


def test_checkpoint_roundtrip_and_surgery(trained_pf):
    model, buddy, _, workdir = trained_pf
    buddy.save_checkpoint("unit_test")
    original = np.array(
        get_by_path(model.params, "dynamics_model.shared_dense_out")["kernel"]
    )

    # Perturb, then restore just the dynamics model by dotted path.
    model.params = jax_set(model.params, "dynamics_model.shared_dense_out.kernel", original + 1.0)
    buddy.load_checkpoint_module("dynamics_model", label="unit_test")
    restored = np.array(
        get_by_path(model.params, "dynamics_model.shared_dense_out")["kernel"]
    )
    np.testing.assert_array_equal(restored, original)

    # Full restore.
    model.params = jax_set(model.params, "dynamics_model.shared_dense_out.kernel", original + 2.0)
    buddy.load_checkpoint(label="unit_test")
    restored = np.array(
        get_by_path(model.params, "dynamics_model.shared_dense_out")["kernel"]
    )
    np.testing.assert_array_equal(restored, original)


def jax_set(tree, path, value):
    from multimodalfilter_tpu.utils.pytree import set_by_path

    return set_by_path(tree, path, value)


def test_run_eval_metrics(trained_pf, synth_env):
    import crossmodal
    from crossmodal.tasks import DoorTask

    model, buddy, _, _ = trained_pf
    eh = crossmodal.eval_helpers
    eh.configure(
        buddy=buddy,
        task=DoorTask,
        dataset_args={
            "use_vision": True,
            "use_proprioception": True,
            "use_haptics": True,
            "image_blackout_ratio": 0.0,
            "sequential_image_rate": 1,
        },
    )
    results = eh.run_eval()
    for key in ("raw_rmse", "theta_rmse_deg", "x_rmse_cm", "y_rmse_cm",
                "filter_steps_per_sec", "filter_steps_per_sec_e2e"):
        assert key in results
    assert np.isfinite(results["theta_rmse_deg"])
    assert results["filter_steps_per_sec"] > 0
    assert results["filter_steps_per_sec_e2e"] > 0
    assert len(results["raw_rmse"]) == 3


def test_eval_dynamics_mode(trained_pf, synth_env):
    import crossmodal

    results = crossmodal.eval_helpers.run_eval(eval_dynamics=True)
    assert np.isfinite(results["theta_rmse_deg"])


def test_train_e2e_pipelined(trained_pf, door_trajectories):
    """e2e BPTT through the differentiable temporal pipeline: 4 stages x
    micro=2 over a 5-step subsequence window (4 filter steps), loss finite
    and params actually move."""
    import crossmodal
    import jax
    from multimodalfilter_tpu.parallel.mesh import create_mesh

    model, buddy, _, _ = trained_pf
    th = crossmodal.train_helpers
    th.configure(
        buddy=buddy, trajectories=door_trajectories,
        pipeline_mesh=create_mesh(4, axis_names=("pipe",)),
        pipeline_microbatches=2,
    )
    before = [
        np.array(x) for x in jax.tree_util.tree_leaves(
            get_by_path(model.params, "measurement_model")
        )
    ]
    loss = th.train_e2e(subsequence_length=5, epochs=1, batch_size=8)
    assert loss is not None and np.isfinite(loss)
    after = [
        np.array(x) for x in jax.tree_util.tree_leaves(
            get_by_path(model.params, "measurement_model")
        )
    ]
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))
    # Restore the plain config for any later tests in the module.
    th.configure(buddy=buddy, trajectories=door_trajectories)


def test_train_e2e_data_pipe_grid(trained_pf, door_trajectories):
    """e2e BPTT on the composed 2-D data x pipe grid: batch 8 sharded over
    a 2-wide data axis, each shard pipelining its 4-step window over 4
    stages. Loss finite, params move."""
    import crossmodal
    import jax
    from multimodalfilter_tpu.parallel.mesh import create_mesh

    model, buddy, _, _ = trained_pf
    th = crossmodal.train_helpers
    th.configure(
        buddy=buddy, trajectories=door_trajectories,
        pipeline_mesh=create_mesh(
            8, axis_names=("data", "pipe"), shape=(2, 4)
        ),
        pipeline_microbatches=2,
    )
    before = [
        np.array(x) for x in jax.tree_util.tree_leaves(
            get_by_path(model.params, "measurement_model")
        )
    ]
    loss = th.train_e2e(subsequence_length=5, epochs=1, batch_size=8)
    assert loss is not None and np.isfinite(loss)
    after = [
        np.array(x) for x in jax.tree_util.tree_leaves(
            get_by_path(model.params, "measurement_model")
        )
    ]
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))
    th.configure(buddy=buddy, trajectories=door_trajectories)


def test_train_e2e_3d_grid(trained_pf, door_trajectories):
    """e2e BPTT on the FULL 3-D data x pipe x particle grid: batch 8 over a
    2-wide data axis, 4-step windows over 2 pipeline stages, and the PF's
    M=30 training particles sharded over a 2-wide particle axis (the
    per-stage body is particle_sharding.sharded_pf_train_step, global
    noise stream sliced so grads match the plain loop — pinned bitwise in
    test_temporal_pipeline.py; here the full train_e2e wiring). Loss
    finite, params move."""
    import crossmodal
    import jax
    from multimodalfilter_tpu.parallel.mesh import create_mesh

    model, buddy, _, _ = trained_pf
    th = crossmodal.train_helpers
    th.configure(
        buddy=buddy, trajectories=door_trajectories,
        pipeline_mesh=create_mesh(
            8, axis_names=("data", "pipe", "particle"), shape=(2, 2, 2)
        ),
        pipeline_microbatches=2,
    )
    before = [
        np.array(x) for x in jax.tree_util.tree_leaves(
            get_by_path(model.params, "measurement_model")
        )
    ]
    loss = th.train_e2e(subsequence_length=5, epochs=1, batch_size=8)
    assert loss is not None and np.isfinite(loss)
    after = [
        np.array(x) for x in jax.tree_util.tree_leaves(
            get_by_path(model.params, "measurement_model")
        )
    ]
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))
    th.configure(buddy=buddy, trajectories=door_trajectories)


def test_train_e2e_pipeline_microbatches_auto(trained_pf, door_trajectories):
    """train_e2e(pipeline_microbatches=None) auto-sizes with the SAME
    resolver as eval (StatefulFilter._auto_microbatches: largest divisor of
    the per-data-shard batch up to 8) — round-3 verdict item #5: train
    previously hardcoded micro=2 and silently got the inefficient GPipe
    schedule. Asserted via the jit-cache key, which embeds the resolved
    count."""
    import crossmodal
    from multimodalfilter_tpu.parallel.mesh import create_mesh

    model, buddy, _, _ = trained_pf
    th = crossmodal.train_helpers
    th.configure(
        buddy=buddy, trajectories=door_trajectories,
        pipeline_mesh=create_mesh(4, axis_names=("pipe",)),
        # pipeline_microbatches left at the default (None = auto)
    )
    loss = th.train_e2e(subsequence_length=5, epochs=1, batch_size=8)
    assert loss is not None and np.isfinite(loss)
    pipe_tuples = [
        part
        for key in buddy._jit_cache
        for part in key[-1]
        if isinstance(part, tuple) and part and part[0] == "pipe"
    ]
    assert pipe_tuples, "no pipelined epoch fn was cached"
    # batch 8, no data axis -> per-shard batch 8 -> auto micro = 8.
    assert any(p[1] == 8 for p in pipe_tuples), pipe_tuples
    th.configure(buddy=buddy, trajectories=door_trajectories)
