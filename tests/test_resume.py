"""Curriculum resume tests (crossmodal/resume.py + --resume on the train
CLIs): completed phases are skipped via their labeled checkpoints, the
frontier checkpoint is restored before the first incomplete segment
replays, and lazily-created optimizers warm-start from restored state."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts/door_task")

from multimodalfilter_tpu.experiments import Buddy


def _make_buddy(tmp_path, model, name="resume_test"):
    return Buddy(
        name,
        model,
        checkpoint_dir=str(tmp_path / "ckpt"),
        metadata_dir=str(tmp_path / "meta"),
        log_dir=str(tmp_path / "logs"),
        verbose=False,
    )


class MutatingHelpers:
    """Stand-in train/eval helpers: record every call in a shared log and
    deterministically perturb the model params so each phase's checkpoint
    is distinguishable (the perturbation replays identically on resume)."""

    def __init__(self, log, buddy):
        object.__setattr__(self, "log", log)
        object.__setattr__(self, "buddy", buddy)

    def __getattr__(self, name):
        def record(*args, **kwargs):
            self.log.append(name)
            if name.startswith("train"):
                import jax

                leaves, treedef = jax.tree_util.tree_flatten(
                    self.buddy.model.params
                )
                leaves[0] = leaves[0] + 1.0
                self.buddy.model.params = jax.tree_util.tree_unflatten(
                    treedef, leaves
                )

        return record


def _first_leaf(params):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(params)[0])


def _run_kf_curriculum(tmp_path, name, resume):
    import train_door
    from crossmodal.resume import ResumableCurriculum
    from crossmodal.tasks import DoorTask

    model = DoorTask.model_types["DoorKalmanFilter"]()
    buddy = _make_buddy(tmp_path, model, name)
    log = []
    th = MutatingHelpers(log, buddy)
    eh = MutatingHelpers(log, buddy)
    rc = ResumableCurriculum(buddy, th, eh, enabled=resume)
    train_door.run_curriculum(
        model, rc.buddy, rc.train_helpers, rc.eval_helpers
    )
    rc.finish()
    return model, buddy, log


def test_fresh_resume_run_matches_plain(tmp_path):
    """--resume with no prior checkpoints defers-then-replays the first
    segment: identical call order, identical checkpoints, identical final
    params as a plain run."""
    _, buddy_plain, log_plain = _run_kf_curriculum(
        tmp_path / "plain", "kf", resume=False
    )
    model, buddy, log = _run_kf_curriculum(
        tmp_path / "resumed", "kf", resume=True
    )
    assert log == log_plain
    np.testing.assert_array_equal(
        _first_leaf(model.params), _first_leaf(buddy_plain.model.params)
    )
    for label in ("phase0", "phase1", "phase2", "phase3"):
        assert (tmp_path / "resumed" / "ckpt" / "kf" / f"{label}.ckpt").exists()


def test_resume_all_phases_complete(tmp_path):
    """A fully-complete run resumes with ZERO train/eval calls and ends with
    the final checkpoint's params restored."""
    model1, _, _ = _run_kf_curriculum(tmp_path, "kf", resume=False)
    final = _first_leaf(model1.params)

    model2, _, log2 = _run_kf_curriculum(tmp_path, "kf", resume=True)
    assert log2 == []  # nothing re-trained, nothing re-evaled
    np.testing.assert_array_equal(_first_leaf(model2.params), final)


def test_resume_from_partial_run(tmp_path):
    """Deleting the last phase checkpoint simulates preemption mid-way: only
    the final segment replays (restored from the frontier), and the final
    params match the uninterrupted run bit-for-bit."""
    model1, _, log1 = _run_kf_curriculum(tmp_path, "kf", resume=False)
    final = _first_leaf(model1.params)
    (tmp_path / "ckpt" / "kf" / "phase3.ckpt").unlink()

    model2, _, log2 = _run_kf_curriculum(tmp_path, "kf", resume=True)
    # DoorKalmanFilter's phase2->phase3 segment: 6 train_e2e + 6 log_eval
    # (train_door.py::_ekf_curriculum).
    assert log2 == ["train_e2e", "log_eval"] * 6
    assert len(log2) < len(log1)
    np.testing.assert_array_equal(_first_leaf(model2.params), final)
    assert (tmp_path / "ckpt" / "kf" / "phase3.ckpt").exists()


def test_resume_surgery_defers_but_validates_eagerly(tmp_path):
    """Deferred load_checkpoint_module keeps its call-site error contract:
    a missing source checkpoint raises FileNotFoundError IN skip mode (the
    CMPF curriculum's warm-start fallback depends on it)."""
    from crossmodal.resume import ResumableCurriculum

    class Model:
        params = {"w": np.zeros(3, np.float32)}

    buddy = _make_buddy(tmp_path, Model(), "surgery")
    rc = ResumableCurriculum(buddy, object(), object(), enabled=True)
    # Label-less lookup on a missing experiment: AssertionError, matching
    # Buddy._read_checkpoint (the curricula catch both exception types).
    with pytest.raises(AssertionError):
        rc.buddy.load_checkpoint_module(
            "dynamics_model", experiment_name="does_not_exist"
        )
    # Labeled lookup: FileNotFoundError, also matching Buddy.
    with pytest.raises(FileNotFoundError):
        rc.buddy.load_checkpoint_module(
            "dynamics_model", label="phase9", experiment_name="does_not_exist"
        )


def test_optimizer_warm_start_after_restore(tmp_path):
    """Optimizer states restored BEFORE their optimizer exists (the resume
    path: optimizers are created lazily at the first train call) warm-start
    get_named_optimizer; _optimizer_dict.clear() drops the stash."""
    import jax.numpy as jnp

    from multimodalfilter_tpu.train.optim import get_named_optimizer

    class Model:
        params = {"w": jnp.zeros((3,))}

    model = Model()
    buddy = _make_buddy(tmp_path, model, "warm")
    params = model.params
    opt = get_named_optimizer(buddy, "ekf", params)
    # One real update so the Adam moments are nonzero.
    grads = {"w": jnp.ones((3,))}
    updates, new_state = opt["tx"].update(grads, opt["state"], params)
    opt["state"] = new_state
    buddy.save_checkpoint("phase0")

    # Fresh process: new buddy, optimizer not created yet.
    model2 = Model()
    buddy2 = _make_buddy(tmp_path, model2, "warm")
    buddy2.load_checkpoint("phase0")
    assert "ekf" in buddy2._pending_optimizer_state
    opt2 = get_named_optimizer(buddy2, "ekf", model2.params)
    import jax

    saved_mu = jax.tree_util.tree_leaves(new_state)
    restored_mu = jax.tree_util.tree_leaves(opt2["state"])
    assert any(np.any(np.asarray(a) != 0) for a in restored_mu)
    for a, b in zip(saved_mu, restored_mu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert "ekf" not in buddy2._pending_optimizer_state

    # clear() (the curricula's between-phase optimizer reset) drops pending
    # warm-starts too.
    buddy3 = _make_buddy(tmp_path, Model(), "warm")
    buddy3.load_checkpoint("phase0")
    assert "ekf" in buddy3._pending_optimizer_state
    buddy3._optimizer_dict.clear()
    assert buddy3._pending_optimizer_state == {}
    opt3 = get_named_optimizer(buddy3, "ekf", Model().params)
    assert all(
        np.all(np.asarray(x) == 0)
        for x in jax.tree_util.tree_leaves(opt3["state"])
        if hasattr(x, "shape") and getattr(x, "shape", ()) != ()
    )
