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
    rc.run(train_door.run_curriculum, model)
    return model, buddy, log


def test_fresh_resume_run_matches_plain(tmp_path):
    """--resume with no prior checkpoints probes then re-runs everything
    live: identical call order, identical checkpoints, identical final
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


def test_resume_replays_under_correct_mutation_state(tmp_path):
    """Regression: curricula mutate the model EAGERLY between train calls
    (freeze_module / enabled_models flips, e.g. train_door.py's unimodal-KF
    branch). On resume, a replayed train call must see the mutation state of
    its own call site, not the segment-final state (the old defer-and-replay
    design ran every deferred call under the last mutation)."""
    from crossmodal.resume import ResumableCurriculum

    def run(root, resume, missing=()):
        class Model:
            params = {"w": np.zeros(3, np.float32)}
            flag = "init"

        model = Model()
        buddy = _make_buddy(root, model, "mut")
        seen = []

        class Helpers:
            def train_e2e(self, tag):
                seen.append((tag, model.flag))
                model.params = {"w": model.params["w"] + 1.0}

            def log_eval(self):
                pass

        def curriculum(buddy, th, eh):
            model.flag = "A"
            th.train_e2e("t1")
            buddy.save_checkpoint("p0")
            # One segment, mutations interleaved with trains:
            model.flag = "B"
            th.train_e2e("t2")
            model.flag = "C"
            th.train_e2e("t3")
            buddy.save_checkpoint("p1")

        rc = ResumableCurriculum(buddy, Helpers(), Helpers(), enabled=resume)
        rc.run(curriculum)
        return model, seen

    model1, seen1 = run(tmp_path, resume=False)
    assert seen1 == [("t1", "A"), ("t2", "B"), ("t3", "C")]
    (tmp_path / "ckpt" / "mut" / "p1.ckpt").unlink()

    model2, seen2 = run(tmp_path, resume=True)
    # t1 is skipped (p0 complete); t2/t3 replay under THEIR OWN flags.
    assert seen2 == [("t2", "B"), ("t3", "C")]
    np.testing.assert_array_equal(
        _first_leaf(model2.params), _first_leaf(model1.params)
    )


def test_resume_optimizer_clear_not_resurrected(tmp_path):
    """Regression: a curriculum's between-phase _optimizer_dict.clear() that
    falls inside the replayed segment must still produce a FRESH optimizer on
    resume — the frontier restore repopulates the warm-start stash, and the
    clear (re-run live, in order, after the restore) must drop it."""
    import jax
    import jax.numpy as jnp

    from crossmodal.resume import ResumableCurriculum
    from multimodalfilter_tpu.train.optim import get_named_optimizer

    def run(root, resume):
        class Model:
            params = {"w": jnp.zeros((3,))}

        model = Model()
        buddy = _make_buddy(root, model, "optclear")
        warm_at_entry = []

        class Helpers:
            def train_e2e(self):
                opt = get_named_optimizer(buddy, "o", model.params)
                warm_at_entry.append(
                    any(
                        np.any(np.asarray(x) != 0)
                        for x in jax.tree_util.tree_leaves(opt["state"])
                        if hasattr(x, "shape")
                    )
                )
                grads = {"w": jnp.ones((3,))}
                _, opt["state"] = opt["tx"].update(
                    grads, opt["state"], model.params
                )

            def log_eval(self):
                pass

        def curriculum(buddy, th, eh):
            th.train_e2e()
            buddy.save_checkpoint("p0")
            buddy._optimizer_dict.clear()  # the curricula's phase reset
            th.train_e2e()
            buddy.save_checkpoint("p1")

        rc = ResumableCurriculum(buddy, Helpers(), Helpers(), enabled=resume)
        rc.run(curriculum)
        return warm_at_entry

    assert run(tmp_path, resume=False) == [False, False]
    (tmp_path / "ckpt" / "optclear" / "p1.ckpt").unlink()
    # Resume: only the second train replays, and it must start COLD (the old
    # design warm-started it from p0's restored Adam moments).
    assert run(tmp_path, resume=True) == [False]


def test_load_checkpoint_purges_stale_stash(tmp_path):
    """Regression: Buddy.load_checkpoint must drop warm-start stash entries
    left by an earlier restore — optimizers absent from the newly loaded
    checkpoint must not warm-start from a previous one's moments."""
    import jax.numpy as jnp

    from multimodalfilter_tpu.train.optim import get_named_optimizer

    class Model:
        params = {"w": jnp.zeros((3,))}

    model = Model()
    buddy = _make_buddy(tmp_path, model, "stash")
    opt = get_named_optimizer(buddy, "x", model.params)
    grads = {"w": jnp.ones((3,))}
    _, opt["state"] = opt["tx"].update(grads, opt["state"], model.params)
    buddy.save_checkpoint("A")
    buddy._optimizer_dict.clear()
    buddy.save_checkpoint("B")  # no optimizer state in this checkpoint

    buddy2 = _make_buddy(tmp_path, Model(), "stash")
    buddy2.load_checkpoint("A")
    assert "x" in buddy2._pending_optimizer_state
    buddy2.load_checkpoint("B")
    assert buddy2._pending_optimizer_state == {}
