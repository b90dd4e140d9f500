"""Curriculum-structure tests: run every train-script curriculum with the
training primitives stubbed out, validating dispatch, phase ordering,
checkpoint labels, freeze gating, and checkpoint-surgery calls for all
model types (reference train_door.py:61-460, train_push.py:61-504)."""

import sys
import types

import pytest

sys.path.insert(0, "scripts/door_task")
sys.path.insert(0, "scripts/push_task")


class FakeBuddy:
    def __init__(self):
        self.checkpoints = []
        self.module_loads = []
        self._optimizer_dict = {}

    def save_checkpoint(self, label=None):
        self.checkpoints.append(label)

    def load_checkpoint_module(self, source, target=None, label=None,
                               experiment_name=None):
        if experiment_name is not None:
            # Cross-experiment warm starts fall back in a fresh workspace.
            raise FileNotFoundError(experiment_name)
        self.module_loads.append((source, target, label))


class Recorder(types.SimpleNamespace):
    def __init__(self):
        super().__init__()
        self.calls = []

    def __getattr__(self, name):
        def record(*args, **kwargs):
            self.calls.append((name, kwargs))
        return record


def _door_types():
    from crossmodal.tasks import DoorTask

    return sorted(DoorTask.model_types)


def _push_types():
    from crossmodal.tasks import PushTask

    return sorted(PushTask.model_types)


@pytest.mark.parametrize("name", _door_types())
def test_door_curricula_dispatch(name):
    import train_door
    from crossmodal.tasks import DoorTask

    model = DoorTask.model_types[name]()
    buddy, th, eh = FakeBuddy(), Recorder(), Recorder()
    if name == "DoorCrossmodalParticleFilterSeq5":
        # Seq5 shares the crossmodal-PF branch; warm-start raises and falls
        # back to training from scratch.
        pass
    train_door.run_curriculum(model, buddy, th, eh)
    assert buddy.checkpoints, f"no checkpoints saved for {name}"
    assert th.calls, f"no training calls for {name}"
    # Every curriculum ends with a final-phase checkpoint.
    assert any(str(label).startswith("phase") for label in buddy.checkpoints)


@pytest.mark.parametrize("name", _push_types())
def test_push_curricula_dispatch(name):
    import train_push
    from crossmodal.tasks import PushTask

    model = PushTask.model_types[name]()
    buddy, th, eh = FakeBuddy(), Recorder(), Recorder()
    train_push.run_curriculum(model, buddy, th, eh)
    assert buddy.checkpoints, f"no checkpoints saved for {name}"
    assert th.calls, f"no training calls for {name}"
    if name == "PushCrossmodalParticleFilterSeq5":
        # Warm-start experiment absent -> the curriculum falls back to
        # from-scratch dynamics + measurement pretraining instead of raising
        # (the reference hard-requires cmpf_blackout0.0 —
        # train_push.py:109-116).
        assert any(c[0] == "train_pf_dynamics_single_step" for c in th.calls)
        assert any(c[0] == "train_pf_measurement" for c in th.calls)


def test_cmekf_curriculum_structure():
    """Spot-check the richest curriculum: crossmodal EKF phase labels and
    cross-child dynamics surgery (reference train_door.py:261-375)."""
    import train_door
    from crossmodal.tasks import DoorTask

    model = DoorTask.model_types["DoorCrossmodalKalmanFilter"]()
    buddy, th, eh = FakeBuddy(), Recorder(), Recorder()
    train_door.run_curriculum(model, buddy, th, eh)
    assert buddy.checkpoints == [
        "phase0", "phase1", "phase2", "phase3-image", "phase3-force",
        "phase4-freeze", "phase4-length3", "phase4-length4", "phase4-done",
    ]
    assert ("filter_models.0.dynamics_model", "filter_models.1.dynamics_model",
            "phase0") in buddy.module_loads
    assert ("filter_models.0.dynamics_model", "filter_models.1.dynamics_model",
            "phase1") in buddy.module_loads
    # Named optimizers used for the per-child phases.
    opt_names = {kw.get("optimizer_name") for _, kw in th.calls}
    assert {"image_ekf", "force_ekf", "freeze_ekf"} <= opt_names


def test_parity_rehearsal(tmp_path, monkeypatch):
    """The one-command parity rehearsal (scripts/parity_rehearsal.py)
    dry-runs end-to-end on synthetic stand-ins: dataset resolution through
    the cache, one e2e train phase, repeated eval, stats table persisted.
    With egress, the same command downloads the real HDF5s instead
    (cache.py resolution order)."""
    import json

    monkeypatch.setenv("MMF_TPU_SYNTHESIZE_DATA", "1")
    monkeypatch.setenv("MMF_TPU_SYNTH_TRAJ", "4")
    monkeypatch.setenv("MMF_TPU_SYNTH_T", "40")
    monkeypatch.setenv("MMF_TPU_EVAL_DEVICE_THROUGHPUT", "0")
    monkeypatch.chdir(tmp_path)  # Buddy's default dirs land in tmp

    import os

    import multimodalfilter_tpu.data.cache as cache_mod

    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(repo_root, "scripts"))
    try:
        import parity_rehearsal

        out_json = tmp_path / "stats.json"
        stats = parity_rehearsal.main([
            "--task", "door",
            "--model-type", "DoorKalmanFilter",  # deterministic + cheap
            "--cache-dir", str(tmp_path / "cache"),
            "--epochs", "1",
            "--subsequence-length", "8",
            "--batch-size", "8",
            "--eval-repeats", "2",
            "--output-json", str(out_json),
        ])
    finally:
        cache_mod._cache_path = None

    assert out_json.exists()
    persisted = json.loads(out_json.read_text())
    for key in ("theta_rmse_deg_mean", "x_rmse_cm_mean", "y_rmse_cm_mean"):
        assert key in stats and key in persisted
        assert persisted[key] == stats[key]
    import numpy as np

    assert np.isfinite(stats["theta_rmse_deg_mean"])
    # The rehearsal checkpoint + metadata were persisted via Buddy.
    assert (tmp_path / "checkpoints" / "parity_rehearsal"
            / "parity_rehearsal.ckpt").exists()
    meta = json.loads(
        (tmp_path / "metadata" / "parity_rehearsal.json").read_text()
    )
    assert "rehearsal_eval_stats" in meta


def test_eval_cli_parallelism_flags(tmp_path, monkeypatch):
    """--pipeline-stages / --data-parallel on the eval CLI route run_eval
    through the temporal pipeline / batch-DP mesh (parallel/cli.py): the
    user-reachable surface for the multi-chip eval paths. Exercised on the
    8-device CPU mesh with synthetic data."""
    import json

    monkeypatch.setenv("MMF_TPU_SYNTHESIZE_DATA", "1")
    monkeypatch.setenv("MMF_TPU_SYNTH_TRAJ", "8")
    monkeypatch.setenv("MMF_TPU_SYNTH_T", "24")
    monkeypatch.setenv("MMF_TPU_EVAL_DEVICE_THROUGHPUT", "0")
    monkeypatch.chdir(tmp_path)

    import numpy as np

    import crossmodal
    from crossmodal.tasks import DoorTask
    from multimodalfilter_tpu.experiments import Buddy

    model = DoorTask.model_types["DoorKalmanFilter"]()
    buddy = Buddy("cli_par_test", model)
    buddy.set_metadata({
        "model_type": "DoorKalmanFilter",
        "dataset_args": {},
    })
    buddy.save_checkpoint()

    import eval_door

    # Temporal pipeline over 8 stages (micro auto-sizes from N=8).
    eval_door.main([
        "--experiment-name", "cli_par_test", "--pipeline-stages", "8",
        "--save",
    ])
    meta = json.loads(
        (tmp_path / "metadata" / "cli_par_test.json").read_text()
    )
    stats_pipe = meta["eval_results_stats"]
    assert np.isfinite(stats_pipe["theta_rmse_deg_mean"])

    # Batch-DP over 8 devices (N=8 shards one trajectory per device).
    eval_door.main([
        "--experiment-name", "cli_par_test", "--data-parallel", "8",
        "--save",
    ])
    meta = json.loads(
        (tmp_path / "metadata" / "cli_par_test.json").read_text()
    )
    stats_dp = meta["eval_results_stats"]
    # Same checkpoint, same (deterministic KF) rollout. NOTE the loose rtol:
    # this untrained random EKF has near-singular innovation steps that
    # amplify fp32 regrouping differences (different pipeline geometries
    # batch the hoisted CNN encoder differently) chaotically — a measured
    # 1e-6 obs perturbation moved estimates by 0.1 on some steps. Bitwise /
    # tight-tolerance grid correctness is pinned by
    # test_temporal_pipeline.py's decomposition tests; HERE we check the CLI
    # routing, so the metric check only guards against gross misrouting
    # (wrong dataset, scrambled trajectory order).
    np.testing.assert_allclose(
        stats_dp["theta_rmse_deg_mean"], stats_pipe["theta_rmse_deg_mean"],
        rtol=0.1,
    )

    # BOTH flags compose: rollouts on the 2-D (2 data x 4 pipe) grid.
    # Routing is asserted structurally: the pipelined-loop builder must be
    # invoked with the composed mesh and data_axis_name="data".
    from multimodalfilter_tpu.parallel import temporal_pipeline as _tp

    builder_calls = []
    orig_make = _tp.make_pipelined_filter_loop

    def recording_make(defn, mesh, *args, **kwargs):
        builder_calls.append(
            (tuple(mesh.axis_names), dict(mesh.shape),
             kwargs.get("data_axis_name"))
        )
        return orig_make(defn, mesh, *args, **kwargs)

    monkeypatch.setattr(_tp, "make_pipelined_filter_loop", recording_make)
    eval_door.main([
        "--experiment-name", "cli_par_test",
        "--data-parallel", "2", "--pipeline-stages", "4", "--save",
    ])
    assert builder_calls, "grid eval never reached the pipeline builder"
    axis_names, mesh_shape, data_axis = builder_calls[0]
    assert axis_names == ("data", "pipe")
    assert mesh_shape == {"data": 2, "pipe": 4}
    assert data_axis == "data"
    meta = json.loads(
        (tmp_path / "metadata" / "cli_par_test.json").read_text()
    )
    stats_grid = meta["eval_results_stats"]
    np.testing.assert_allclose(
        stats_grid["theta_rmse_deg_mean"], stats_pipe["theta_rmse_deg_mean"],
        rtol=0.1,
    )

    # Leave the module-level eval config pointing at a live buddy for any
    # later tests in this process.
    crossmodal.eval_helpers.configure(
        buddy=buddy, task=DoorTask, dataset_args={},
    )


def test_eval_cli_particle_shards_flag(tmp_path, monkeypatch):
    """--particle-shards on the eval CLI shards the PF particle axis M
    (parallel/cli.py): alone it rides a 1-stage pipe axis with
    microbatching defaulted OFF (semantically the standalone
    particle-sharded loop), and with --data-parallel/--pipeline-stages it
    composes into the full 3-D data x pipe x particle grid. Routing is
    asserted structurally via the pipelined-PF builder's kwargs."""
    import json

    monkeypatch.setenv("MMF_TPU_SYNTHESIZE_DATA", "1")
    monkeypatch.setenv("MMF_TPU_SYNTH_TRAJ", "4")
    monkeypatch.setenv("MMF_TPU_SYNTH_T", "16")
    monkeypatch.setenv("MMF_TPU_EVAL_DEVICE_THROUGHPUT", "0")
    monkeypatch.chdir(tmp_path)

    import numpy as np

    import crossmodal
    from crossmodal.tasks import DoorTask
    from multimodalfilter_tpu.experiments import Buddy
    from multimodalfilter_tpu.parallel import temporal_pipeline as _tp

    model = DoorTask.model_types["DoorParticleFilter"]()
    buddy = Buddy("cli_particle_test", model)
    buddy.set_metadata({
        "model_type": "DoorParticleFilter",
        "dataset_args": {},
    })
    buddy.save_checkpoint()

    builder_calls = []
    orig_make = _tp.make_pipelined_pf_loop

    def recording_make(defn, mesh, *args, **kwargs):
        builder_calls.append(
            (tuple(mesh.axis_names), dict(mesh.shape),
             kwargs.get("data_axis_name"), kwargs.get("particle_axis_name"),
             kwargs.get("num_microbatches"))
        )
        return orig_make(defn, mesh, *args, **kwargs)

    monkeypatch.setattr(_tp, "make_pipelined_pf_loop", recording_make)

    import eval_door

    # Particle-only: (1 pipe x 4 particle), micro defaults to 1 (a 1-stage
    # pipe gains nothing from splitting the batch). M=300 -> 75 per shard.
    eval_door.main([
        "--experiment-name", "cli_particle_test", "--particle-shards", "4",
        "--save",
    ])
    assert builder_calls, "particle eval never reached the pipeline builder"
    axis_names, mesh_shape, data_axis, particle_axis, micro = builder_calls[0]
    assert axis_names == ("pipe", "particle")
    assert mesh_shape == {"pipe": 1, "particle": 4}
    assert data_axis is None
    assert particle_axis == "particle"
    assert micro == 1
    meta = json.loads(
        (tmp_path / "metadata" / "cli_particle_test.json").read_text()
    )
    stats_q = meta["eval_results_stats"]
    assert np.isfinite(stats_q["theta_rmse_deg_mean"])

    # Full 3-D grid: all three flags compose on one 8-device mesh.
    builder_calls.clear()
    eval_door.main([
        "--experiment-name", "cli_particle_test",
        "--data-parallel", "2", "--pipeline-stages", "2",
        "--particle-shards", "2", "--save",
    ])
    assert builder_calls, "3-D grid eval never reached the pipeline builder"
    axis_names, mesh_shape, data_axis, particle_axis, _micro = builder_calls[0]
    assert axis_names == ("data", "pipe", "particle")
    assert mesh_shape == {"data": 2, "pipe": 2, "particle": 2}
    assert data_axis == "data"
    assert particle_axis == "particle"
    meta = json.loads(
        (tmp_path / "metadata" / "cli_particle_test.json").read_text()
    )
    stats_grid = meta["eval_results_stats"]
    assert np.isfinite(stats_grid["theta_rmse_deg_mean"])
    # Same checkpoint/data; PF resampling draws differ per grid geometry,
    # so only gross misrouting is guarded here (see the KF test above for
    # why the tolerance is loose; grid correctness is pinned bitwise in
    # test_temporal_pipeline.py).
    np.testing.assert_allclose(
        stats_grid["theta_rmse_deg_mean"], stats_q["theta_rmse_deg_mean"],
        rtol=0.35,
    )

    crossmodal.eval_helpers.configure(
        buddy=buddy, task=DoorTask, dataset_args={},
    )


def test_eval_cli_serving_flag(tmp_path, monkeypatch):
    """--serving on the eval CLI sets MMF_TPU_SERVING=1 BEFORE the model is
    constructed (StatefulFilter reads the serving knobs at __init__ —
    filtering/wrappers.py), i.e. the CLI flag is equivalent to exporting
    the env var. The serving-stack composition itself (Pallas+bf16+fold)
    is covered by test_stacked_encoders / the strip tests; here we pin the
    CLI routing only, with the rollout stubbed out."""
    import os

    monkeypatch.setenv("MMF_TPU_SYNTHESIZE_DATA", "1")
    monkeypatch.setenv("MMF_TPU_SYNTH_TRAJ", "4")
    monkeypatch.setenv("MMF_TPU_SYNTH_T", "16")
    # Register the pre-test (absent) value so teardown removes the "1"
    # that apply_serving_arg writes.
    monkeypatch.setenv("MMF_TPU_SERVING", "0")
    monkeypatch.chdir(tmp_path)

    import crossmodal
    from crossmodal.tasks import DoorTask
    from multimodalfilter_tpu.experiments import Buddy
    import multimodalfilter_tpu.filtering.wrappers as _wrappers

    model = DoorTask.model_types["DoorKalmanFilter"]()
    buddy = Buddy("cli_serving_test", model)
    buddy.set_metadata({
        "model_type": "DoorKalmanFilter",
        "dataset_args": {},
    })
    buddy.save_checkpoint()

    seen = {}
    orig_init = _wrappers.StatefulFilter.__init__

    def recording_init(self, definition, seed=0):
        seen["serving_env_at_build"] = os.environ.get("MMF_TPU_SERVING")
        return orig_init(self, definition, seed)

    monkeypatch.setattr(_wrappers.StatefulFilter, "__init__", recording_init)
    monkeypatch.setattr(
        crossmodal.eval_helpers, "run_eval_stats",
        lambda **kwargs: {"stubbed": 1.0},
    )

    import eval_door

    eval_door.main(["--experiment-name", "cli_serving_test", "--serving"])
    assert seen["serving_env_at_build"] == "1"

    # Without the flag the env is left alone (a user-exported
    # MMF_TPU_SERVING must keep working without --serving).
    seen.clear()
    monkeypatch.setenv("MMF_TPU_SERVING", "0")
    eval_door.main(["--experiment-name", "cli_serving_test"])
    assert seen["serving_env_at_build"] == "0"

    # --profile-dir wraps the rollout in a jax.profiler trace and writes
    # the capture there (utils/debug.py::profile_trace).
    trace_dir = tmp_path / "trace"
    eval_door.main([
        "--experiment-name", "cli_serving_test",
        "--profile-dir", str(trace_dir),
    ])
    assert trace_dir.is_dir()
    assert any(trace_dir.rglob("*")), "profiler trace directory is empty"


def test_parallelism_flag_validation():
    """meshes_from_args rejects non-positive flag values instead of
    silently coercing --pipeline-stages 0 to a 1-stage pipe
    (parallel/cli.py)."""
    import argparse

    import pytest

    from multimodalfilter_tpu.parallel.cli import (
        add_parallelism_args,
        meshes_from_args,
    )

    parser = argparse.ArgumentParser()
    add_parallelism_args(parser)
    for argv in (
        ["--pipeline-stages", "0"],
        ["--data-parallel", "-2"],
        ["--particle-shards", "0"],
        ["--pipeline-stages", "2", "--pipeline-microbatches", "0"],
    ):
        with pytest.raises(SystemExit):
            meshes_from_args(parser.parse_args(argv))

    # Valid combinations still build the composed grid.
    mesh, pipeline_mesh = meshes_from_args(
        parser.parse_args(["--data-parallel", "2", "--pipeline-stages", "4"])
    )
    assert mesh.shape == {"data": 2}
    assert pipeline_mesh.shape == {"data": 2, "pipe": 4}
