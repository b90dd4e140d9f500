"""Door-task training CLI.

Command-line parity with the reference ``scripts/door_task/train_door.py``:
same flags (--model-type choices from the registry, --experiment-name,
--notes, + DoorTask dataset flags), same per-model-class curricula (phase
schedules, checkpoint labels, optimizer names, freeze/unfreeze gating,
cross-module checkpoint surgery — train_door.py:61-460), same metadata keys.
"""

import argparse
import datetime

import os
import sys

# Make the repo root importable when running the script directly (the
# reference distributes `crossmodal` via setup.py; `pip install -e .` works
# here too, but scripts must also run standalone).
sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)

import crossmodal
from multimodalfilter_tpu.data import set_cache_path
from multimodalfilter_tpu.experiments import Buddy
from multimodalfilter_tpu.filtering.wrappers import freeze_module, unfreeze_module
from multimodalfilter_tpu.utils import get_git_commit_hash, pdb_safety_net

Task = crossmodal.tasks.DoorTask


def main(argv=None):
    from multimodalfilter_tpu.parallel.cli import (
        add_parallelism_args,
        add_serving_arg,
        apply_serving_arg,
        meshes_from_args,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--model-type", type=str, required=True, choices=Task.model_types.keys()
    )
    parser.add_argument("--experiment-name", type=str, required=True)
    parser.add_argument("--notes", type=str, default="(none)")
    Task.add_dataset_arguments(parser)
    add_parallelism_args(parser)
    add_serving_arg(parser)
    parser.add_argument(
        "--resume", action="store_true",
        help="resume a preempted/interrupted run: phases whose labeled "
        "checkpoint already exists are skipped, the latest completed "
        "phase checkpoint is restored (params + optimizer state), and "
        "training continues from the first incomplete phase "
        "(crossmodal/resume.py)",
    )
    args = parser.parse_args(argv)
    # --serving on a TRAIN CLI: training itself provably strips the
    # serving transforms (train loops — bitwise plain training), so the
    # switch accelerates this run's EVAL passes + the Pallas train kernel.
    apply_serving_arg(args)  # before model build — knobs read at __init__
    mesh, pipeline_mesh = meshes_from_args(args)

    model_type = args.model_type
    dataset_args = Task.get_dataset_args(args)

    set_cache_path(crossmodal.__path__[0] + "/../.cache")
    pdb_safety_net()

    # Create model + buddy, persist experiment metadata.
    filter_model = Task.model_types[model_type]()
    if args.sequential_image_rate > 1:
        filter_model.know_image_blackout = True
    buddy = Buddy(args.experiment_name, filter_model)
    buddy.set_metadata(
        {
            "model_type": model_type,
            "dataset_args": dataset_args,
            "train_start_time": datetime.datetime.now().strftime(
                "%b %d, %Y @ %-H:%M:%S"
            ),
            "commit_hash": get_git_commit_hash(crossmodal.__file__),
            "notes": args.notes,
        }
    )

    train_trajectories = Task.get_train_trajectories(**dataset_args)

    train_helpers = crossmodal.train_helpers
    # --pipeline-stages applies to the EVAL passes only: the reference
    # curriculum's subsequence lengths (2/4/8/16 -> 1/3/7/15 BPTT steps)
    # never divide a stage count, so pipelined BPTT can't run the reference
    # curriculum — DP (--data-parallel) is the training-side axis here.
    # (train_helpers.train_e2e(pipeline_mesh=...) remains available for
    # custom curricula with compatible lengths.)
    train_helpers.configure(
        buddy=buddy, trajectories=train_trajectories, mesh=mesh,
    )
    eval_helpers = crossmodal.eval_helpers
    eval_helpers.configure(
        buddy=buddy, task=Task, dataset_args=dataset_args,
        # With BOTH CLI flags the grid already carries the data axis;
        # eval takes the composed mesh alone (cli.meshes_from_args).
        mesh=None if pipeline_mesh is not None else mesh,
        pipeline_mesh=pipeline_mesh,
        pipeline_microbatches=args.pipeline_microbatches,
    )

    from crossmodal.resume import ResumableCurriculum

    rc = ResumableCurriculum(
        buddy, train_helpers, eval_helpers, enabled=args.resume
    )
    rc.run(run_curriculum, filter_model)

    buddy.add_metadata(
        {
            "train_end_time": datetime.datetime.now().strftime("%b %d, %Y @ %-H:%M:%S"),
        }
    )
    eval_results = crossmodal.eval_helpers.run_eval()
    buddy.add_metadata({"eval_results": eval_results})


def run_curriculum(filter_model, buddy, train_helpers, eval_helpers):
    """Model-class-specific training curricula (reference train_door.py:61-460)."""
    dm = crossmodal.door_models

    if isinstance(filter_model, dm.DoorLSTMFilter):
        train_helpers.train_e2e(subsequence_length=2, epochs=2, batch_size=32)
        buddy.save_checkpoint("phase0")
        train_helpers.train_e2e(subsequence_length=4, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=8, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=16, epochs=15, batch_size=32)
        eval_helpers.log_eval()
        buddy.save_checkpoint("phase1")

    elif isinstance(filter_model, dm.DoorCrossmodalParticleFilter):
        # (Checked before DoorParticleFilter in the reference's dispatch
        # because the curricula differ; Seq5 lands here too.)
        measurement_model = filter_model.measurement_model
        freeze_module(measurement_model.crossmodal_weight_model)

        # Dynamics pretraining: the reference warm-starts from another
        # experiment's checkpoint when available (train_door.py:122-124);
        # fall back to training from scratch when it isn't.
        try:
            buddy.load_checkpoint_module(
                "dynamics_model", experiment_name="pf_blackout0.0_q_tune"
            )
        except (FileNotFoundError, AssertionError):
            train_helpers.train_pf_dynamics_single_step(epochs=5)
        train_helpers.train_pf_dynamics_recurrent(subsequence_length=16, epochs=5)
        buddy.save_checkpoint("phase1")

        freeze_module(filter_model.dynamics_model)
        buddy._optimizer_dict.clear()

        # Pre-train measurement model (image).
        measurement_model.enabled_models = [True, False]
        train_helpers.train_pf_measurement(epochs=3, batch_size=64)
        train_helpers.train_e2e(subsequence_length=4, epochs=5, batch_size=32)
        train_helpers.train_e2e(subsequence_length=8, epochs=5, batch_size=32)
        train_helpers.train_e2e(subsequence_length=16, epochs=20, batch_size=32)
        buddy.save_checkpoint("phase2")

        # Pre-train measurement model (proprioception + haptics).
        measurement_model.enabled_models = [False, True]
        train_helpers.train_pf_measurement(epochs=3, batch_size=64)
        train_helpers.train_e2e(subsequence_length=4, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=8, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=16, epochs=20, batch_size=32)
        eval_helpers.log_eval()
        buddy.save_checkpoint("phase3")
        buddy._optimizer_dict.clear()

        measurement_model.enabled_models = [True, True]
        unfreeze_module(measurement_model.crossmodal_weight_model)
        freeze_module(measurement_model.measurement_models)
        buddy._optimizer_dict.clear()

        # Train everything end-to-end.
        train_helpers.train_e2e(subsequence_length=4, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=8, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        for _ in range(4):
            train_helpers.train_e2e(subsequence_length=16, epochs=5, batch_size=32)
            eval_helpers.log_eval()
        buddy.save_checkpoint("phase4")

    elif isinstance(filter_model, dm.DoorUnimodalParticleFilter):
        measurement_model = filter_model.measurement_model

        train_helpers.train_pf_dynamics_single_step(epochs=5)
        buddy.save_checkpoint("phase0")
        train_helpers.train_pf_dynamics_recurrent(subsequence_length=4, epochs=5)
        train_helpers.train_pf_dynamics_recurrent(subsequence_length=8, epochs=5)
        train_helpers.train_pf_dynamics_recurrent(subsequence_length=16, epochs=5)
        buddy.save_checkpoint("phase1")

        freeze_module(filter_model.dynamics_model)

        measurement_model.enabled_models = [True, False]
        train_helpers.train_pf_measurement(epochs=3, batch_size=64)
        train_helpers.train_e2e(subsequence_length=4, epochs=5, batch_size=32)
        train_helpers.train_e2e(subsequence_length=8, epochs=5, batch_size=32)
        train_helpers.train_e2e(subsequence_length=16, epochs=20, batch_size=32)
        buddy.save_checkpoint("phase2")

        measurement_model.enabled_models = [False, True]
        train_helpers.train_pf_measurement(epochs=3, batch_size=64)
        train_helpers.train_e2e(subsequence_length=4, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=8, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=16, epochs=20, batch_size=32)
        eval_helpers.log_eval()
        buddy.save_checkpoint("phase3")

        measurement_model.enabled_models = [True, True]
        train_helpers.train_e2e(subsequence_length=4, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=8, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        for _ in range(4):
            train_helpers.train_e2e(subsequence_length=16, epochs=5, batch_size=32)
            eval_helpers.log_eval()
        buddy.save_checkpoint("phase4")

    elif isinstance(filter_model, dm.DoorParticleFilter):
        train_helpers.train_pf_dynamics_single_step(epochs=10)
        buddy.save_checkpoint("phase0")
        train_helpers.train_pf_dynamics_recurrent(subsequence_length=4, epochs=5)
        train_helpers.train_pf_dynamics_recurrent(subsequence_length=8, epochs=5)
        train_helpers.train_pf_dynamics_recurrent(subsequence_length=16, epochs=5)
        eval_helpers.log_eval()
        buddy.save_checkpoint("phase1")

        freeze_module(filter_model.dynamics_model)
        train_helpers.train_pf_measurement(epochs=5, batch_size=64)
        eval_helpers.log_eval()
        buddy.save_checkpoint("phase2")

        train_helpers.train_e2e(subsequence_length=4, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=8, epochs=5, batch_size=32)
        eval_helpers.log_eval()
        for _ in range(4):
            train_helpers.train_e2e(subsequence_length=16, epochs=5, batch_size=32)
            eval_helpers.log_eval()
        buddy.save_checkpoint("phase3")

    elif isinstance(filter_model, dm.DoorCrossmodalKalmanFilter):
        image_model = filter_model.filter_models[0]
        force_model = filter_model.filter_models[1]

        freeze_module(filter_model.crossmodal_weight_model)

        train_helpers.train_pf_dynamics_single_step(epochs=5, model=image_model)
        buddy.save_checkpoint("phase0")
        buddy.load_checkpoint_module(
            source="filter_models.0.dynamics_model",
            target="filter_models.1.dynamics_model",
            label="phase0",
        )

        train_helpers.train_pf_dynamics_recurrent(
            subsequence_length=4, epochs=5, model=image_model
        )
        train_helpers.train_pf_dynamics_recurrent(
            subsequence_length=8, epochs=5, model=image_model
        )
        train_helpers.train_pf_dynamics_recurrent(
            subsequence_length=16, epochs=5, model=image_model
        )
        buddy.save_checkpoint("phase1")
        buddy.load_checkpoint_module(
            source="filter_models.0.dynamics_model",
            target="filter_models.1.dynamics_model",
            label="phase1",
        )

        train_helpers.train_virtual_sensor(epochs=5, batch_size=64, model=image_model)
        train_helpers.train_virtual_sensor(epochs=5, batch_size=64, model=force_model)
        buddy.save_checkpoint("phase2")

        # Pre-train each child EKF end-to-end with named optimizers.
        filter_model.enabled_models = [True, False]
        for length, epochs in ((4, 3), (8, 3), (16, 5)):
            train_helpers.train_e2e(
                subsequence_length=length, epochs=epochs, batch_size=32,
                optimizer_name="image_ekf",
            )
            eval_helpers.log_eval()
        buddy.save_checkpoint("phase3-image")

        filter_model.enabled_models = [False, True]
        for length, epochs in ((4, 3), (8, 3), (16, 5)):
            train_helpers.train_e2e(
                subsequence_length=length, epochs=epochs, batch_size=32,
                optimizer_name="force_ekf",
            )
            eval_helpers.log_eval()
        buddy.save_checkpoint("phase3-force")

        filter_model.enabled_models = [True, True]
        unfreeze_module(filter_model.crossmodal_weight_model)
        freeze_module(filter_model.filter_models)
        train_helpers.train_e2e(
            subsequence_length=3, epochs=1, batch_size=32, optimizer_name="freeze_ekf"
        )
        buddy.save_checkpoint("phase4-freeze")

        unfreeze_module(filter_model.filter_models)
        train_helpers.train_e2e(
            subsequence_length=3, epochs=5, batch_size=32, measurement_initialize=False
        )
        eval_helpers.log_eval()
        buddy.save_checkpoint("phase4-length3")
        for _ in range(3):
            train_helpers.train_e2e(
                subsequence_length=4, epochs=5, batch_size=32,
                measurement_initialize=False,
            )
            eval_helpers.log_eval()
        buddy.save_checkpoint("phase4-length4")
        for _ in range(2):
            train_helpers.train_e2e(
                subsequence_length=6, epochs=5, batch_size=32,
                measurement_initialize=False,
            )
            eval_helpers.log_eval()
            print("kalman e2e")
        buddy.save_checkpoint("phase4-done")

    elif isinstance(
        filter_model,
        (dm.DoorMeasurementCrossmodalKalmanFilter, dm.DoorMeasurementUnimodalKalmanFilter),
    ):
        # Measurement-level fusion EKFs share the plain-EKF curriculum.
        _ekf_curriculum(filter_model, buddy, train_helpers, eval_helpers)

    elif isinstance(filter_model, dm.DoorUnimodalKalmanFilter):
        image_model = filter_model.filter_models[0]
        force_model = filter_model.filter_models[1]

        train_helpers.train_pf_dynamics_single_step(epochs=5, model=image_model)
        buddy.save_checkpoint("phase0")
        buddy.load_checkpoint_module(
            source="filter_models.0.dynamics_model",
            target="filter_models.1.dynamics_model",
            label="phase0",
        )
        train_helpers.train_pf_dynamics_recurrent(
            subsequence_length=4, epochs=5, model=image_model
        )
        train_helpers.train_pf_dynamics_recurrent(
            subsequence_length=8, epochs=5, model=image_model
        )
        train_helpers.train_pf_dynamics_recurrent(
            subsequence_length=16, epochs=5, model=image_model
        )
        buddy.save_checkpoint("phase1")
        buddy.load_checkpoint_module(
            source="filter_models.0.dynamics_model",
            target="filter_models.1.dynamics_model",
            label="phase1",
        )

        train_helpers.train_virtual_sensor(epochs=3, batch_size=64, model=image_model)
        train_helpers.train_virtual_sensor(epochs=3, batch_size=64, model=force_model)
        buddy.save_checkpoint("phase2")

        filter_model.enabled_models = [True, False]
        train_helpers.train_e2e(subsequence_length=4, epochs=3, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=8, epochs=3, batch_size=32)
        eval_helpers.log_eval()
        print("kalman image")
        train_helpers.train_e2e(subsequence_length=16, epochs=5, batch_size=32)

        filter_model.enabled_models = [False, True]
        train_helpers.train_e2e(subsequence_length=4, epochs=3, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=8, epochs=3, batch_size=32)
        eval_helpers.log_eval()
        train_helpers.train_e2e(subsequence_length=16, epochs=5, batch_size=32)
        print("kalman force")
        eval_helpers.log_eval()
        buddy.save_checkpoint("phase3")

        filter_model.enabled_models = [True, True]
        freeze_module(filter_model.filter_models)
        train_helpers.train_e2e(subsequence_length=4, epochs=1, batch_size=32)
        unfreeze_module(filter_model.filter_models)

        train_helpers.train_e2e(
            subsequence_length=3, epochs=5, batch_size=32, measurement_initialize=True
        )
        eval_helpers.log_eval()
        for _ in range(3):
            train_helpers.train_e2e(
                subsequence_length=4, epochs=5, batch_size=32,
                measurement_initialize=True,
            )
            eval_helpers.log_eval()
        buddy.save_checkpoint("phase4-length4")
        for _ in range(2):
            train_helpers.train_e2e(
                subsequence_length=6, epochs=5, batch_size=32,
                measurement_initialize=True,
            )
            eval_helpers.log_eval()
            print("kalman e2e")
        buddy.save_checkpoint("phase4-final")

    elif isinstance(filter_model, dm.DoorKalmanFilter):
        _ekf_curriculum(filter_model, buddy, train_helpers, eval_helpers)

    else:
        assert False, "No training curriculum found for model type"


def _ekf_curriculum(filter_model, buddy, train_helpers, eval_helpers):
    """Plain virtual-sensor EKF curriculum (reference train_door.py:225-259)."""
    train_helpers.train_pf_dynamics_single_step(epochs=10)
    buddy.save_checkpoint("phase0")
    train_helpers.train_pf_dynamics_recurrent(subsequence_length=4, epochs=5)
    train_helpers.train_pf_dynamics_recurrent(subsequence_length=8, epochs=5)
    train_helpers.train_pf_dynamics_recurrent(subsequence_length=16, epochs=5)
    eval_helpers.log_eval()
    buddy.save_checkpoint("phase1")

    freeze_module(filter_model.dynamics_model)
    train_helpers.train_virtual_sensor(epochs=10, batch_size=64)
    eval_helpers.log_eval()
    buddy.save_checkpoint("phase2")

    train_helpers.train_e2e(
        subsequence_length=4, epochs=5, batch_size=32, measurement_initialize=True
    )
    eval_helpers.log_eval()
    train_helpers.train_e2e(
        subsequence_length=8, epochs=5, batch_size=32, measurement_initialize=True
    )
    eval_helpers.log_eval()
    for _ in range(4):
        train_helpers.train_e2e(
            subsequence_length=16, epochs=5, batch_size=32, measurement_initialize=True
        )
        eval_helpers.log_eval()
    buddy.save_checkpoint("phase3")


if __name__ == "__main__":
    main()
