"""Door-task eval CLI.

Command-line parity with the reference ``scripts/door_task/eval_door.py``:
a checkpoint + its metadata fully determine model reconstruction — the eval
script never re-specifies the architecture (eval_door.py:25-32).
"""

import argparse

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

Task = crossmodal.tasks.DoorTask


def main(argv=None):
    from multimodalfilter_tpu.parallel.cli import (
        add_parallelism_args,
        add_serving_arg,
        apply_serving_arg,
        meshes_from_args,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment-name", type=str, required=True)
    parser.add_argument("--checkpoint-label", type=str, default=None)
    parser.add_argument("--save", action="store_true")
    parser.add_argument("--measurement_init", action="store_true")
    parser.add_argument(
        "--batched-repeats", action=argparse.BooleanOptionalAction,
        default=True,
        help="fold the 20 stochastic eval repeats into the batch axis "
        "(one (T, N*R) rollout per chunk instead of R sequential rollouts "
        "— the N=16 eval batch under-fills the chip ~16x, so this buys "
        "most of that factor in eval wall time; statistically identical, "
        "per-repeat stats unchanged). Equivalent to "
        "MMF_TPU_EVAL_BATCH_REPEATS=1",
    )
    parser.add_argument(
        "--profile-dir", type=str, default=None, metavar="DIR",
        help="capture a jax.profiler trace of the eval rollouts into DIR "
        "(view with TensorBoard's profile plugin or xprof); traces include "
        "the configured serving/parallelism stack",
    )
    add_parallelism_args(parser)
    add_serving_arg(parser)
    args = parser.parse_args(argv)
    apply_serving_arg(args)  # before model build — knobs read at __init__
    # Default ON since round 4: stats validated identical to the sequential
    # path (tests/test_eval_sharded.py) and CLI wall time drops ~5.4x.
    # --no-batched-repeats restores the reference-exact sequential key
    # stream (one rollout per repeat).
    os.environ["MMF_TPU_EVAL_BATCH_REPEATS"] = (
        "1" if args.batched_repeats else "0"
    )
    mesh, pipeline_mesh = meshes_from_args(args)

    set_cache_path(crossmodal.__path__[0] + "/../.cache")

    buddy = Buddy(args.experiment_name)
    model_type = buddy.metadata["model_type"]
    dataset_args = buddy.metadata["dataset_args"]

    filter_model = Task.model_types[model_type]()
    buddy.attach_model(filter_model)
    buddy.load_checkpoint(label=args.checkpoint_label)

    crossmodal.eval_helpers.configure(
        buddy=buddy, task=Task, dataset_args=dataset_args,
        # With BOTH CLI flags the grid already carries the data axis;
        # eval takes the composed mesh alone (cli.meshes_from_args).
        mesh=None if pipeline_mesh is not None else mesh,
        pipeline_mesh=pipeline_mesh,
        pipeline_microbatches=args.pipeline_microbatches,
    )
    from multimodalfilter_tpu.utils.debug import profile_trace

    with profile_trace(args.profile_dir, enabled=args.profile_dir is not None):
        results = crossmodal.eval_helpers.run_eval_stats(
            measurement_initialize=args.measurement_init
        )

    if args.save:
        buddy.add_metadata({"eval_results_stats": results})


if __name__ == "__main__":
    main()
