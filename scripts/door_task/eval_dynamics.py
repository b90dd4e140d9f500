"""Dynamics-only rollout evaluation.

Command-line parity with the reference ``scripts/door_task/eval_dynamics.py``:
isolates the dynamics model via run_eval(eval_dynamics=True) ->
dynamics_model.forward_loop (reference eval_dynamics.py:37,
eval_helpers.py:134-137).
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment-name", type=str, required=True)
    parser.add_argument("--checkpoint-label", type=str, default=None)
    args = parser.parse_args()

    set_cache_path(crossmodal.__path__[0] + "/../.cache")

    buddy = Buddy(args.experiment_name)
    model_type = buddy.metadata["model_type"]
    dataset_args = buddy.metadata["dataset_args"]

    filter_model = Task.model_types[model_type]()
    buddy.attach_model(filter_model)
    buddy.load_checkpoint(label=args.checkpoint_label)

    crossmodal.eval_helpers.configure(
        buddy=buddy, task=Task, dataset_args=dataset_args
    )
    crossmodal.eval_helpers.run_eval(eval_dynamics=True)


if __name__ == "__main__":
    main()
