"""One-command real-data parity rehearsal.

All RMSE evidence in this air-gapped environment is synthetic-data; this
script is the single entry point that turns into a REAL parity run the day
egress (or pre-placed files) exists:

    python scripts/parity_rehearsal.py --task door --model-type DoorParticleFilter

does, in order:
  1. resolve the reference datasets through the cache
     (multimodalfilter_tpu/data/cache.py::cached_file — downloads the
     Drive-hosted HDF5s exactly like fannypack's cached_drive_file when the
     network exists; uses files already placed under --cache-dir otherwise;
     or synthesizes stand-ins under MMF_TPU_SYNTHESIZE_DATA=1 for the
     dry-run — the same resolution order the task loaders use,
     crossmodal/tasks/_door.py);
  2. optionally import a reference PyTorch checkpoint
     (--torch-checkpoint: experiments/torch_import.py — the param trees
     mirror the reference module paths, so trained reference models load
     directly);
  3. run one e2e train phase (train_helpers.train_e2e, the reference's
     train_filter equivalent; --skip-train to eval a checkpoint as-is);
  4. run the full 20-repeat eval (eval_helpers.run_eval_stats — identical
     metric names/constants to /root/reference/crossmodal/eval_helpers.py:
     148-216) and print + persist the RMSE table.

Reference protocol being rehearsed: scripts/*/train_*.py phase schedules +
eval_helpers.py metrics in /root/reference. Dry-run tested (file:// URLs +
synthetic HDF5) by tests/test_scripts.py::test_parity_rehearsal.
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

import crossmodal
from multimodalfilter_tpu.data import set_cache_path
from multimodalfilter_tpu.experiments import Buddy
from multimodalfilter_tpu.utils import pdb_safety_net


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Download -> [import checkpoint] -> train one phase -> "
        "20-repeat eval, in one command."
    )
    parser.add_argument("--task", choices=("door", "push"), default="door")
    parser.add_argument("--model-type", type=str, default=None,
                        help="registry name (default: the task's plain PF)")
    parser.add_argument("--experiment-name", type=str,
                        default="parity_rehearsal")
    parser.add_argument("--cache-dir", type=str, default=None,
                        help="dataset cache dir (pre-place HDF5s here to "
                        "skip the download)")
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="reference PyTorch .ckpt to import before "
                        "training/eval")
    parser.add_argument("--epochs", type=int, default=1,
                        help="e2e train epochs for the rehearsal phase")
    parser.add_argument("--subsequence-length", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--skip-train", action="store_true",
                        help="eval only (e.g. a freshly imported reference "
                        "checkpoint)")
    parser.add_argument("--eval-repeats", type=int, default=20)
    parser.add_argument("--output-json", type=str, default=None,
                        help="write the stats table here as JSON")
    args, extra = parser.parse_known_args(argv)

    Task = (
        crossmodal.tasks.DoorTask if args.task == "door"
        else crossmodal.tasks.PushTask
    )
    dataset_parser = argparse.ArgumentParser()
    Task.add_dataset_arguments(dataset_parser)
    dataset_args = Task.get_dataset_args(dataset_parser.parse_args(extra))

    model_type = args.model_type or (
        "DoorParticleFilter" if args.task == "door" else "PushParticleFilter"
    )
    assert model_type in Task.model_types, (
        f"{model_type!r} not in {sorted(Task.model_types)}"
    )

    set_cache_path(
        args.cache_dir
        or os.path.join(crossmodal.__path__[0], "..", ".cache")
    )
    pdb_safety_net()

    # 1. Datasets (download / pre-placed / synthetic — cache.py order).
    print(f"[rehearsal] loading {args.task} datasets ...", flush=True)
    train_trajectories = Task.get_train_trajectories(**dataset_args)
    print(f"[rehearsal] {len(train_trajectories)} train trajectories",
          flush=True)

    # 2. Model (+ optional reference-checkpoint import).
    filter_model = Task.model_types[model_type]()
    buddy = Buddy(args.experiment_name, filter_model)
    buddy.set_metadata({
        "model_type": model_type,
        "dataset_args": dataset_args,
        "rehearsal_start": datetime.datetime.now().isoformat(),
    })
    if args.torch_checkpoint:
        print(f"[rehearsal] importing reference checkpoint "
              f"{args.torch_checkpoint}", flush=True)
        buddy.load_torch_checkpoint(args.torch_checkpoint)

    train_helpers = crossmodal.train_helpers
    eval_helpers = crossmodal.eval_helpers
    train_helpers.configure(buddy=buddy, trajectories=train_trajectories)
    eval_helpers.configure(buddy=buddy, task=Task, dataset_args=dataset_args)

    # 3. One e2e train phase (the reference's train_filter equivalent).
    if not args.skip_train:
        print(f"[rehearsal] e2e train: {args.epochs} epoch(s), "
              f"L={args.subsequence_length}, B={args.batch_size}", flush=True)
        loss = train_helpers.train_e2e(
            subsequence_length=args.subsequence_length,
            epochs=args.epochs,
            batch_size=args.batch_size,
        )
        print(f"[rehearsal] final e2e loss: {loss:.6f}", flush=True)
        buddy.save_checkpoint("parity_rehearsal")

    # 4. The reference's 20-repeat stochastic eval table.
    print(f"[rehearsal] running {args.eval_repeats}-repeat eval ...",
          flush=True)
    stats = eval_helpers.run_eval_stats(repeats=args.eval_repeats)

    buddy.add_metadata({
        "rehearsal_eval_stats": stats,
        "rehearsal_end": datetime.datetime.now().isoformat(),
    })
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(stats, f, indent=2)
        print(f"[rehearsal] stats -> {args.output_json}", flush=True)
    return stats


if __name__ == "__main__":
    main()
