"""CLI flags for the parallelism layers.

The reference CLIs are single-device (SURVEY §2.5 — no distributed layer
exists there); these flags are additive TPU enablement so the train/eval
CLIs can reach the data-parallel and temporal-pipeline paths without code:

    train_door.py ... --data-parallel 8        # batch axis over 8 chips
    eval_door.py  ... --pipeline-stages 8      # time axis over 8 chips
    eval_door.py  ... --data-parallel 2 --pipeline-stages 4
                                               # composed 2-D grid: batch
                                               # over 2, time over 4, on
                                               # 8 chips total

All build `jax.sharding.Mesh`es over the first N visible devices
(parallel/mesh.py::create_mesh) and hard-fail if fewer are visible — on a
single chip simply omit the flags. Given BOTH flags, rollouts run on the
composed data x pipe grid (D*P devices); on the train CLIs the D-wide DP
mesh additionally shards BPTT training (the pipeline applies to eval
passes only — see the train CLIs), so eval paths must prefer
`pipeline_mesh` over `mesh` when both are returned.
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple


def add_parallelism_args(parser: argparse.ArgumentParser) -> None:
    group = parser.add_argument_group("parallelism (TPU enablement)")
    group.add_argument(
        "--data-parallel", type=int, default=None, metavar="N",
        help="shard the batch axis data-parallel over a mesh of the first "
        "N visible devices (parallel/data_parallel.py)",
    )
    group.add_argument(
        "--pipeline-stages", type=int, default=None, metavar="N",
        help="shard the TIME axis over N pipeline stages (GPipe schedule, "
        "belief relayed stage->stage — parallel/temporal_pipeline.py); "
        "combined with --data-parallel D, rollouts run on the composed "
        "(D data x N pipe) grid over D*N devices",
    )
    group.add_argument(
        "--pipeline-microbatches", type=int, default=None, metavar="M",
        help="microbatch count for --pipeline-stages (default: auto — the "
        "largest divisor of the (per-data-shard) batch up to 8)",
    )


def add_serving_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--serving", action="store_true",
        help="apply the validated production-serving stack (Pallas PF "
        "kernels + bf16 encoder compute + folded encoder tail — bench.py's "
        "value_saturated_best configuration); equivalent to "
        "MMF_TPU_SERVING=1, and per-knob MMF_TPU_{PALLAS,BF16,FOLD_ENC} "
        "envs still override individually",
    )


def apply_serving_arg(args) -> None:
    """Set MMF_TPU_SERVING from --serving.

    Must run before any model is constructed: StatefulFilter reads the
    serving knobs at build time (filtering/wrappers.py::StatefulFilter).
    """
    if getattr(args, "serving", False):
        import os

        os.environ["MMF_TPU_SERVING"] = "1"


def meshes_from_args(args) -> Tuple[Optional[object], Optional[object]]:
    """(mesh, pipeline_mesh) from parsed CLI args, either possibly None.

    With both flags set, `pipeline_mesh` is the composed (D data x P pipe)
    grid and `mesh` is the D-wide DP mesh for BPTT training; eval paths
    take the grid (pass mesh=None alongside it — eval_helpers.configure
    treats the two as exclusive because the grid already carries the data
    axis)."""
    from .mesh import create_mesh

    mesh = None
    pipeline_mesh = None
    if args.data_parallel is not None:
        mesh = create_mesh(args.data_parallel)
    if args.pipeline_stages is not None:
        if args.data_parallel is not None:
            pipeline_mesh = create_mesh(
                args.data_parallel * args.pipeline_stages,
                axis_names=("data", "pipe"),
                shape=(args.data_parallel, args.pipeline_stages),
            )
        else:
            pipeline_mesh = create_mesh(
                args.pipeline_stages, axis_names=("pipe",)
            )
    return mesh, pipeline_mesh
