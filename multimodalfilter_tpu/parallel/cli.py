"""CLI flags for the parallelism layers.

The reference CLIs are single-device (SURVEY §2.5 — no distributed layer
exists there); these flags are additive TPU enablement so the train/eval
CLIs can reach the data-parallel and temporal-pipeline paths without code:

    train_door.py ... --data-parallel 8        # batch axis over 8 chips
    eval_door.py  ... --pipeline-stages 8      # time axis over 8 chips

Both build a `jax.sharding.Mesh` over the first N visible devices
(parallel/mesh.py::create_mesh) and hard-fail if fewer are visible — on a
single chip simply omit the flags. They are mutually exclusive, mirroring
`train_helpers.configure` / `eval_helpers.configure`.
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
        "exclusive with --data-parallel",
    )
    group.add_argument(
        "--pipeline-microbatches", type=int, default=None, metavar="M",
        help="microbatch count for --pipeline-stages (default: auto — the "
        "largest divisor of the batch up to 8)",
    )


def meshes_from_args(args) -> Tuple[Optional[object], Optional[object]]:
    """(mesh, pipeline_mesh) from parsed CLI args, either possibly None."""
    from .mesh import create_mesh

    if args.data_parallel is not None and args.pipeline_stages is not None:
        raise SystemExit(
            "--data-parallel and --pipeline-stages are mutually exclusive"
        )
    mesh = None
    pipeline_mesh = None
    if args.data_parallel is not None:
        mesh = create_mesh(args.data_parallel)
    if args.pipeline_stages is not None:
        pipeline_mesh = create_mesh(
            args.pipeline_stages, axis_names=("pipe",)
        )
    return mesh, pipeline_mesh
