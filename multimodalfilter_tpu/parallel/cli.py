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
    eval_door.py  ... --particle-shards 8      # PF particle axis M over 8
    eval_door.py  ... --data-parallel 2 --pipeline-stages 2 \
                      --particle-shards 2      # full 3-D grid on 8 chips

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
        "(D data x N pipe) grid over D*N devices. NOTE: when the eval "
        "batch divides over N devices, pure --data-parallel N is usually "
        "FASTER — GPipe fills at m/(m+N-1) (53%% at the default m=8 over "
        "8 stages) while DP has no bubble; reach for the pipe axis when "
        "the batch axis is exhausted (N > batch) or per-device memory "
        "forces a T split (see docs/PERFORMANCE.md, 'Choosing a "
        "parallelism axis')",
    )
    group.add_argument(
        "--pipeline-microbatches", type=int, default=None, metavar="M",
        help="microbatch count for --pipeline-stages (default: auto — the "
        "largest divisor of the (per-data-shard) batch up to 8)",
    )
    group.add_argument(
        "--particle-shards", type=int, default=None, metavar="Q",
        help="shard the PF particle axis M over Q devices inside each "
        "(data, pipe) cell (particle-filter models only; M must divide by "
        "Q — parallel/particle_sharding.py). Composes with "
        "--data-parallel and --pipeline-stages into the full 3-D "
        "data x pipe x particle grid; used alone it runs the "
        "particle-sharded loop on a 1-stage pipe axis. Note: the sharded "
        "resampler is collective (all_gather + searchsorted), so the fused "
        "Pallas PF kernel from --serving does not apply inside it",
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
    for flag in ("data_parallel", "pipeline_stages",
                 "pipeline_microbatches", "particle_shards"):
        val = getattr(args, flag, None)
        if val is not None and val < 1:
            raise SystemExit(
                f"--{flag.replace('_', '-')} must be >= 1 (got {val})"
            )
    if args.data_parallel is not None:
        mesh = create_mesh(args.data_parallel)
    particle = getattr(args, "particle_shards", None)
    if args.pipeline_stages is not None or particle is not None:
        # Grid axes in (data, pipe, particle) order; each is present only
        # when its flag is set, except pipe — the facade routes all grid
        # shardings through the pipelined loop, so a particle-only request
        # rides a 1-stage pipe axis (semantically the standalone
        # particle-sharded loop; bitwise at micro=1).
        stages = (
            args.pipeline_stages if args.pipeline_stages is not None else 1
        )
        axes: list = []
        shape: list = []
        if args.data_parallel is not None:
            axes.append("data")
            shape.append(args.data_parallel)
        axes.append("pipe")
        shape.append(stages)
        if particle is not None:
            axes.append("particle")
            shape.append(particle)
        total = 1
        for s in shape:
            total *= s
        pipeline_mesh = create_mesh(
            total, axis_names=tuple(axes), shape=tuple(shape)
        )
        if (
            stages == 1
            and getattr(args, "pipeline_microbatches", None) is None
        ):
            # A 1-stage pipe gains nothing from microbatching — splitting
            # the batch would only shrink the per-step matmuls.
            args.pipeline_microbatches = 1
    return mesh, pipeline_mesh
