"""Training-dynamics parity: run the door EKF curriculum in BOTH frameworks
(this repo's JAX training stack vs the reference-faithful torch mirror in
torch_door_ekf.py) on identical synthetic data from identical copied
initial weights, and compare per-phase eval RMSE (VERDICT r4 missing #1 /
next #1).

Both sides use the same dataset windows, the same Adam(1e-4), the same
losses, and the same shuffled batch-index streams (seeded from the
cumulative optimizer-step count on each side), so agreement here means the
frameworks follow the same optimization trajectory — "forward-pass
equivalence" upgraded to "the frameworks learn the same filter". Remaining
divergence is framework fp arithmetic + Adam numerics only.

Usage:
    python scripts/parity/train_dynamics_parity.py            # abbreviated
    python scripts/parity/train_dynamics_parity.py --full     # full EKF
        curriculum (reference train_door.py:225-259) — minutes on CPU
    ... --markdown docs/parity_training_r5.md                 # write table
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)
sys.path.insert(0, os.path.abspath(os.path.dirname(__file__)))


def run_parity(full: bool = False, synth_traj: int = 4, synth_t: int = 48,
               workdir: str = None, use_cpu: bool = True):
    """Returns a list of rows: {phase, framework, theta_rmse_deg, x_rmse_cm,
    y_rmse_cm, seconds}.

    use_cpu=True pins JAX to the host CPU — fully deterministic, but
    XLA:CPU's conv-gradient lowering is ~100x slower than torch's, so the
    conv-bearing phases (virtual sensor, e2e) take hours on a 1-core box;
    use it for the abbreviated suite test. use_cpu=False (--device tpu)
    runs the JAX side on the accelerator with
    jax_default_matmul_precision=highest, so matmuls/convs stay fp32-exact
    (TPU default would be bf16 passes) and only libm-level transcendental
    differences separate the frameworks — the config behind the full-
    curriculum table in docs/parity_training_r5.md."""
    import jax

    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    # fp32-exact matmuls/convs on either backend: on TPU the default would
    # be bf16 passes, which would widen the cross-framework tolerance from
    # reassociation-level to bf16-level.
    jax.config.update("jax_default_matmul_precision", "highest")
    os.environ.setdefault("MMF_TPU_EVAL_DEVICE_THROUGHPUT", "0")
    os.environ["MMF_TPU_SYNTHESIZE_DATA"] = "1"
    os.environ["MMF_TPU_SYNTH_TRAJ"] = str(synth_traj)
    os.environ["MMF_TPU_SYNTH_T"] = str(synth_t)

    import torch

    import crossmodal
    import torch_door_ekf as tde
    from crossmodal.tasks import DoorTask
    from multimodalfilter_tpu.data import (
        SingleStepDataset,
        SubsequenceDataset,
        set_cache_path,
    )
    from multimodalfilter_tpu.experiments import Buddy
    from multimodalfilter_tpu.filtering.wrappers import freeze_module

    workdir = workdir or tempfile.mkdtemp(prefix="parity_")
    set_cache_path(os.path.join(workdir, "cache"))

    dataset_args = dict(
        use_vision=True, use_proprioception=True, use_haptics=True,
        image_blackout_ratio=0.0, sequential_image_rate=1,
    )
    train_trajs = DoorTask.get_train_trajectories(**dataset_args)
    eval_trajs = DoorTask.get_eval_trajectories(**dataset_args)

    # --- JAX model + torch mirror from the SAME initial weights ---
    jax_model = DoorTask.model_types["DoorKalmanFilter"]()
    torch_model = tde.DoorEKF(units=64)
    tde.copy_from_jax(torch_model, jax_model.params)

    buddy = Buddy(
        "parity_jax", jax_model,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        metadata_dir=os.path.join(workdir, "meta"),
        log_dir=os.path.join(workdir, "logs"),
        verbose=False,
    )
    th = crossmodal.train_helpers
    th.configure(buddy=buddy, trajectories=train_trajs)
    eh = crossmodal.eval_helpers
    eh.configure(buddy=buddy, task=DoorTask, dataset_args=dataset_args)

    trainer = tde.TorchTrainer(torch_model)

    # Datasets (identical windows on both sides — same classes, same data).
    single = SingleStepDataset(trajectories=train_trajs)

    def sub(n):
        return SubsequenceDataset(trajectories=train_trajs, subsequence_length=n)

    # --- the phase schedule (reference train_door.py:225-259) ---
    if full:
        phases = [
            ("phase0 dyn-single e10",
             lambda: th.train_pf_dynamics_single_step(epochs=10),
             lambda: trainer.train_dynamics_single_step(single, epochs=10)),
            ("phase1 dyn-rec 4/8/16 e5",
             lambda: [th.train_pf_dynamics_recurrent(subsequence_length=n, epochs=5)
                      for n in (4, 8, 16)],
             lambda: [trainer.train_dynamics_recurrent(sub(n), epochs=5)
                      for n in (4, 8, 16)]),
            ("phase2 vsensor e10",
             lambda: (freeze_module(jax_model.dynamics_model),
                      th.train_virtual_sensor(epochs=10, batch_size=64)),
             lambda: (trainer.freeze(torch_model.dynamics_model),
                      trainer.train_virtual_sensor(single, epochs=10,
                                                   batch_size=64))),
            ("phase3 e2e L4 e5",
             lambda: th.train_e2e(subsequence_length=4, epochs=5,
                                  batch_size=32, measurement_initialize=True),
             lambda: trainer.train_e2e(sub(4), epochs=5, batch_size=32,
                                       measurement_initialize=True)),
            ("phase3 e2e L8 e5",
             lambda: th.train_e2e(subsequence_length=8, epochs=5,
                                  batch_size=32, measurement_initialize=True),
             lambda: trainer.train_e2e(sub(8), epochs=5, batch_size=32,
                                       measurement_initialize=True)),
            ("phase3 e2e L16 e20",
             lambda: [th.train_e2e(subsequence_length=16, epochs=5,
                                   batch_size=32, measurement_initialize=True)
                      for _ in range(4)],
             lambda: [trainer.train_e2e(sub(16), epochs=5, batch_size=32,
                                        measurement_initialize=True)
                      for _ in range(4)]),
        ]
    else:
        phases = [
            ("phase0 dyn-single e2",
             lambda: th.train_pf_dynamics_single_step(epochs=2),
             lambda: trainer.train_dynamics_single_step(single, epochs=2)),
            ("phase1 dyn-rec L4 e1",
             lambda: th.train_pf_dynamics_recurrent(subsequence_length=4, epochs=1),
             lambda: trainer.train_dynamics_recurrent(sub(4), epochs=1)),
            ("phase2 vsensor e2",
             lambda: (freeze_module(jax_model.dynamics_model),
                      th.train_virtual_sensor(epochs=2, batch_size=32)),
             lambda: (trainer.freeze(torch_model.dynamics_model),
                      trainer.train_virtual_sensor(single, epochs=2,
                                                   batch_size=32))),
            ("phase3 e2e L4 e1",
             lambda: th.train_e2e(subsequence_length=4, epochs=1,
                                  batch_size=8, measurement_initialize=True),
             lambda: trainer.train_e2e(sub(4), epochs=1, batch_size=8,
                                       measurement_initialize=True)),
        ]

    rows = []

    def record(phase):
        r_jax = eh.run_eval()
        with torch.no_grad():
            r_torch = tde.run_eval(torch_model, eval_trajs)
        for fw, r in (("jax", r_jax), ("torch", r_torch)):
            rows.append({
                "phase": phase, "framework": fw,
                "theta_rmse_deg": r["theta_rmse_deg"],
                "x_rmse_cm": r["x_rmse_cm"], "y_rmse_cm": r["y_rmse_cm"],
            })
        print(f"[parity] {phase}: jax theta {r_jax['theta_rmse_deg']:.3f} "
              f"vs torch {r_torch['theta_rmse_deg']:.3f} deg; "
              f"x {r_jax['x_rmse_cm']:.3f} vs {r_torch['x_rmse_cm']:.3f} cm",
              flush=True)

    record("init (copied weights)")
    for name, jax_fn, torch_fn in phases:
        t0 = time.perf_counter()
        jax_fn()
        t_jax = time.perf_counter() - t0
        t0 = time.perf_counter()
        torch_fn()
        t_torch = time.perf_counter() - t0
        print(f"[parity] {name}: trained (jax {t_jax:.1f}s, "
              f"torch {t_torch:.1f}s)", flush=True)
        record(name)
    return rows


def to_markdown(rows) -> str:
    lines = [
        "| phase | framework | theta RMSE (deg) | x RMSE (cm) | y RMSE (cm) |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['phase']} | {r['framework']} | "
            f"{r['theta_rmse_deg']:.4f} | {r['x_rmse_cm']:.4f} | "
            f"{r['y_rmse_cm']:.4f} |"
        )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--synth-traj", type=int, default=4)
    ap.add_argument("--synth-t", type=int, default=48)
    ap.add_argument("--markdown", default=None)
    ap.add_argument("--device", choices=("cpu", "tpu"), default="cpu",
                    help="JAX-side device (torch always runs on CPU); see "
                    "run_parity docstring for the cpu-conv-gradient caveat")
    args = ap.parse_args()
    rows = run_parity(full=args.full, synth_traj=args.synth_traj,
                      synth_t=args.synth_t, use_cpu=args.device == "cpu")
    table = to_markdown(rows)
    print(table)
    if args.markdown:
        with open(args.markdown, "w") as f:
            f.write(
                "# Training-dynamics parity: JAX vs torch (door EKF "
                "curriculum)\n\n"
                "Identical synthetic data, identical copied initial "
                "weights, identical batch-index streams, Adam(1e-4) both "
                "sides. Generated by scripts/parity/train_dynamics_parity"
                f".py ({'full' if args.full else 'abbreviated'} schedule, "
                f"{args.synth_traj} trajs x T={args.synth_t}; JAX side on "
                f"{args.device} with matmul precision=highest, torch on "
                "CPU).\n\n"
            )
            f.write(table + "\n")
        print(f"wrote {args.markdown}")


if __name__ == "__main__":
    main()
