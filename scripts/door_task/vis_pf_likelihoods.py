"""Visualize per-modality PF measurement log-likelihood landscapes.

Script equivalent of the reference's
``scripts/door_task/vis_pf_likelihoods.ipynb``: load a trained crossmodal PF
checkpoint, sweep a 2D grid of states around the ground truth at a chosen
timestep, and render each modality's measurement log-likelihood as a heatmap
(the figure-generation workflow for the paper).

Usage:
  python scripts/door_task/vis_pf_likelihoods.py \
      --experiment-name cmpf_run --timestep 100 --output likelihoods.png
"""

import argparse

import numpy as np

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
    parser.add_argument("--trajectory", type=int, default=0)
    parser.add_argument("--timestep", type=int, default=50)
    parser.add_argument("--grid-size", type=int, default=41)
    parser.add_argument("--grid-radius", type=float, default=2.0)
    parser.add_argument("--dims", type=int, nargs=2, default=(0, 1),
                        help="state dims to sweep (default: theta, hinge-x)")
    parser.add_argument("--output", type=str, default="pf_likelihoods.png")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    set_cache_path(crossmodal.__path__[0] + "/../.cache")

    buddy = Buddy(args.experiment_name)
    filter_model = Task.model_types[buddy.metadata["model_type"]]()
    buddy.attach_model(filter_model)
    buddy.load_checkpoint(label=args.checkpoint_label)

    trajectories = Task.get_eval_trajectories(**buddy.metadata["dataset_args"])
    traj = trajectories[args.trajectory]
    t = min(args.timestep, traj.states.shape[0] - 1)
    gt_state = traj.states[t]
    observations = {k: v[t : t + 1] for k, v in traj.observations.items()}

    # Build the 2D sweep grid around the ground truth.
    g = args.grid_size
    d0, d1 = args.dims
    axis = np.linspace(-args.grid_radius, args.grid_radius, g, dtype=np.float32)
    states = np.tile(gt_state, (g * g, 1))
    xs, ys = np.meshgrid(axis, axis)
    states[:, d0] += xs.ravel()
    states[:, d1] += ys.ravel()
    states = states[None]  # (1, g*g, state_dim)

    mm_def = filter_model.definition.measurement_model
    mm_params = filter_model.params["measurement_model"]
    names = ["image", "pos+sensors"]

    fig, axes = plt.subplots(1, len(mm_def.measurement_models) + 1,
                             figsize=(5 * (len(names) + 1), 4))
    for i, sub_mm in enumerate(mm_def.measurement_models):
        lls = np.asarray(
            sub_mm.log_likelihoods(
                mm_params["measurement_models"][str(i)], states, observations
            )
        ).reshape(g, g)
        im = axes[i].imshow(
            lls, origin="lower",
            extent=[axis[0], axis[-1], axis[0], axis[-1]], cmap="viridis",
        )
        axes[i].plot(0, 0, "r*", markersize=12)
        axes[i].set_title(f"log-likelihood: {names[i] if i < len(names) else i}")
        axes[i].set_xlabel(f"Δ state[{d0}]")
        axes[i].set_ylabel(f"Δ state[{d1}]")
        fig.colorbar(im, ax=axes[i])

    fused = np.asarray(
        mm_def.log_likelihoods(mm_params, states, observations)
    ).reshape(g, g)
    im = axes[-1].imshow(
        fused, origin="lower",
        extent=[axis[0], axis[-1], axis[0], axis[-1]], cmap="viridis",
    )
    axes[-1].plot(0, 0, "r*", markersize=12)
    axes[-1].set_title("fused (crossmodal gate)")
    fig.colorbar(im, ax=axes[-1])

    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
