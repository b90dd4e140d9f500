"""Door-task data collection.

Capability parity with the reference
``scripts/door_task/data_collection/simulate_door.py``: drives a robosuite
"PandaDoor" environment at 20 Hz with a position controller and a 64x64
birdview camera (:35-49), rolls out push/pull waypoint policies, grayscales
images to [-1, 1] via /127.5 - 1 (:114), abandons trajectories on failures
such as joint limits (:101-145), and streams accepted trajectories into an
HDF5 TrajectoriesFile (:54,133-145).

robosuite/MuJoCo are not available in this environment; without them this
script can synthesize schema-compatible data instead (--synthetic), using
multimodalfilter_tpu.data.synthetic.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
)

from multimodalfilter_tpu.data import TrajectoriesFile


def grayscale(image_rgb: np.ndarray) -> np.ndarray:
    """RGB uint8 -> [-1, 1] grayscale (reference simulate_door.py:114)."""
    return np.mean(image_rgb, axis=-1).astype(np.float32) / 127.5 - 1.0


def collect_robosuite(args) -> None:
    try:
        import robosuite  # noqa: F401
    except ImportError:
        sys.exit(
            "robosuite is not installed; data collection requires a MuJoCo "
            "environment. Use --synthetic to generate schema-compatible "
            "synthetic data instead."
        )

    from waypoint_policies import PullWaypointPolicy, PushWaypointPolicy

    env = robosuite.make(
        "PandaDoor",
        has_renderer=False,
        use_camera_obs=True,
        camera_name="birdview",
        camera_height=64,
        camera_width=64,
        control_freq=20,
        controller="position",
    )
    rng = np.random.default_rng(args.seed)
    policy_cls = PullWaypointPolicy if args.policy == "pull" else PushWaypointPolicy

    with TrajectoriesFile(args.output, "a") as f:
        collected = 0
        while collected < args.num_trajectories:
            obs = env.reset()
            policy = policy_cls(rng=rng)
            policy.reset(obs)
            abandoned = False

            for _ in range(args.max_steps):
                action = np.zeros(env.action_dim)
                action[:3] = policy.update(np.asarray(obs["eef_pos"]))
                obs, _, done, info = env.step(action)

                # Abandon on failures (joint limits etc.).
                if info.get("joint_limit", False):
                    abandoned = True
                    break

                f.add_timestep(
                    {
                        "object-state": obs["object-state"],
                        "eef_pos": obs["eef_pos"],
                        "ee-force-obs": obs["ee-force-obs"],
                        "ee-torque-obs": obs["ee-torque-obs"],
                        "contact-obs": obs["contact-obs"],
                        "image": grayscale(obs["image"]),
                    }
                )
                if done or policy.done():
                    break

            if abandoned:
                f.abandon_trajectory()
            else:
                f.complete_trajectory()
                collected += 1
                print(f"collected {collected}/{args.num_trajectories}")


def collect_synthetic(args) -> None:
    from multimodalfilter_tpu.data import synthetic

    import os

    os.environ["MMF_TPU_SYNTH_TRAJ"] = str(args.num_trajectories)
    synthetic._synthesize_door(args.output, args.num_trajectories, args.seed)
    print(f"synthesized {args.num_trajectories} trajectories -> {args.output}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--policy", choices=["pull", "push"], default="pull")
    parser.add_argument("--num-trajectories", type=int, default=10)
    parser.add_argument("--max-steps", type=int, default=800)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--synthetic", action="store_true",
        help="Generate schema-compatible synthetic data (no MuJoCo needed).",
    )
    args = parser.parse_args()

    if args.synthetic:
        collect_synthetic(args)
    else:
        collect_robosuite(args)


if __name__ == "__main__":
    main()
