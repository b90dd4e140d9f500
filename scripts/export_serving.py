"""Export a trained filter as an AOT serving bundle.

Freezes the eval rollout (initialize_beliefs + forward_loop) of a
checkpointed model into a self-contained artifact
(multimodalfilter_tpu/experiments/export.py): StableHLO programs + params
+ metadata. The serving host loads it with ``load_serving_bundle`` — no
model-zoo code, no flax tracing, no recompiles beyond the first call.

The reference deploys by re-running its training stack in eval mode; this
is the TPU-native deployment path. Shapes are static under XLA, so export
one bundle per (timesteps, batch) serving config.

Example:
    python scripts/export_serving.py --experiment-name my_cmpf \
        --task door --batch 16 --timesteps 100 --serving \
        --output bundles/my_cmpf_T100_N16 --verify
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment-name", type=str, required=True)
    parser.add_argument("--checkpoint-label", type=str, default=None)
    parser.add_argument("--task", choices=("door", "push"), default="door")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--timesteps", type=int, default=100)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument(
        "--platforms", type=str, default=None,
        help="comma-separated target platforms for a cross-platform "
        "artifact (e.g. 'tpu,cpu'); default = the current backend. "
        "Pallas kernels (--serving / MMF_TPU_PALLAS=1) only lower for tpu.",
    )
    parser.add_argument(
        "--verify", action="store_true",
        help="reload the bundle and check it replays the source model "
        "bitwise on synthetic inputs",
    )
    from multimodalfilter_tpu.parallel.cli import add_serving_arg, apply_serving_arg

    add_serving_arg(parser)
    args = parser.parse_args(argv)
    apply_serving_arg(args)  # before model build — knobs read at __init__

    import jax.numpy as jnp
    import numpy as np

    import crossmodal
    from multimodalfilter_tpu.experiments import Buddy
    from multimodalfilter_tpu.experiments.export import (
        export_serving_bundle,
        load_serving_bundle,
    )

    Task = (
        crossmodal.tasks.DoorTask if args.task == "door"
        else crossmodal.tasks.PushTask
    )

    buddy = Buddy(args.experiment_name)
    model_type = buddy.metadata["model_type"]
    filter_model = Task.model_types[model_type]()
    filter_model.eval()
    buddy.attach_model(filter_model)
    buddy.load_checkpoint(label=args.checkpoint_label)

    t, n = args.timesteps, args.batch
    import jax

    def sds(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    # Both tasks share the observation/control layout (tasks/_door.py,
    # tasks/_push.py): 32x32 grayscale images, 3-dim gripper position,
    # 7-dim gripper sensors, 7-dim controls.
    obs_spec = {
        "image": sds(t, n, 32, 32),
        "gripper_pos": sds(t, n, 3),
        "gripper_sensors": sds(t, n, 7),
    }
    ctrl_spec = sds(t, n, 7)
    platforms = args.platforms.split(",") if args.platforms else None

    path = export_serving_bundle(
        filter_model, args.output,
        observations=obs_spec, controls=ctrl_spec, platforms=platforms,
    )
    size = sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
    )
    print(
        f"[export] {model_type} ({args.task}) T={t} N={n} -> {path} "
        f"({size / 1e6:.1f} MB)"
    )

    if args.verify:
        rng = np.random.default_rng(0)
        obs = {
            k: rng.normal(size=s.shape).astype(np.float32)
            for k, s in obs_spec.items()
        }
        ctrl = rng.normal(size=ctrl_spec.shape).astype(np.float32)
        d = filter_model.state_dim
        mean = np.zeros((n, d), np.float32)
        cov = np.broadcast_to(np.eye(d, dtype=np.float32) * 0.1, (n, d, d))

        filter_model.initialize_beliefs(mean=mean, covariance=cov)
        want = np.asarray(
            filter_model.forward_loop(observations=obs, controls=ctrl)
        )
        served = load_serving_bundle(path, seed=0)
        served.initialize_beliefs(mean=mean, covariance=cov)
        got = np.asarray(served.forward_loop(observations=obs, controls=ctrl))
        np.testing.assert_array_equal(want, got)
        print(f"[export] verify OK: bundle replays the model bitwise "
              f"({got.shape} estimates)")


if __name__ == "__main__":
    main()
