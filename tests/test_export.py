"""AOT serving-bundle roundtrip: export -> deserialize -> run must replay
the source model's rollouts exactly (same seed, same key schedule), with no
model-building code on the load side."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from crossmodal.tasks import DoorTask
from multimodalfilter_tpu.experiments.export import (
    export_serving_bundle,
    load_serving_bundle,
)

N, T = 2, 4


def _sequence(seed=42):
    rng = np.random.default_rng(seed)

    def arr(*shape):
        return rng.normal(size=shape).astype(np.float32)

    obs = {
        "image": arr(T, N, 32, 32),
        "gripper_pos": arr(T, N, 3),
        "gripper_sensors": arr(T, N, 7),
    }
    return obs, arr(T, N, 7)


def _moments(d=3):
    mean = np.zeros((N, d), np.float32)
    cov = np.broadcast_to(np.eye(d, dtype=np.float32) * 0.1, (N, d, d)).copy()
    return mean, cov


@pytest.mark.parametrize(
    "name",
    [
        "DoorParticleFilter",  # ParticleBelief (registered NamedTuple)
        "DoorCrossmodalKalmanFilter",  # tuple-of-GaussianBelief carry
        "DoorLSTMFilter",  # plain tuple carry
    ],
)
def test_bundle_replays_model(tmp_path, name):
    model = DoorTask.model_types[name]()
    model.eval()
    obs, ctrl = _sequence()
    bundle = export_serving_bundle(
        model, str(tmp_path / "bundle"),
        observations={k: jnp.asarray(v) for k, v in obs.items()},
        controls=jnp.asarray(ctrl),
    )

    mean, cov = _moments(model.state_dim)
    model.initialize_beliefs(mean=mean, covariance=cov)
    want1 = np.asarray(model.forward_loop(observations=obs, controls=ctrl))
    obs2, ctrl2 = _sequence(seed=7)
    want2 = np.asarray(model.forward_loop(observations=obs2, controls=ctrl2))

    served = load_serving_bundle(bundle, seed=0)
    assert served.state_dim == model.state_dim
    served.initialize_beliefs(mean=mean, covariance=cov)
    got1 = np.asarray(served.forward_loop(observations=obs, controls=ctrl))
    # Belief + key schedule persist across calls exactly like the facade.
    got2 = np.asarray(served.forward_loop(observations=obs2, controls=ctrl2))

    np.testing.assert_array_equal(want1, got1)
    np.testing.assert_array_equal(want2, got2)


def test_bundle_freezes_enabled_mask(tmp_path):
    model = DoorTask.model_types["DoorCrossmodalKalmanFilter"]()
    model.eval()
    model.enabled_models = [True, False]
    obs, ctrl = _sequence()
    bundle = export_serving_bundle(
        model, str(tmp_path / "bundle"),
        observations={k: jnp.asarray(v) for k, v in obs.items()},
        controls=jnp.asarray(ctrl),
    )
    with open(os.path.join(bundle, "meta.json")) as f:
        meta = json.load(f)
    assert meta["enabled"] == [True, False]
    assert meta["definition"] == type(model.definition).__name__

    mean, cov = _moments(model.state_dim)
    model.initialize_beliefs(mean=mean, covariance=cov)
    want = np.asarray(model.forward_loop(observations=obs, controls=ctrl))

    served = load_serving_bundle(bundle)
    served.initialize_beliefs(mean=mean, covariance=cov)
    got = np.asarray(served.forward_loop(observations=obs, controls=ctrl))
    np.testing.assert_array_equal(want, got)


def test_pipelined_bundle_replays_model(tmp_path):
    """A facade with use_pipeline configured exports the SHARD-MAPPED
    pipelined program — the multi-chip serving artifact. Replay must match
    the pipelined in-process rollout bitwise on the same mesh."""
    from multimodalfilter_tpu.parallel.mesh import create_mesh

    model = DoorTask.model_types["DoorParticleFilter"]()
    model.eval()
    mesh = create_mesh(4, axis_names=("pipe",))
    model.use_pipeline(mesh)
    obs, ctrl = _sequence()  # T=4 divides the 4 stages
    bundle = export_serving_bundle(
        model, str(tmp_path / "bundle"),
        observations={k: jnp.asarray(v) for k, v in obs.items()},
        controls=jnp.asarray(ctrl),
    )
    with open(os.path.join(bundle, "meta.json")) as f:
        meta = json.load(f)
    assert meta["pipeline"] == {
        "axes": ["pipe"], "shape": [4], "num_devices": 4,
        "stages": 4, "microbatches": 2,
    }

    mean, cov = _moments(model.state_dim)
    model.initialize_beliefs(mean=mean, covariance=cov)
    want = np.asarray(model.forward_loop(observations=obs, controls=ctrl))

    served = load_serving_bundle(bundle, seed=0)
    served.initialize_beliefs(mean=mean, covariance=cov)
    got = np.asarray(served.forward_loop(observations=obs, controls=ctrl))
    np.testing.assert_array_equal(want, got)


def test_pipelined_export_rejects_ragged_T(tmp_path):
    from multimodalfilter_tpu.parallel.mesh import create_mesh

    model = DoorTask.model_types["DoorKalmanFilter"]()
    model.eval()
    model.use_pipeline(create_mesh(8, axis_names=("pipe",)))
    obs, ctrl = _sequence()  # T=4 does not divide 8 stages
    with pytest.raises(ValueError, match="divisible by the pipeline"):
        export_serving_bundle(
            model, str(tmp_path / "bundle"),
            observations={k: jnp.asarray(v) for k, v in obs.items()},
            controls=jnp.asarray(ctrl),
        )


def test_export_cli_roundtrip(tmp_path, monkeypatch):
    """scripts/export_serving.py: checkpointed experiment -> bundle, with
    --verify asserting the bitwise replay in-process."""
    monkeypatch.chdir(tmp_path)  # Buddy default dirs are cwd-relative
    from multimodalfilter_tpu.experiments import Buddy

    model = DoorTask.model_types["DoorKalmanFilter"]()
    buddy = Buddy("export_cli_test", verbose=False)
    buddy.attach_model(model)
    buddy.set_metadata({"model_type": "DoorKalmanFilter", "dataset_args": {}})
    buddy.save_checkpoint(label="final")

    import importlib.util

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "export_serving.py"
    )
    spec = importlib.util.spec_from_file_location("export_serving", script)
    export_serving = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(export_serving)
    export_serving.main([
        "--experiment-name", "export_cli_test",
        "--checkpoint-label", "final",
        "--task", "door",
        "--batch", str(N), "--timesteps", str(T),
        "--output", str(tmp_path / "bundle"),
        "--verify",
    ])
    assert (tmp_path / "bundle" / "loop.jaxir").exists()
    assert (tmp_path / "bundle" / "params.msgpack").exists()


def test_bundle_shape_mismatch_fails(tmp_path):
    model = DoorTask.model_types["DoorKalmanFilter"]()
    model.eval()
    obs, ctrl = _sequence()
    bundle = export_serving_bundle(
        model, str(tmp_path / "bundle"),
        observations={k: jnp.asarray(v) for k, v in obs.items()},
        controls=jnp.asarray(ctrl),
    )
    served = load_serving_bundle(bundle)
    mean, cov = _moments(model.state_dim)
    served.initialize_beliefs(mean=mean, covariance=cov)
    obs_bad = {k: np.concatenate([v, v], axis=0) for k, v in obs.items()}
    ctrl_bad = np.concatenate([ctrl, ctrl], axis=0)
    with pytest.raises(ValueError):
        served.forward_loop(observations=obs_bad, controls=ctrl_bad)


def test_bundle_streaming_single_step(tmp_path):
    """Online serving: a T=1 bundle consumes one measurement per call (the
    robotics control-loop pattern — cf. latency_us_per_step_n1 in bench).
    Belief and key schedule persist across calls, so N streamed steps from
    the bundle must match N streamed steps of the live facade bitwise."""
    model = DoorTask.model_types["DoorParticleFilter"]()
    model.eval()
    obs, ctrl = _sequence()
    bundle = export_serving_bundle(
        model, str(tmp_path / "bundle_t1"),
        observations={k: jnp.asarray(v[:1]) for k, v in obs.items()},
        controls=jnp.asarray(ctrl[:1]),
    )

    mean, cov = _moments(model.state_dim)
    model.initialize_beliefs(mean=mean, covariance=cov)
    want = [
        np.asarray(model.forward_loop(
            observations={k: v[t:t + 1] for k, v in obs.items()},
            controls=ctrl[t:t + 1],
        ))[0]
        for t in range(T)
    ]

    served = load_serving_bundle(bundle, seed=0)
    served.initialize_beliefs(mean=mean, covariance=cov)
    got = [
        np.asarray(served.forward_loop(
            observations={k: v[t:t + 1] for k, v in obs.items()},
            controls=ctrl[t:t + 1],
        ))[0]
        for t in range(T)
    ]

    for t in range(T):
        np.testing.assert_array_equal(want[t], got[t])
    assert np.all(np.isfinite(np.asarray(got)))
