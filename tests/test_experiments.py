"""Experiment-runtime tests: Buddy metadata persistence, named-optimizer
lifecycle, metric logging, TrajectoriesFile writer API, SliceWrapper."""

import json
import os

import numpy as np
import pytest

from multimodalfilter_tpu.data import TrajectoriesFile
from multimodalfilter_tpu.experiments import Buddy
from multimodalfilter_tpu.utils import SliceWrapper
from multimodalfilter_tpu.utils.pytree import get_by_path, set_by_path


def test_metadata_roundtrip(tmp_path):
    buddy = Buddy(
        "meta_test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        metadata_dir=str(tmp_path / "meta"),
        log_dir=str(tmp_path / "logs"),
        verbose=False,
    )
    buddy.set_metadata({"model_type": "DoorParticleFilter", "dataset_args": {"a": 1}})
    buddy.add_metadata({"notes": "hello"})

    # A fresh Buddy for the same experiment reads it back (eval_door.py:25-27
    # contract: checkpoint + metadata fully determine reconstruction).
    buddy2 = Buddy(
        "meta_test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        metadata_dir=str(tmp_path / "meta"),
        log_dir=str(tmp_path / "logs"),
        verbose=False,
    )
    assert buddy2.metadata["model_type"] == "DoorParticleFilter"
    assert buddy2.metadata["dataset_args"] == {"a": 1}
    assert buddy2.metadata["notes"] == "hello"


def test_metric_logging_jsonl(tmp_path):
    buddy = Buddy(
        "log_test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        metadata_dir=str(tmp_path / "meta"),
        log_dir=str(tmp_path / "logs"),
        verbose=False,
    )
    with buddy.log_scope("eval"):
        buddy.log_scalar("theta_rmse_deg", 12.5)
    path = os.path.join(str(tmp_path / "logs"), "log_test", "metrics.jsonl")
    records = [json.loads(line) for line in open(path)]
    assert records[0]["name"] == "eval/theta_rmse_deg"
    assert records[0]["value"] == 12.5


def test_trajectories_file_write_read(tmp_path):
    path = str(tmp_path / "trajs.hdf5")
    with TrajectoriesFile(path, "w") as f:
        for traj in range(2):
            for t in range(5):
                f.add_timestep(
                    {"state": np.array([traj, t], np.float32),
                     "image": np.zeros((4, 4), np.float32)}
                )
            f.complete_trajectory()
        # Abandoned trajectories leave no trace (simulate_door.py:101-145).
        f.add_timestep({"state": np.zeros(2, np.float32),
                        "image": np.zeros((4, 4), np.float32)})
        f.abandon_trajectory()

    with TrajectoriesFile(path) as f:
        assert len(f) == 2
        trajs = list(f)
        assert trajs[1]["state"].shape == (5, 2)
        assert trajs[1]["state"][3][1] == 3
        assert trajs[0]["image"].shape == (5, 4, 4)


def test_slice_wrapper():
    data = {"a": np.arange(10), "b": np.arange(10) * 2}
    wrapper = SliceWrapper(data)
    assert len(wrapper) == 10
    sliced = wrapper[2:4]
    assert list(sliced["a"]) == [2, 3]
    assert wrapper.shape == (10,)

    acc = SliceWrapper({})
    acc.append({"x": 1})
    acc.append({"x": 2})
    assert acc.data == {"x": [1, 2]}
    mapped = acc.map(lambda v: [i * 10 for i in v])
    assert mapped.data == {"x": [10, 20]}


def test_pytree_paths():
    tree = {"a": {"0": {"w": 1}, "1": {"w": 2}}, "b": 3}
    assert get_by_path(tree, "a.0.w") == 1
    new = set_by_path(tree, "a.1.w", 99)
    assert new["a"]["1"]["w"] == 99
    assert tree["a"]["1"]["w"] == 2  # original untouched
    with pytest.raises(KeyError):
        get_by_path(tree, "a.2")


def test_optimizer_dict_lifecycle(tmp_path):
    """Named optimizers are created lazily and cleared between phases
    (train_door.py:130,150,158)."""
    import jax.numpy as jnp

    from multimodalfilter_tpu.train.optim import get_named_optimizer

    buddy = Buddy(
        "opt_test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        metadata_dir=str(tmp_path / "meta"),
        log_dir=str(tmp_path / "logs"),
        verbose=False,
    )
    params = {"w": jnp.zeros((3,))}
    opt1 = get_named_optimizer(buddy, "image_ekf", params)
    opt2 = get_named_optimizer(buddy, "image_ekf", params)
    assert opt1 is opt2
    assert set(buddy._optimizer_dict) == {"image_ekf"}
    buddy._optimizer_dict.clear()
    opt3 = get_named_optimizer(buddy, "image_ekf", params)
    assert opt3 is not opt1


def test_zero_frozen_grads():
    import jax.numpy as jnp

    from multimodalfilter_tpu.train.optim import zero_frozen_grads

    grads = {
        "dynamics_model": {"w": jnp.ones((2,))},
        "measurement_model": {
            "measurement_models": {"0": {"w": jnp.ones((2,))}},
            "crossmodal_weight_model": {"w": jnp.ones((2,))},
        },
    }
    out = zero_frozen_grads(
        grads, frozenset({"measurement_model.measurement_models"})
    )
    assert np.all(np.asarray(out["dynamics_model"]["w"]) == 1)
    assert np.all(
        np.asarray(out["measurement_model"]["measurement_models"]["0"]["w"]) == 0
    )
    assert np.all(
        np.asarray(out["measurement_model"]["crossmodal_weight_model"]["w"]) == 1
    )
