"""Orbax checkpoint backend: async saves, format detection, msgpack interop.

The orbax backend (Buddy(checkpoint_backend="orbax") / MMF_TPU_CKPT_BACKEND)
is the production-TPU checkpoint path: saves return immediately (atomic
directory commit), sharded jax.Arrays write without a host gather. The
msgpack `.ckpt` format stays canonical; reads auto-detect the format per
label, so the two interoperate inside one experiment directory.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from multimodalfilter_tpu.experiments import Buddy  # noqa: E402
from multimodalfilter_tpu.utils.pytree import get_by_path  # noqa: E402


class _TinyModel:
    """Buddy only needs `.params` for checkpointing."""

    def __init__(self, seed=0):
        k = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(k)
        self.params = {
            "dynamics_model": {"w": jax.random.normal(k1, (4, 4)),
                               "b": jnp.zeros((4,))},
            "measurement_model": {"w": jax.random.normal(k2, (3, 4))},
        }


def _buddy(tmp_path, name, model, backend=None):
    return Buddy(
        name,
        model,
        checkpoint_dir=str(tmp_path / "ckpt"),
        metadata_dir=str(tmp_path / "meta"),
        log_dir=str(tmp_path / "logs"),
        checkpoint_backend=backend,
        verbose=False,
    )


def test_orbax_roundtrip_params_steps_and_optimizer(tmp_path):
    from multimodalfilter_tpu.train.optim import get_named_optimizer

    model = _TinyModel()
    buddy = _buddy(tmp_path, "orbax_rt", model, backend="orbax")
    opt = get_named_optimizer(buddy, "phase1", model.params)
    # Advance the optimizer once so its state is non-trivial (Adam moments).
    grads = jax.tree_util.tree_map(jnp.ones_like, model.params)
    updates, opt["state"] = opt["tx"].update(grads, opt["state"], model.params)
    buddy.increment_steps(7)
    original = np.array(model.params["dynamics_model"]["w"])
    saved_mu = np.array(opt["state"][0].mu["dynamics_model"]["w"])

    path = buddy.save_checkpoint("unit")
    assert path.endswith(".orbax")
    buddy.wait_for_checkpoints()

    # Perturb everything, then restore.
    model.params = jax.tree_util.tree_map(lambda a: a + 1.0, model.params)
    buddy._steps = 0
    opt["state"] = opt["tx"].init(model.params)
    buddy.load_checkpoint("unit")
    np.testing.assert_array_equal(
        np.array(model.params["dynamics_model"]["w"]), original
    )
    assert buddy.optimizer_steps == 7
    np.testing.assert_allclose(
        np.array(opt["state"][0].mu["dynamics_model"]["w"]), saved_mu,
        rtol=1e-6,
    )


def test_orbax_saved_read_by_msgpack_buddy_and_module_surgery(tmp_path):
    model = _TinyModel()
    writer = _buddy(tmp_path, "interop", model, backend="orbax")
    writer.save_checkpoint("phase0")
    writer.wait_for_checkpoints()

    # A default-backend Buddy reads the orbax checkpoint transparently,
    # including dotted-path module surgery (the CMEKF-curriculum contract).
    model2 = _TinyModel(seed=1)
    reader = _buddy(tmp_path, "interop", model2)
    reader.load_checkpoint_module("dynamics_model", label="phase0")
    np.testing.assert_array_equal(
        np.array(get_by_path(model2.params, "dynamics_model.w")),
        np.array(model.params["dynamics_model"]["w"]),
    )
    # The non-surgered subtree keeps model2's own values.
    assert not np.allclose(
        np.array(get_by_path(model2.params, "measurement_model.w")),
        np.array(model.params["measurement_model"]["w"]),
    )
    reader.load_checkpoint(label="phase0")
    np.testing.assert_array_equal(
        np.array(get_by_path(model2.params, "measurement_model.w")),
        np.array(model.params["measurement_model"]["w"]),
    )


def test_msgpack_saved_read_by_orbax_buddy(tmp_path):
    model = _TinyModel()
    writer = _buddy(tmp_path, "interop2", model)
    writer.save_checkpoint("phase0")

    model2 = _TinyModel(seed=1)
    reader = _buddy(tmp_path, "interop2", model2, backend="orbax")
    reader.load_checkpoint(label="phase0")
    np.testing.assert_array_equal(
        np.array(model2.params["dynamics_model"]["w"]),
        np.array(model.params["dynamics_model"]["w"]),
    )


def test_latest_fallback_spans_both_formats(tmp_path):
    """`load_checkpoint()` without a label picks the most recent checkpoint
    regardless of format (reference Buddy "latest" semantics)."""
    import os
    import time

    model = _TinyModel()
    buddy = _buddy(tmp_path, "latest", model, backend="orbax")
    # Older msgpack checkpoint.
    buddy._checkpoint_backend = "msgpack"
    buddy.save_checkpoint("old")
    old = np.array(model.params["dynamics_model"]["w"])
    # Newer orbax checkpoint with different params.
    model.params = jax.tree_util.tree_map(lambda a: a * 2.0, model.params)
    newer = np.array(model.params["dynamics_model"]["w"])
    buddy._checkpoint_backend = "orbax"
    path = buddy.save_checkpoint("new")
    buddy.wait_for_checkpoints()
    # Ensure the orbax dir mtime strictly exceeds the msgpack file's.
    t = time.time() + 2
    os.utime(path, (t, t))

    model.params = jax.tree_util.tree_map(lambda a: a * 0.0, model.params)
    buddy.load_checkpoint()
    np.testing.assert_array_equal(
        np.array(model.params["dynamics_model"]["w"]), newer
    )
    assert not np.allclose(newer, old)


def test_unknown_backend_rejected(tmp_path):
    with pytest.raises(ValueError, match="msgpack.*orbax"):
        _buddy(tmp_path, "bad", _TinyModel(), backend="flatbuffer")


def test_missing_label_raises_filenotfound(tmp_path):
    buddy = _buddy(tmp_path, "missing", _TinyModel(), backend="orbax")
    with pytest.raises(FileNotFoundError):
        buddy.load_checkpoint("nope")
