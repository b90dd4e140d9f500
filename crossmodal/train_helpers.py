"""Training helpers.

API parity with the reference ``crossmodal/train_helpers.py``: module-global
configuration (``configure(buddy=..., trajectories=...)``) and the five
curriculum primitives with identical signatures/defaults
(train_helpers.py:30-162). The torch DataLoader path is replaced by
device-resident arrays + jitted train steps (multimodalfilter_tpu.train).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from multimodalfilter_tpu import train as _train
from multimodalfilter_tpu.data import (
    ParticleFilterMeasurementDataset,
    SingleStepDataset,
    SubsequenceDataset,
)
from multimodalfilter_tpu.experiments import Buddy
from multimodalfilter_tpu.types import Trajectory

# Module globals, set by configure() (reference train_helpers.py:8-26).
buddy: Buddy
filter_model = None
trajectories: List[Trajectory]
num_workers: int = 0
mesh = None
pipeline_mesh = None
pipeline_microbatches = None  # None = auto-size (largest divisor of per-shard batch up to 8)


def configure(
    *,
    buddy: Buddy,
    trajectories: List[Trajectory],
    num_workers: int = 0,
    mesh=None,
    pipeline_mesh=None,
    pipeline_microbatches=None,
):
    """Configure global settings for training helpers.

    ``num_workers`` is accepted for CLI compatibility but unused (there is no
    host dataloader; data lives on device). ``mesh`` optionally enables
    data-parallel sharding of e2e training over a jax.sharding.Mesh;
    ``pipeline_mesh`` instead runs e2e BPTT through the differentiable
    temporal pipeline (time axis over the mesh's "pipe" axis — requires
    subsequence_length-1 divisible by the stage count). Exclusive with
    ``mesh``."""
    assert mesh is None or pipeline_mesh is None
    globals()["buddy"] = buddy
    globals()["filter_model"] = buddy.model
    globals()["trajectories"] = trajectories
    globals()["num_workers"] = num_workers
    globals()["mesh"] = mesh
    globals()["pipeline_mesh"] = pipeline_mesh
    globals()["pipeline_microbatches"] = pipeline_microbatches


def train_pf_dynamics_single_step(
    *, epochs, batch_size=32, model=None, loss_function="mse"
):
    assert loss_function == "mse", "Only the reference's MSE loss is supported"
    model = model if model is not None else filter_model
    dataset = SingleStepDataset(trajectories=trajectories)
    return _train.train_dynamics_single_step(
        buddy, model, dataset, epochs=epochs, batch_size=batch_size
    )


def train_pf_dynamics_recurrent(
    *, subsequence_length, epochs, batch_size=32, model=None, loss_function="mse"
):
    assert loss_function == "mse", "Only the reference's MSE loss is supported"
    model = model if model is not None else filter_model
    dataset = SubsequenceDataset(
        trajectories=trajectories, subsequence_length=subsequence_length
    )
    return _train.train_dynamics_recurrent(
        buddy, model, dataset, epochs=epochs, batch_size=batch_size
    )


def train_pf_measurement(*, epochs, batch_size, cov_scale=0.1):
    dataset = ParticleFilterMeasurementDataset(
        trajectories=trajectories,
        covariance=np.identity(filter_model.state_dim) * cov_scale,
        samples_per_pair=10,
    )
    return _train.train_pf_measurement(
        buddy, filter_model, dataset, epochs=epochs, batch_size=batch_size
    )


def train_virtual_sensor(
    *, epochs, batch_size=32, model=None, optimizer_name="train_virtual_sensor"
):
    model = model if model is not None else filter_model
    dataset = SingleStepDataset(trajectories=trajectories)
    return _train.train_virtual_sensor(
        buddy, model, dataset, epochs=epochs, batch_size=batch_size,
        optimizer_name=optimizer_name,
    )


def train_e2e(
    *,
    subsequence_length,
    epochs,
    batch_size=32,
    initial_cov_scale=0.1,
    measurement_initialize=False,
    model=None,
    optimizer_name="train_filter_recurrent",
):
    model = model if model is not None else filter_model
    dataset = SubsequenceDataset(
        trajectories=trajectories, subsequence_length=subsequence_length
    )
    return _train.train_e2e(
        buddy, model, dataset, epochs=epochs, batch_size=batch_size,
        initial_cov_scale=initial_cov_scale,
        measurement_initialize=measurement_initialize,
        optimizer_name=optimizer_name, mesh=mesh,
        pipeline_mesh=pipeline_mesh,
        pipeline_microbatches=pipeline_microbatches,
    )
