"""Shared configured state for the eval-helper modules.

The reference keeps ``buddy / filter_model / task / dataset_args`` as
module globals on ``crossmodal.eval_helpers`` set by ``configure()``
(reference eval_helpers.py:10-29). This repo's eval surface is split into
focused modules (batching / throughput timing / metric math), so the
configured state lives here and ``eval_helpers.configure`` writes it;
``eval_helpers`` re-exports the same names for API parity.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

buddy = None
filter_model = None
task = None
dataset_args: Dict = {}
mesh = None

# Eval batch + init-tensor + compiled-program cache, cleared by configure().
batch_cache: Dict = {}

# Stream for per-repeat blackout keys (device-side re-masking).
rng = np.random.default_rng(0)


def set_state(*, buddy, task, dataset_args: Dict, mesh=None) -> None:
    g = globals()
    g["buddy"] = buddy
    g["filter_model"] = buddy.model
    g["task"] = task
    g["dataset_args"] = dataset_args
    g["mesh"] = mesh
    batch_cache.clear()
