"""Trajectory windowing datasets.

Capability parity with ``torchfilter.data.{SingleStepDataset,
SubsequenceDataset, ParticleFilterMeasurementDataset}`` (reference usage:
crossmodal/train_helpers.py:38-43,62-69,82-91,142-150), redesigned for TPU:

Instead of a worker-process DataLoader, each dataset eagerly stacks its
windows into contiguous numpy arrays once; train loops push them to device a
single time and index them with on-device gathers — no per-batch host work.

ParticleFilterMeasurementDataset stores only (state, observation) pairs plus
the sampling covariance; the Gaussian perturbation and its log-density target
are generated *on device* inside the jitted train step (TPU-side
preprocessing; fresh samples every epoch, matching the reference dataloader's
resampling-each-access behavior).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..types import Trajectory


def _stack_observations(obs_list: Sequence[Dict[str, np.ndarray]]):
    keys = obs_list[0].keys()
    return {k: np.concatenate([o[k] for o in obs_list], axis=0) for k in keys}


class SingleStepDataset:
    """All (previous_state, state, observation, control) transitions.

    Transition t uses: previous_state = states[t-1], state = states[t],
    observation = observations[t], control = controls[t].
    """

    def __init__(self, trajectories: List[Trajectory]):
        prev_states, states, controls = [], [], []
        obs_list = []
        for traj in trajectories:
            s, o, c = traj.states, traj.observations, traj.controls
            prev_states.append(s[:-1])
            states.append(s[1:])
            obs_list.append({k: v[1:] for k, v in o.items()})
            controls.append(c[1:])
        self.previous_states = np.concatenate(prev_states, axis=0)
        self.states = np.concatenate(states, axis=0)
        self.observations = _stack_observations(obs_list)
        self.controls = np.concatenate(controls, axis=0)

    def __len__(self):
        return self.states.shape[0]


class SubsequenceDataset:
    """Contiguous subsequences of fixed length.

    Default (`stride=None`) takes non-overlapping windows — capability parity
    with ``torchfilter.data.SubsequenceDataset`` (reference usage
    crossmodal/train_helpers.py:62-69,142-150). Passing ``stride <
    subsequence_length`` yields overlapping windows (more training windows
    from the same trajectories — a capability the torch version lacks);
    assembly runs through the native host engine's threaded window gather
    (numpy fallback inside ``native.window_gather``).

    Arrays are stored window-major: states (B, L, D) etc. (train loops swap
    to (L, B, ...) per batch for scan).
    """

    def __init__(
        self,
        trajectories: List[Trajectory],
        subsequence_length: int,
        stride: int = None,
    ):
        from .. import native

        self.subsequence_length = subsequence_length
        if stride is None:
            stride = subsequence_length
        assert stride >= 1
        states, controls = [], []
        obs_list = []
        for traj in trajectories:
            s, o, c = traj.states, traj.observations, traj.controls
            t = s.shape[0]
            if t < subsequence_length:
                continue
            if stride == subsequence_length:
                # Parity path: exactly the reference's non-overlapping
                # windows (floor(T/L) of them, starting at 0, L, 2L, ...).
                num = t // subsequence_length
                starts = np.arange(num, dtype=np.int64) * subsequence_length
            else:
                starts = np.arange(
                    0, t - subsequence_length + 1, stride, dtype=np.int64
                )
            states.append(native.window_gather(s, starts, subsequence_length))
            controls.append(native.window_gather(c, starts, subsequence_length))
            obs_list.append(
                {
                    k: native.window_gather(v, starts, subsequence_length)
                    for k, v in o.items()
                }
            )
        assert states, "No trajectory long enough for the requested subsequence length"
        self.states = np.concatenate(states, axis=0)
        self.observations = _stack_observations(obs_list)
        self.controls = np.concatenate(controls, axis=0)

    def __len__(self):
        return self.states.shape[0]


class ParticleFilterMeasurementDataset:
    """(state, observation) pairs + sampling covariance for measurement-model
    pretraining. The reference samples `samples_per_pair` noisy states around
    each ground-truth state with log-density targets
    (crossmodal/train_helpers.py:82-91); here sampling happens on device in
    the train step (see train/loops.py)."""

    def __init__(
        self,
        trajectories: List[Trajectory],
        covariance: np.ndarray,
        samples_per_pair: int = 10,
    ):
        self.covariance = np.asarray(covariance, dtype=np.float32)
        self.samples_per_pair = samples_per_pair
        states, obs_list = [], []
        for traj in trajectories:
            states.append(traj.states)
            obs_list.append(dict(traj.observations))
        self.states = np.concatenate(states, axis=0)
        self.observations = _stack_observations(obs_list)

    def __len__(self):
        return self.states.shape[0] * self.samples_per_pair
