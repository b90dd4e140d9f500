"""Waypoint-following policies for door-task data collection.

Capability parity with the reference
``scripts/door_task/data_collection/waypoint_policies.py``: a waypoint FSM
(READY -> ACTIVE -> WAITING) with randomized action scaling
(waypoint_policies.py:13-104), a push policy alternating retract/push cycles
(:107-144), and a pull policy that approaches the door handle and follows
interpolated waypoints (:147-248).

These are host-side (no TPU involvement); they drive a robosuite MuJoCo env
to produce HDF5 trajectories for the task loaders.
"""

from __future__ import annotations

import abc
import enum
from typing import List, Optional

import numpy as np


class _State(enum.Enum):
    READY = 0  # waiting for a new waypoint
    ACTIVE = 1  # moving toward the current waypoint
    WAITING = 2  # settling at the waypoint before advancing


class AbstractWaypointPolicy(abc.ABC):
    """Move the end effector through a sequence of waypoints with a
    position controller, applying randomized per-episode action scaling."""

    def __init__(
        self,
        tolerance: float = 0.01,
        settle_steps: int = 5,
        action_scale_range=(0.5, 1.5),
        rng: Optional[np.random.Generator] = None,
    ):
        self.rng = rng or np.random.default_rng()
        self.tolerance = tolerance
        self.settle_steps = settle_steps
        self.action_scale = float(self.rng.uniform(*action_scale_range))
        self._state = _State.READY
        self._waypoints: List[np.ndarray] = []
        self._current: Optional[np.ndarray] = None
        self._settle_counter = 0

    @abc.abstractmethod
    def plan_waypoints(self, observation) -> List[np.ndarray]:
        """Produce the waypoint list for this episode."""

    def reset(self, observation) -> None:
        self._waypoints = list(self.plan_waypoints(observation))
        self._state = _State.READY
        self._current = None

    def done(self) -> bool:
        return self._state == _State.READY and not self._waypoints

    def update(self, eef_pos: np.ndarray) -> np.ndarray:
        """One control step: returns a position-delta action (3,)."""
        if self._state == _State.READY:
            if not self._waypoints:
                return np.zeros(3)
            self._current = self._waypoints.pop(0)
            self._state = _State.ACTIVE

        delta = self._current - eef_pos
        if self._state == _State.ACTIVE:
            if np.linalg.norm(delta) < self.tolerance:
                self._state = _State.WAITING
                self._settle_counter = self.settle_steps
            return self.action_scale * delta

        # WAITING: hold position while settling.
        self._settle_counter -= 1
        if self._settle_counter <= 0:
            self._state = _State.READY
        return self.action_scale * delta * 0.1


class PushWaypointPolicy(AbstractWaypointPolicy):
    """Alternating retract/push cycles against the door face."""

    def __init__(self, num_cycles: int = 3, **kwargs):
        self.num_cycles = num_cycles
        super().__init__(**kwargs)

    def plan_waypoints(self, observation) -> List[np.ndarray]:
        eef = np.asarray(observation["eef_pos"])
        door = np.asarray(observation.get("door_pos", eef + [0.2, 0.0, 0.0]))
        waypoints = []
        for _ in range(self.num_cycles):
            retract = eef + self.rng.normal(0, 0.02, 3) - [0.1, 0.0, 0.0]
            contact = door + self.rng.normal(0, 0.01, 3)
            push = contact + [0.08 + self.rng.uniform(0, 0.04), 0.0, 0.0]
            waypoints += [retract, contact, push]
        return waypoints


class PullWaypointPolicy(AbstractWaypointPolicy):
    """Approach the door handle, then follow an interpolated arc that swings
    the door open."""

    def __init__(self, num_arc_points: int = 8, **kwargs):
        self.num_arc_points = num_arc_points
        super().__init__(**kwargs)

    def plan_waypoints(self, observation) -> List[np.ndarray]:
        handle = np.asarray(observation["handle_pos"])
        hinge = np.asarray(observation.get("hinge_pos", handle - [0.0, 0.3, 0.0]))
        radius_vec = handle - hinge
        radius = np.linalg.norm(radius_vec[:2])
        theta0 = np.arctan2(radius_vec[1], radius_vec[0])
        theta_max = theta0 + self.rng.uniform(0.8, 1.4)

        waypoints = [handle + [0.0, 0.0, 0.05], handle]  # approach from above
        for theta in np.linspace(theta0, theta_max, self.num_arc_points)[1:]:
            point = hinge + np.array(
                [radius * np.cos(theta), radius * np.sin(theta), radius_vec[2]]
            )
            waypoints.append(point)
        return waypoints
