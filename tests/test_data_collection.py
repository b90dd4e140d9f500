"""Mock-env tests for the door-task data-collection subsystem.

Exercises the waypoint FSM (READY -> ACTIVE -> WAITING), the randomized
delta scaling, arc-length waypoint interpolation, push retract/push cycling,
the IK initial-state path, the leaky joint-limit/missing-contact abandonment
logic, and a full ``run_episode`` writing a TrajectoriesFile that
``crossmodal.tasks._door._load_trajectories`` round-trips — the behaviors of
the reference ``scripts/door_task/data_collection/{waypoint_policies.py
(:13-248), simulate_door.py (:56-145)}`` — without robosuite/MuJoCo.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts/door_task/data_collection")

import simulate_door  # noqa: E402
import waypoint_policies  # noqa: E402
from waypoint_policies import (  # noqa: E402
    AbstractWaypointPolicy,
    PullWaypointPolicy,
    PushWaypointPolicy,
    interpolate_waypoint,
)

States = AbstractWaypointPolicy.States


class MockDoorEnv:
    """Scripted stand-in for the robosuite PandaDoor env: first-order EEF
    kinematics under a saturating position controller, a door hinge that
    tracks hand progress, and the observation dict schema the reference
    env emits (simulate_door.py:77-86 keys)."""

    MAX_STEP = 0.05  # position-controller saturation per axis
    CONTROL_FREQ = 20.0

    def __init__(self, hinge_rate=0.0, contact=True, q_limits=False):
        self.hinge_rate = hinge_rate  # hinge angle change per step
        self.contact = contact
        self.q_limits_active = q_limits
        self.door_hinge_angle = 0.0
        self.hand_pos = np.array([0.45, 0.0, 1.5])
        self.hand_velocity = np.zeros(3)
        self.joint_positions = None
        self.rng = np.random.default_rng(0)

    def reset(self):
        self.hand_pos = np.array([0.45, 0.0, 1.5])
        self.hand_velocity = np.zeros(3)
        self.door_hinge_angle = 0.0
        return self._obs()

    def set_robot_joint_positions(self, joints):
        self.joint_positions = np.asarray(joints)

    def _check_q_limits(self):
        return self.q_limits_active

    def step(self, action):
        action = np.asarray(action, dtype=float)
        assert action.shape == (4,)
        delta = np.clip(action[:3], -self.MAX_STEP, self.MAX_STEP)
        self.hand_pos = self.hand_pos + delta
        self.hand_velocity = delta * self.CONTROL_FREQ
        self.door_hinge_angle += self.hinge_rate
        return self._obs(), 0.0, False, {}

    def _obs(self):
        theta = self.door_hinge_angle
        return {
            "object-state": np.array([float(self.contact), theta, 0.0, 0.01, -0.02]),
            "eef_pos": self.hand_pos.copy(),
            "ee-force-obs": self.rng.normal(0, 1.0, 3),
            "ee-torque-obs": self.rng.normal(0, 0.1, 3),
            "contact-obs": bool(self.contact),
            "image": self.rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
        }


# ---------------------------------------------------------------------------
# Waypoint FSM


def test_fsm_ready_active_waiting_cycle():
    env = MockDoorEnv()
    env.reset()
    policy = PushWaypointPolicy(rng=np.random.default_rng(3))

    # READY: arms a waypoint + scales, emits a null action, -> ACTIVE.
    action = policy.update(env)
    np.testing.assert_array_equal(action, [0.0, 0.0, 0.0, -1.0])
    assert policy._state == States.ACTIVE
    assert policy.target_pos is not None
    assert 1.0 <= policy.delta_scale <= 100.0
    assert 100 <= policy.counter_threshold <= 250

    # ACTIVE: scaled delta toward the target, gripper closed.
    action = policy.update(env)
    expected = (policy.target_pos - env.hand_pos) * policy.delta_scale
    np.testing.assert_allclose(action[:3], expected)
    assert action[3] == -1.0

    # Arrival (dist <= 0.06) flips to WAITING and zeroes the scale.
    env.hand_pos = policy.target_pos.copy()
    policy.update(env)
    assert policy._state == States.WAITING
    assert policy.delta_scale == 0.0
    assert 0 <= policy.counter_threshold <= 5

    # WAITING idles (null actions) then re-arms READY.
    for _ in range(6):
        action = policy.update(env)
        np.testing.assert_array_equal(action, [0.0, 0.0, 0.0, -1.0])
        if policy._state == States.READY:
            break
    assert policy._state == States.READY


def test_delta_scale_is_log_uniform_1_to_100():
    policy = PushWaypointPolicy(rng=np.random.default_rng(7))
    scales = []
    for _ in range(300):
        policy._state = States.READY
        policy.update(MockDoorEnv())
        scales.append(policy.delta_scale)
    scales = np.array(scales)
    assert scales.min() >= 1.0 and scales.max() <= 100.0
    # log-uniform: median(log) near log(10), substantial mass in each decade.
    assert 0.3 < np.mean(scales < 10.0) < 0.7


def test_velocity_stall_detection():
    env = MockDoorEnv()
    env.reset()
    env.MAX_STEP = 0.0  # hand never moves -> speed 0
    policy = PushWaypointPolicy(rng=np.random.default_rng(1))
    policy.update(env)  # READY -> ACTIVE
    # Stall fires at counter >= 5 with speed < 0.01.
    for i in range(5):
        assert policy._state == States.ACTIVE
        policy.update(env)
    assert policy._state == States.WAITING


def test_active_budget_exhaustion():
    env = MockDoorEnv()
    env.reset()
    policy = PushWaypointPolicy(rng=np.random.default_rng(1))
    policy.update(env)  # READY -> ACTIVE
    policy.counter_threshold = 3
    policy.target_pos = env.hand_pos + np.array([10.0, 0.0, 0.0])  # unreachable
    env.hand_velocity = np.array([1.0, 0.0, 0.0])  # moving: no stall
    for _ in range(3):
        env.hand_velocity = np.array([1.0, 0.0, 0.0])
        policy.update(env)
    assert policy._state == States.WAITING


# ---------------------------------------------------------------------------
# Interpolated pull waypoints


def test_interpolate_waypoint_oracle():
    # Piecewise path with segment lengths 1 and 2 (total 3).
    path = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 2.0, 0.0]])
    np.testing.assert_allclose(interpolate_waypoint(path, 0.0), path[0])
    np.testing.assert_allclose(interpolate_waypoint(path, 1.0), path[2])
    # alpha = 1/3 of total arc length = the first segment's end.
    np.testing.assert_allclose(
        interpolate_waypoint(path, 1.0 / 3.0), [1.0, 0.0, 0.0], atol=1e-12
    )
    # Halfway: 0.5 * 3 = 1.5 units -> 0.5 into the second segment.
    np.testing.assert_allclose(
        interpolate_waypoint(path, 0.5), [1.0, 0.5, 0.0], atol=1e-12
    )


def test_interpolate_waypoint_is_arc_length_parametrized():
    path = PullWaypointPolicy.PULL_WAYPOINTS
    alphas = np.linspace(0.0, 1.0, 50)
    points = np.array([interpolate_waypoint(path, a) for a in alphas])
    # Consecutive points should be (approximately) evenly spaced in arc
    # length — that is the point of the parametrization.
    spacing = np.linalg.norm(np.diff(points, axis=0), axis=1)
    assert spacing.std() / spacing.mean() < 0.05


def test_pull_waypoints_offset_and_noise():
    rng = np.random.default_rng(11)
    offset = (0.05, -0.03)
    policy = PullWaypointPolicy(door_offset=offset, rng=rng)
    np.testing.assert_allclose(
        policy.pull_waypoints,
        PullWaypointPolicy.PULL_WAYPOINTS + np.array([0.05, -0.03, 0.0]),
    )
    # z noise scale is 0: sampled z stays on the (interpolated) arc exactly.
    z_lo, z_hi = policy.pull_waypoints[:, 2].min(), policy.pull_waypoints[:, 2].max()
    for _ in range(20):
        wp = policy._sample_waypoint()
        assert z_lo - 1e-9 <= wp[2] <= z_hi + 1e-9, wp


# ---------------------------------------------------------------------------
# Push retract/push cycling


def test_push_retract_push_cycle():
    policy = PushWaypointPolicy(door_offset=(0.0, 0.0), rng=np.random.default_rng(5))
    assert policy.push_state == PushWaypointPolicy.PushStates.NEED_RETRACT

    retract = policy._sample_waypoint()
    assert policy.push_state == PushWaypointPolicy.PushStates.RETRACTED
    assert 0.14 <= retract[0] <= 0.14 + 1e-9 or retract[0] <= policy.push_x
    assert -0.3 <= retract[1] <= 0.0

    old_frontier = policy.push_x
    push = policy._sample_waypoint()
    assert policy.push_state == PushWaypointPolicy.PushStates.NEED_RETRACT
    assert old_frontier <= push[0] <= 0.67
    assert policy.push_x == pytest.approx(push[0])  # frontier advances
    assert -0.3 <= push[1] <= 0.19


def test_push_initial_state():
    policy = PushWaypointPolicy(rng=np.random.default_rng(2))
    joints, door = policy.get_initial_state()
    assert joints.shape == (7,)
    assert 0.8 <= door <= 1.2


# ---------------------------------------------------------------------------
# Pull initial state (IK path + rest-pose fallback)


def test_pull_initial_state_rest_fallback():
    policy = PullWaypointPolicy(rng=np.random.default_rng(2))
    joints, door = policy.get_initial_state()
    np.testing.assert_array_equal(joints, PullWaypointPolicy.REST_JOINTS)
    assert door == 0.0


class _FakeIKController:
    """Converging IK stub: FK returns the target once IK has been asked
    twice, mimicking the reference's iterative refinement loop
    (waypoint_policies.py:189-211)."""

    def __init__(self, target):
        self.target = np.asarray(target)
        self.calls = 0
        self._synced = None

    def sync_ik_robot(self, joints):
        self._synced = np.asarray(joints)

    def forward_kinematics(self):
        if self.calls >= 2:
            return self.target, np.eye(3).ravel()
        return self.target + 0.05, np.eye(3).ravel()

    def inverse_kinematics(self, target_position, orientation, rest_poses):
        self.calls += 1
        return rest_poses + 0.01 * self.calls


def test_pull_initial_state_runs_ik_to_convergence():
    policy = PullWaypointPolicy(rng=np.random.default_rng(2))
    ik = _FakeIKController(policy.pull_waypoints[0])
    policy.ik_controller = ik
    joints, door = policy.get_initial_state()
    assert ik.calls >= 2  # refined until FK error < 1e-4
    assert joints.shape == (7,)
    assert door == 0.0


# ---------------------------------------------------------------------------
# Episode loop: termination causes + TrajectoriesFile plumbing


def _run(env, policy, tmp_path, max_iterations=40):
    from multimodalfilter_tpu.data import TrajectoriesFile

    path = os.path.join(tmp_path, "out.hdf5")
    with TrajectoriesFile(path, "a") as f:
        cause = simulate_door.run_episode(
            env, policy, f, max_iterations=max_iterations
        )
        count = len(f)
    return cause, count, path


def test_joint_limit_abandonment(tmp_path):
    env = MockDoorEnv(q_limits=True)
    policy = PullWaypointPolicy(rng=np.random.default_rng(0))
    # The leaky counter needs >400 consecutive failures to trip.
    cause, count, _ = _run(env, policy, str(tmp_path), max_iterations=450)
    assert cause == "joint limits"
    assert count == 0  # abandoned, nothing written


def test_missing_contact_terminates_but_completes(tmp_path):
    env = MockDoorEnv(contact=False)
    policy = PullWaypointPolicy(rng=np.random.default_rng(0))
    cause, count, _ = _run(env, policy, str(tmp_path), max_iterations=450)
    assert cause == "missing contact"
    assert count == 1  # kept: only joint limits abandon (reference :141-145)


def test_transient_failure_decays(tmp_path):
    # A brief joint-limit blip decays (x0.9/step) and the episode completes.
    env = MockDoorEnv()

    orig_step, blip = env.step, [0]

    def step(action):
        blip[0] += 1
        env.q_limits_active = 3 <= blip[0] < 8  # 5-step blip
        return orig_step(action)

    env.step = step
    policy = PullWaypointPolicy(rng=np.random.default_rng(0))
    cause, count, _ = _run(env, policy, str(tmp_path), max_iterations=30)
    assert cause == "max iteration"
    assert count == 1


def test_push_closed_door_termination(tmp_path):
    env = MockDoorEnv(hinge_rate=-0.05)
    policy = PushWaypointPolicy(rng=np.random.default_rng(0))

    # run_episode sets the hinge from the policy (U(0.8, 1.2)); it closes at
    # 0.05/step -> "closed door" well before 40 iterations.
    cause, count, _ = _run(env, policy, str(tmp_path), max_iterations=40)
    assert cause == "closed door"
    assert count == 1


def test_full_episode_roundtrips_through_task_loader(tmp_path):
    """Collected episode -> TrajectoriesFile -> _load_trajectories: the
    datasets the collector writes must be exactly what the task loader
    consumes (reference simulate_door.py:133 -> _door.py:124-179)."""
    from multimodalfilter_tpu.data import TrajectoriesFile, cache

    env = MockDoorEnv(hinge_rate=0.01)
    policy = PullWaypointPolicy(rng=np.random.default_rng(4))

    cache_dir = os.path.join(str(tmp_path), "cache")
    cache.set_cache_path(cache_dir)
    path = os.path.join(cache_dir, "panda_door_pull_10.hdf5")
    T = 35
    with TrajectoriesFile(path, "a") as f:
        cause = simulate_door.run_episode(env, policy, f, max_iterations=T)
        assert cause == "max iteration"
        # Grayscaled to [-1, 1] (reference simulate_door.py:114).
        raw = f[0]
        assert raw["image"].shape == (T, 64, 64)
        assert raw["image"].min() >= -1.0 and raw["image"].max() <= 1.0

    from crossmodal.tasks._door import _load_trajectories

    trajectories = _load_trajectories("panda_door_pull_10.hdf5", seed=0)
    assert len(trajectories) == 1
    traj = trajectories[0]
    assert traj.states.shape == (T, 3)
    assert traj.observations["image"].shape == (T, 32, 32)
    assert traj.observations["gripper_pos"].shape == (T, 3)
    assert traj.observations["gripper_sensors"].shape == (T, 7)
    assert traj.controls.shape == (T, 7)
    for leaf in [traj.states, traj.controls, *traj.observations.values()]:
        assert np.all(np.isfinite(leaf))
