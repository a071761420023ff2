"""RealRobotController parity tests for the host-side RobotDriver
(reference envs.py:1563-1873) with a mocked transport — no hardware, no
pose servers.

Covers the VERDICT r3 real-stack gaps: slowing/aligning approach states,
failed-lift abort, failed-throw pull-back-and-retry (envs.py:1690-1700,
1818-1826), the dropped-lifted-cube monitor (envs.py:1747-1756), and the
pure debug-overlay renderer fed by the driver's pursuit payloads
(aruco/server.py:118-145).
"""

import math

import numpy as np
import pytest

from spatial_intention_maps_tpu import constants
from spatial_intention_maps_tpu.real.real_env import (
    ALIGNING, DRIVING, IDLE, LIFTING, PULLING, RESCUING, SLOWING, THROWING,
    TURNING, RobotDriver,
)


class FakeTransport:
    """Records motor commands; the test script drives the lift readout."""

    def __init__(self):
        self.lift_height = 0.0
        self.wheel_log = []
        self.lift_log = []
        self.lift_motor_log = []

    def set_wheel_speeds(self, left, right):
        self.wheel_log.append((left, right))

    def set_lift(self, up):
        self.lift_log.append(up)

    def set_lift_motor(self, speed):
        self.lift_motor_log.append(speed)


def _goal_distance_for(driver, signed):
    """Position distance that makes the driver's signed_dist equal ``signed``."""
    return signed + driver._ee_location + constants.CUBE_WIDTH / 2


def test_lifting_flow_through_slowing_and_aligning():
    t = FakeTransport()
    d = RobotDriver(t, "lifting_robot")
    goal = (0.5, 0.0)
    d.new_action([(0.0, 0.0), goal], end_effector_action=True)
    assert d.state == TURNING

    # Aligned with the path: turning completes immediately, driving starts.
    d.step((0.0, 0.0), 0.0)
    assert d.state == DRIVING

    # Drive until within a cube width of the end-effector touch point ->
    # aligning (hooks robot, envs.py:1768-1776).
    near = goal[0] - _goal_distance_for(d, constants.CUBE_WIDTH / 2)
    d.step((near, 0.0), 0.0)
    assert d.state == ALIGNING

    # Aligned + within the 1 mm buffer -> lift starts (envs.py:1793-1796).
    at = goal[0] - _goal_distance_for(d, 0.0005)
    d.step((at, 0.0), 0.0)
    assert d.state == LIFTING
    assert t.lift_log[-1] is True

    # Lift succeeds -> carrying, idle.
    t.lift_height = 1.0
    d.step((at, 0.0), 0.0)
    assert d.state == IDLE
    assert d.carrying


def test_failed_lift_aborts_after_tick_limit():
    t = FakeTransport()
    d = RobotDriver(t, "lifting_robot")
    d.new_action([(0.0, 0.0), (0.2, 0.0)], end_effector_action=True)
    d.state = LIFTING
    d._ticks = 0
    d._lift_t0 = 0.0
    t.lift_height = 0.1  # jammed against a wall (envs.py:1675-1679)
    for _ in range(RobotDriver.LIFT_TICK_LIMIT + 1):
        d.step((0.2, 0.0), 0.0)
    assert d.state == IDLE
    assert not d.carrying
    assert t.lift_log[-1] is False  # lift lowered on abort


def test_failed_throw_pulls_back_and_retries():
    t = FakeTransport()
    d = RobotDriver(t, "throwing_robot")
    d.new_action([(0.0, 0.0), (0.2, 0.0)], end_effector_action=True)
    d._start_manipulation()
    assert d.state == THROWING
    assert t.lift_motor_log == [8.0]

    # Lift never rises -> failed throw -> pulling (back up, lift motor off).
    t.lift_height = 0.0
    for _ in range(RobotDriver.THROW_TICK_LIMIT + 1):
        d.step((0.2, 0.0), 0.0)
    assert d.state == PULLING
    assert t.lift_motor_log[-1] == 0.0
    assert t.wheel_log[-1] == (-0.04, -0.04)

    # Pull-back completes -> retry the throw (envs.py:1822-1826).
    for _ in range(RobotDriver.PULL_TICKS + 1):
        d.step((0.2, 0.0), 0.0)
    assert d.state == THROWING
    assert t.lift_motor_log[-1] == 8.0
    assert t.wheel_log[-1] == (0.0, 0.0)

    # This time the lift rises; after the throw window the action completes.
    t.lift_height = 1.0
    for _ in range(RobotDriver.THROW_DONE_TICKS + 1):
        d.step((0.2, 0.0), 0.0)
    assert d.state == IDLE


def test_rescue_flow_lowers_lift_after_window():
    t = FakeTransport()
    d = RobotDriver(t, "rescue_robot")
    d.new_action([(0.0, 0.0), (0.2, 0.0)], end_effector_action=True)
    d._start_manipulation()
    assert d.state == LIFTING
    t.lift_height = 1.0
    d.step((0.2, 0.0), 0.0)
    assert d.state == RESCUING
    for _ in range(RobotDriver.RESCUE_TICKS + 1):
        d.step((0.2, 0.0), 0.0)
    assert d.state == IDLE
    assert t.lift_log[-1] is False


def test_dropped_cube_monitor():
    t = FakeTransport()
    d = RobotDriver(t, "lifting_robot")
    d.carrying = True
    # Cube estimate close to the robot: no drop.
    for _ in range(RobotDriver.CUBE_MONITOR_TICKS + 2):
        d.monitor_lifted_cube((0.0, 0.0), (0.05, 0.0))
    assert d.carrying and not d.dropped_cube
    # Estimate strays >10 cm for >10 polls: drop detected (envs.py:1747-1756).
    for _ in range(RobotDriver.CUBE_MONITOR_TICKS + 1):
        d.monitor_lifted_cube((0.0, 0.0), (0.3, 0.0))
    assert d.dropped_cube
    assert not d.carrying
    assert t.lift_log[-1] is False


def test_carrying_drop_goes_through_slowing():
    t = FakeTransport()
    d = RobotDriver(t, "lifting_robot")
    d.carrying = True
    goal = (0.4, 0.0)
    d.new_action([(0.0, 0.0), goal], end_effector_action=True)
    d.step((0.0, 0.0), 0.0)          # turning -> driving
    near = goal[0] - _goal_distance_for(d, constants.CUBE_WIDTH / 2)
    d.step((near, 0.0), 0.0)         # -> aligning -> redirected to slowing
    d.step((near, 0.0), 0.0)
    assert d.state == SLOWING
    at = goal[0] - _goal_distance_for(d, 0.001)
    d.step((at, 0.0), 0.0)           # within 2 mm -> drop + idle
    assert d.state == IDLE
    assert not d.carrying
    assert t.lift_log[-1] is False


def test_debug_data_published_while_driving():
    t = FakeTransport()
    d = RobotDriver(t, "pushing_robot")
    d.new_action([(0.0, 0.0), (0.5, 0.1)], end_effector_action=False)
    d.step((0.0, 0.0), 0.2)
    assert d.debug_data is not None
    lookahead, _sr, err, pos, heading = d.debug_data
    assert isinstance(lookahead, tuple) and len(lookahead) == 2
    assert pos == (0.0, 0.0) and heading == 0.2
    assert abs(err) < math.pi


def test_render_debug_overlay_draws():
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "aruco"):
        pytest.skip("cv2.aruco missing")
    from spatial_intention_maps_tpu.real.aruco_server import (
        Board, render_debug_overlay,
    )

    board = Board(corner_ids=[42, 43, 44, 45], board_length_mm=1000,
                  board_width_mm=500)
    warped = np.zeros((1000, 2000, 3), np.uint8)
    robot_poses = {0: {"position": (0.1, 0.05), "heading": 0.3}}
    payload = [((0.2, 0.0), 0.4, 0.2, (0.1, 0.05), 0.3), None]
    img = render_debug_overlay(board, warped, robot_poses, {}, payload)
    assert img.shape == warped.shape
    assert img.sum() > 0          # something was drawn
    assert warped.sum() == 0      # input untouched (pure)
