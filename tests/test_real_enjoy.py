"""End-to-end real-robot serving test (VERDICT r4 missing #5).

Drives a trained-policy-shaped EvalPolicy through the full real stack —
policy.step -> RealEnv.step -> native-SPFA planning -> RobotDriver pure
pursuit -> transport motor commands — with a mocked pose server and a
kinematic fake world standing in for the ArUco cameras and Vector robots.
Mirrors the reference's ``enjoy.py --real`` loop (enjoy.py:13-31).
"""

import math

import numpy as np
import pytest

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import factory
from spatial_intention_maps_tpu.eval_policy import EvalPolicy

pytestmark = pytest.mark.slow  # compiles the perception graph on CPU


WHEEL_BASE = 0.048  # matches pure_pursuit.arc_command


class FakeWorld:
    """Differential-drive kinematics shared by the fake transports and the
    fake pose-server connection; one integration tick per pose poll."""

    def __init__(self, robot_poses, cube_poses, dt=0.05):
        self.robots = {rid: list(p) for rid, p in robot_poses.items()}
        self.cubes = {cid: list(p) for cid, p in cube_poses.items()}
        self.wheels = {rid: (0.0, 0.0) for rid in robot_poses}
        self.dt = dt
        self.ticks = 0

    def tick(self):
        self.ticks += 1
        for rid, (left, right) in self.wheels.items():
            x, y, h = self.robots[rid]
            v = (left + right) / 2.0
            w = (right - left) / WHEEL_BASE
            h += w * self.dt
            x += v * self.dt * math.cos(h)
            y += v * self.dt * math.sin(h)
            self.robots[rid] = [x, y, h]


class FakeTransport:
    def __init__(self, world, rid):
        self.world = world
        self.rid = rid
        self.lift_height = 0.0
        self.wheel_log = []
        self.lift_log = []

    def set_wheel_speeds(self, left, right):
        self.wheel_log.append((left, right))
        self.world.wheels[self.rid] = (left, right)

    def set_lift(self, up):
        self.lift_log.append(up)
        self.lift_height = 1.0 if up else 0.0


class FakeConn:
    """multiprocessing.connection.Client stand-in: each poll advances the
    world one tick and returns every pose, like the ArUco server's
    send(debug)/recv() protocol (real/aruco_server.py)."""

    def __init__(self, world):
        self.world = world
        self.debug_log = []

    def send(self, debug):
        self.debug_log.append(debug)
        self.world.tick()

    def recv(self):
        robots = {
            rid: {"position": (x, y), "heading": h}
            for rid, (x, y, h) in self.world.robots.items()
        }
        cubes = {
            cid: {"position": (x, y), "heading": h}
            for cid, (x, y, h) in self.world.cubes.items()
        }
        return robots, cubes


def _cfg():
    cfg = config_mod.default_config()
    cfg.experiment_name = "lifting_2-small_empty-ours"
    cfg.robot_config = [{"lifting_robot": 2}]
    cfg.env_name = "small_empty"
    cfg.room_length, cfg.room_width = 1.0, 0.5
    cfg.num_cubes = 2
    cfg.num_input_channels = 5
    cfg.use_intention_map = True
    cfg.inactivity_cutoff_per_robot = 3
    cfg.fcn_layer_planes = [8, 8, 8, 8]
    cfg.fcn_head_planes = [8, 8]
    cfg.policy_path = None
    return cfg


def test_policy_serves_real_env_end_to_end():
    cfg = _cfg()
    world = FakeWorld(
        robot_poses={0: (-0.3, 0.1, 0.0), 1: (-0.3, -0.1, 0.0)},
        cube_poses={5: (0.1, 0.05, 0.0), 7: (0.15, -0.05, 0.0)},
    )
    transports = [FakeTransport(world, 0), FakeTransport(world, 1)]
    conn = FakeConn(world)
    env = factory.get_env_from_cfg(
        cfg, real=True, real_robot_indices=[0, 1], real_cube_indices=[5, 7],
        real_env_kwargs=dict(transports=transports, conns=[conn],
                             poll_hz=1000.0),
    )
    policy = EvalPolicy(cfg)

    state = env.reset()
    # Nested [group][robot] obs, exactly one non-None (the awaiting robot).
    assert len(state) == 1 and len(state[0]) == 2
    flat = [s for g in state for s in g if s is not None]
    assert len(flat) == 1
    assert flat[0].shape[-1] == cfg.num_input_channels
    # The mirror took the fake-world pose, not the sim reset's sample.
    np.testing.assert_allclose(
        np.asarray(env.state.robot_pos[0]), [-0.3, 0.1], atol=1e-6
    )

    # Step 1: robot 0 acts; robot 1 has never acted, so the sequential
    # protocol hands it the turn immediately (env.py:477-486 parity) —
    # no driving happens yet.
    action = policy.step(state)
    state, reward, done, info = env.step(action, max_seconds=30)
    assert not done
    assert env._awaiting == 1
    assert state[0][1] is not None and state[0][0] is None
    # Robot 0's plan is mirrored into the state for teammates' intention
    # maps (inject_action parity).
    assert int(env.state.num_wp[0]) >= 2

    # Step 2: robot 1 acts; now both drivers are busy, so the env polls
    # poses and issues motor commands until one goes idle.
    action = policy.step(state)
    state, reward, done, info = env.step(action, max_seconds=30)
    assert world.ticks > 1
    assert transports[0].wheel_log or transports[0].lift_log
    assert transports[1].wheel_log or transports[1].lift_log
    assert info["steps"] == 2
    # The overlay payloads flowed to the pose server during driving.
    assert any(d is not None for d in conn.debug_log)
    if not done:
        flat = [s for g in state for s in g if s is not None]
        assert len(flat) == 1


def test_real_env_inactivity_cutoff_terminates():
    cfg = _cfg()
    cfg.robot_config = [{"lifting_robot": 1}]
    cfg.inactivity_cutoff_per_robot = 1
    world = FakeWorld(
        robot_poses={0: (-0.3, 0.0, 0.0)},
        cube_poses={5: (0.1, 0.05, 0.0), 7: (0.15, -0.05, 0.0)},
    )
    transports = [FakeTransport(world, 0)]
    env = factory.get_env_from_cfg(
        cfg, real=True, real_robot_indices=[0], real_cube_indices=[5, 7],
        real_env_kwargs=dict(transports=transports, conns=[FakeConn(world)],
                             poll_hz=1000.0),
    )
    policy = EvalPolicy(cfg)
    state = env.reset()
    state, _, done, info = env.step(policy.step(state), max_seconds=30)
    assert done  # steps (1) >= inactivity cutoff (1 robot x 1)
    assert all(s is None for g in state for s in g)
