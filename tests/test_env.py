"""End-to-end environment behavior tests (small, CPU-friendly).

These validate the sequential action protocol, movement semantics, and
lift/drop manipulation against the reference's documented behavior
(envs.py:230-320, 856-919, 1168-1276).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu import constants
from spatial_intention_maps_tpu.envs import env as E
from spatial_intention_maps_tpu.envs.types import CUBE_LIFTED, CUBE_REMOVED, EnvParams

N = constants.LOCAL_MAP_PIXEL_WIDTH


@pytest.fixture(scope="module")
def params():
    return EnvParams.from_robot_config(
        [{"lifting_robot": 1}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=3,
        use_partial_observations=False,
    )


@pytest.fixture(scope="module")
def reset_fn(params):
    return jax.jit(lambda k: E.reset(params, k))


@pytest.fixture(scope="module")
def step_fn(params):
    return jax.jit(lambda s, a: E.step(params, s, a))


def action_for(channel, i, j):
    return jnp.array([channel * N * N + i * N + j], jnp.int32)


def place_robot(state, x, y, heading):
    pos = jnp.array([[x, y]])
    h = jnp.array([heading])
    return state.replace(
        robot_pos=pos, robot_heading=h, target_pos=pos, target_heading=h,
        prev_wp_pos=pos,
    )


def test_reset_valid(params, reset_fn):
    state = reset_fn(jax.random.PRNGKey(0))
    cube_xy = np.asarray(state.cube_pos[:, :2])
    assert np.all(np.abs(cube_xy[:, 0]) <= 0.5) and np.all(np.abs(cube_xy[:, 1]) <= 0.25)
    assert np.allclose(np.asarray(state.cube_pos[:, 2]), constants.CUBE_WIDTH / 2)
    rp = np.asarray(state.robot_pos)
    assert np.all(np.abs(rp[:, 0]) <= 0.5) and np.all(np.abs(rp[:, 1]) <= 0.25)
    assert bool(state.awaiting[0])
    # Determinism
    state2 = reset_fn(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(state2.robot_pos), rp)


def test_forward_move(params, reset_fn, step_fn):
    state = reset_fn(jax.random.PRNGKey(1))
    state = place_robot(state, -0.3, 0.0, 0.0)
    # Park cubes far away so nothing interferes.
    state = state.replace(
        cube_pos=jnp.tile(jnp.array([[0.45, -0.2, constants.CUBE_WIDTH / 2]]), (3, 1))
    )
    # Action: end effector 0.2448 m ahead (channel 0 = move only).
    out = step_fn(state, action_for(0, 24, 48))
    s2 = out[0]
    # Robot center ends offset back from the end-effector target
    # (envs.py:886-895): 0.2448 - (EE_LOC + CUBE_WIDTH/2) ~= 0.171 ahead.
    expected_x = -0.3 + 0.2448 - (0.0515 + constants.CUBE_WIDTH / 2)
    pos = np.asarray(s2.robot_pos[0])
    assert abs(pos[0] - expected_x) < 0.02, pos
    assert abs(pos[1]) < 0.02, pos
    assert bool(s2.awaiting[0])
    assert int(s2.fsm[0]) == 0  # idle
    assert float(s2.reward[0]) == pytest.approx(0.0, abs=1e-5)
    assert int(s2.simulation_steps) > 100


def test_lift_and_drop(params, reset_fn, step_fn):
    state = reset_fn(jax.random.PRNGKey(2))
    state = place_robot(state, -0.2, 0.0, 0.0)
    # One cube straight ahead at x=0, others out of the way.
    cube_pos = jnp.array(
        [
            [0.0, 0.0, constants.CUBE_WIDTH / 2],
            [-0.4, -0.2, constants.CUBE_WIDTH / 2],
            [-0.4, 0.2, constants.CUBE_WIDTH / 2],
        ]
    )
    state = state.replace(cube_pos=cube_pos, cube_heading=jnp.zeros(3))

    # Channel 1 (move + end effector) at the cube's pixel: the cube is 0.2 m
    # ahead -> local dy = 0.2 -> i = 48 - 0.2*96 = 28.7 -> 28, j = 48.
    out = step_fn(state, action_for(1, 28, 48))
    s2 = out[0]
    assert int(s2.cube_status[0]) == CUBE_LIFTED, np.asarray(s2.cube_status)
    assert int(s2.carried_cube[0]) == 0
    assert bool(s2.lifting[0])
    # Carried partial rewards accrue only on later distance lookups; reward
    # for the grab step itself is ~0 (no success yet).
    assert float(s2.reward[0]) < 0.5

    # Now drop in the receptacle: receptacle center (0.425, 0.175).
    # Current robot pose is near the cube; pick the action pixel whose world
    # position is the receptacle center.
    pos = np.asarray(s2.robot_pos[0])
    heading = float(s2.robot_heading[0])
    tx, ty = 0.425, 0.175
    dx_w, dy_w = tx - pos[0], ty - pos[1]
    # Invert: theta = heading + atan2(-dx, dy); world offset = dist*dir(theta)
    dist = math.hypot(dx_w, dy_w)
    theta = math.atan2(dy_w, dx_w)
    alpha = theta - heading  # = atan2(-dx_local, dy_local)
    dx_l = -dist * math.sin(alpha)
    dy_l = dist * math.cos(alpha)
    i = int(N / 2 - dy_l * 96 - 0.5)
    j = int(dx_l * 96 + N / 2 - 0.5)
    out = step_fn(s2, action_for(1, i, j))
    s3 = out[0]
    assert int(s3.cube_status[0]) == CUBE_REMOVED, np.asarray(s3.cube_status)
    assert not bool(s3.lifting[0])
    # Success reward 1.0 + positive shortest-path partial rewards
    # (envs.py:1196-1203).
    assert float(s3.reward[0]) > 0.9, float(s3.reward[0])
    assert int(s3.cum_cubes[0]) == 1


def test_pointless_drop_penalty(params, reset_fn, step_fn):
    state = reset_fn(jax.random.PRNGKey(3))
    state = place_robot(state, -0.2, 0.0, 0.0)
    cube_pos = jnp.array(
        [
            [0.0, 0.0, constants.CUBE_WIDTH / 2],
            [-0.4, -0.2, constants.CUBE_WIDTH / 2],
            [-0.4, 0.2, constants.CUBE_WIDTH / 2],
        ]
    )
    state = state.replace(cube_pos=cube_pos, cube_heading=jnp.zeros(3))
    out = step_fn(state, action_for(1, 28, 48))
    s2 = out[0]
    assert int(s2.cube_status[0]) == CUBE_LIFTED

    # Drop right here (far from receptacle): channel 1, tiny offset ahead.
    out = step_fn(s2, action_for(1, 40, 48))
    s3 = out[0]
    assert int(s3.cube_status[0]) == 0  # available again
    assert bool(s3.pointless_drop[0])
    # Penalty 0.25 applies; carried-cube partial rewards may offset slightly.
    assert float(s3.reward[0]) < 0.1
