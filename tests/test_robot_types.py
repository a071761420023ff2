"""Behavior tests for pushing / throwing / rescue robots
(PushingRobot envs.py:1058-1087, ThrowingRobot :1278-1343,
RescueRobot :1345-1366)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu import constants
from spatial_intention_maps_tpu.envs import env as E
from spatial_intention_maps_tpu.envs.types import (
    CUBE_AVAILABLE,
    CUBE_LIFTED,
    CUBE_REMOVED,
    EnvParams,
)

N = constants.LOCAL_MAP_PIXEL_WIDTH


def action_for(channel, i, j):
    return jnp.array([channel * N * N + i * N + j], jnp.int32)


def place_robot(state, x, y, heading):
    pos = jnp.array([[x, y]])
    h = jnp.array([heading])
    return state.replace(
        robot_pos=pos, robot_heading=h, target_pos=pos, target_heading=h,
        prev_wp_pos=pos,
    )


def far_cubes(n):
    return jnp.tile(
        jnp.array([[-0.45, -0.22, constants.CUBE_WIDTH / 2]]), (n, 1)
    )


def test_pushing_robot_scores_by_pushing():
    params = EnvParams.from_robot_config(
        [{"pushing_robot": 1}], env_name="small_empty",
        room_length=1.0, room_width=0.5, num_cubes=2,
        use_partial_observations=False,
    )
    step = jax.jit(lambda s, a: E.step(params, s, a))
    state = jax.jit(lambda k: E.reset(params, k))(jax.random.PRNGKey(0))
    state = place_robot(state, 0.1, 0.175, 0.0)
    cubes = far_cubes(2).at[0].set(
        jnp.array([0.2, 0.175, constants.CUBE_WIDTH / 2])
    )
    state = state.replace(cube_pos=cubes, cube_heading=jnp.zeros(2))

    # Drive 0.3 m through the cube toward the receptacle corner: the blade
    # plows it into the receptacle (pushed-cube scoring, envs.py:264-275).
    out = step(state, action_for(0, 18, 48))
    s2 = out[0]
    assert int(s2.cube_status[0]) == CUBE_REMOVED, np.asarray(s2.cube_pos[0])
    # Success (1.0) + positive shortest-path partial rewards
    # (partial_rewards_scale * dist_closer, envs.py:1076-1087).
    assert float(s2.reward[0]) > 1.0, float(s2.reward[0])
    assert int(s2.cum_cubes[0]) == 1


def test_throwing_robot_grabs_and_throws():
    params = EnvParams.from_robot_config(
        [{"throwing_robot": 1}], env_name="small_empty",
        room_length=1.0, room_width=0.5, num_cubes=2,
        use_partial_observations=False,
    )
    step = jax.jit(lambda s, a: E.step(params, s, a))
    state = jax.jit(lambda k: E.reset(params, k))(jax.random.PRNGKey(1))
    state = place_robot(state, -0.2, 0.0, 0.0)
    cubes = far_cubes(2).at[0].set(jnp.array([0.0, 0.0, constants.CUBE_WIDTH / 2]))
    state = state.replace(cube_pos=cubes, cube_heading=jnp.zeros(2))

    out = step(state, action_for(1, 28, 48))
    s2 = out[0]
    # The cube was grabbed and thrown backwards over the shoulder
    # (envs.py:1314-1329): after the 100-substep manipulation window it is
    # available again (or scored), never still lifted.
    assert int(s2.cube_status[0]) in (CUBE_AVAILABLE, CUBE_REMOVED)
    assert int(s2.carried_cube[0]) == -1
    assert int(s2.fsm[0]) == 0
    cube_xy = np.asarray(s2.cube_pos[0, :2])
    if int(s2.cube_status[0]) == CUBE_AVAILABLE:
        # Thrown backwards: the robot faced +x at the grab point near x~0,
        # so the cube lands at lower x than the grab position.
        assert cube_xy[0] < -0.0, cube_xy


def test_rescue_robot_removes_cube():
    params = EnvParams.from_robot_config(
        [{"rescue_robot": 1}], env_name="small_empty",
        room_length=1.0, room_width=0.5, num_cubes=2,
        use_partial_observations=False,
        use_distance_to_receptacle_map=False,
        use_shortest_path_to_receptacle_map=False,
    )
    assert not params.has_receptacle
    assert params.num_state_channels == 3
    step = jax.jit(lambda s, a: E.step(params, s, a))
    state = jax.jit(lambda k: E.reset(params, k))(jax.random.PRNGKey(2))
    state = place_robot(state, -0.2, 0.0, 0.0)
    cubes = far_cubes(2).at[0].set(jnp.array([0.0, 0.0, constants.CUBE_WIDTH / 2]))
    state = state.replace(cube_pos=cubes, cube_heading=jnp.zeros(2))

    out = step(state, action_for(1, 28, 48))
    s2 = out[0]
    # Rescue removes + scores immediately (envs.py:1362-1366).
    assert int(s2.cube_status[0]) == CUBE_REMOVED
    assert float(s2.reward[0]) == pytest.approx(1.0, abs=1e-4)
    assert int(s2.cum_cubes[0]) == 1
