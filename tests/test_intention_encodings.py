"""Encoding-level unit tests for the signature intention/history maps
(envs.py:2301-2377; VERDICT r1 next-step #7): ramp decay values, binary/line
constants, circle dots, 2-px dilation thickness, self/idle exclusion, and the
baseline intention channels (spatial ordering + nonspatial values)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu import constants
from spatial_intention_maps_tpu.envs import env as E
from spatial_intention_maps_tpu.envs import geometry, mapper
from spatial_intention_maps_tpu.envs.types import EnvParams, MOVING

PPM = constants.LOCAL_MAP_PIXELS_PER_METER


def _params(num_robots=2, **kw):
    kw.setdefault("use_intention_map", True)
    return EnvParams.from_robot_config(
        [{"lifting_robot": num_robots}],
        env_name="small_empty", room_length=1.0, room_width=0.5,
        num_cubes=2, use_partial_observations=False, **kw,
    )


def _state_with_path(params, other_pos, other_target, self_path_y=True):
    """Reset, then hand the OTHER robot (index 1) a straight path from
    other_pos to end-effector target other_target; robot 0 (the observer)
    gets a decoy path so self-exclusion is observable."""
    state = jax.jit(lambda k: E.reset(params, k))(jax.random.PRNGKey(0))
    r_n = params.num_robots
    pos = jnp.zeros((r_n, 2)).at[1].set(jnp.asarray(other_pos))
    pos = pos.at[0].set(jnp.asarray([-0.3, -0.15]))
    fsm = jnp.full((r_n,), MOVING, jnp.int32)
    k = constants.MAX_WAYPOINTS
    wps = jnp.tile(pos[:, None, :], (1, k, 1))
    tgt = jnp.zeros((r_n, 2)).at[1].set(jnp.asarray(other_target))
    # Observer decoy: vertical path that must NOT appear in its own map.
    tgt = tgt.at[0].set(jnp.asarray([-0.3, 0.15]))
    state = state.replace(
        robot_pos=pos,
        robot_heading=jnp.zeros(r_n),
        fsm=fsm,
        target_ee=tgt,
        waypoints=wps,
        wp_headings=jnp.zeros((r_n, k)),
        num_wp=jnp.full((r_n,), 2, jnp.int32),
        wp_index=jnp.ones((r_n,), jnp.int32),
    )
    return state


def _px(params, x, y):
    h, w = params.map_shape
    i, j = geometry.position_to_pixel(jnp.float32(x), jnp.float32(y), h, w)
    return int(i), int(j)


def test_ramp_values_decay_along_path():
    params = _params()
    # Other robot at origin, target 0.25 m along +x; scale 1.0 (config
    # default) => ramp 1.0 at the source decaying to 0.75 at the target.
    state = _state_with_path(params, (0.0, 0.0), (0.25, 0.0))
    g = np.asarray(mapper.global_intention_or_history_map(params, state, 0, "ramp"))

    tol = 3.5 / PPM  # sampling rounding + 1-px dilation
    for frac in (0.0, 0.5, 1.0):
        x = 0.25 * frac
        i, j = _px(params, x, 0.0)
        expect = 1.0 - 0.25 * frac
        assert g[i, j] == pytest.approx(expect, abs=tol), (frac, g[i, j])

    # Nothing beyond the target (+ dilation margin).
    i, j = _px(params, 0.30, 0.0)
    assert g[i, j] == 0.0
    # The observer's own decoy path must not appear (self-exclusion,
    # envs.py:2303-2305).
    i, j = _px(params, -0.3, 0.0)
    assert g[i, j] == 0.0


def test_ramp_clips_below_zero_on_long_paths():
    params = _params()
    # Two-segment path of total length ~1.09 m (> 1/scale): values clip at 0
    # near the target (np.clip(..., 0, 1), envs.py:2334).
    state = _state_with_path(params, (-0.45, 0.0), (0.45, -0.2))
    wps = state.waypoints.at[1, 1].set(jnp.asarray([0.0, 0.2]))
    state = state.replace(
        waypoints=wps,
        num_wp=state.num_wp.at[1].set(3),
        wp_index=state.wp_index.at[1].set(1),
    )
    g = np.asarray(mapper.global_intention_or_history_map(params, state, 0, "ramp"))
    i, j = _px(params, 0.45, -0.2)
    assert g[i, j] == pytest.approx(0.0, abs=1e-6)
    i, j = _px(params, -0.45, 0.0)
    assert g[i, j] == pytest.approx(1.0, abs=0.05)
    assert g.max() <= 1.0 + 1e-6


def test_binary_constant_and_line_thickness():
    params = _params()
    state = _state_with_path(params, (0.0, 0.0), (0.25, 0.0))
    g = np.asarray(mapper.global_intention_or_history_map(params, state, 0, "binary"))
    i0, j0 = _px(params, 0.0, 0.0)
    i1, j1 = _px(params, 0.25, 0.0)
    seg = g[i0, j0:j1 + 1]
    assert np.all(seg == 1.0), seg
    # Dilation with disk(thickness - 1 = 1): rows +-1 filled, +-2 empty
    # (envs.py:2343-2346, selem disk(1)).
    assert np.all(g[i0 - 1, j0 + 2:j1 - 2] == 1.0)
    assert np.all(g[i0 + 1, j0 + 2:j1 - 2] == 1.0)
    assert np.all(g[i0 - 2, j0 + 2:j1 - 2] == 0.0)
    assert np.all(g[i0 + 2, j0 + 2:j1 - 2] == 0.0)


def test_line_uses_endpoints_only():
    params = _params()
    # Two-segment path: source -> waypoint (0, 0.2) -> target (0.25, 0.0);
    # 'line' must rasterize ONLY source->target (envs.py:2314-2315).
    state = _state_with_path(params, (-0.25, 0.0), (0.25, 0.0))
    k = constants.MAX_WAYPOINTS
    wps = state.waypoints.at[1, 1].set(jnp.asarray([0.0, 0.2]))
    state = state.replace(
        waypoints=wps,
        num_wp=state.num_wp.at[1].set(3),
        wp_index=state.wp_index.at[1].set(1),
    )
    g = np.asarray(mapper.global_intention_or_history_map(params, state, 0, "line"))
    # Straight chord present...
    i, j = _px(params, 0.0, 0.0)
    assert g[i, j] == 1.0
    # ...but the intermediate waypoint detour is not.
    i, j = _px(params, 0.0, 0.2)
    assert g[i, j] == 0.0

    ramp = np.asarray(mapper.global_intention_or_history_map(params, state, 0, "ramp"))
    assert ramp[i, j] > 0.0  # ramp DOES walk through the waypoint


def test_circle_is_a_dilated_endpoint_dot():
    params = _params()
    state = _state_with_path(params, (0.0, 0.0), (0.25, 0.1))
    g = np.asarray(mapper.global_intention_or_history_map(params, state, 0, "circle"))
    i, j = _px(params, 0.25, 0.1)
    assert g[i, j] == 1.0
    # Only the endpoint (dilated by disk(1)): a 5-px disk, nothing else.
    nz = np.argwhere(g > 0)
    assert len(nz) == 5, len(nz)
    assert np.abs(nz - np.array([i, j])).max() <= 1


def test_idle_robots_are_excluded():
    params = _params()
    state = _state_with_path(params, (0.0, 0.0), (0.25, 0.0))
    state = state.replace(fsm=state.fsm.at[1].set(0))  # IDLE
    g = np.asarray(mapper.global_intention_or_history_map(params, state, 0, "ramp"))
    assert g.max() == 0.0


def test_history_ramps_backwards_over_traversed_waypoints():
    params = _params()
    state = _state_with_path(params, (0.25, 0.0), (0.45, 0.0))
    # Robot 1 traversed (-0.25, 0) -> (0.25, 0) already: waypoint 0 is the
    # start, wp_index = 1 (get_history_path = traversed prefix, reversed,
    # envs.py:1477-1478, 2316-2317).
    wps = state.waypoints.at[1, 0].set(jnp.asarray([-0.25, 0.0]))
    state = state.replace(waypoints=wps)
    g = np.asarray(mapper.global_intention_or_history_map(params, state, 0, "history"))
    # Value 1.0 at the CURRENT position, decaying backwards along history.
    i, j = _px(params, 0.25, 0.0)
    assert g[i, j] == pytest.approx(1.0, abs=0.04)
    i, j = _px(params, 0.0, 0.0)
    assert g[i, j] == pytest.approx(0.75, abs=0.04)
    # The future leg (toward 0.45) is NOT in the history map.
    i, j = _px(params, 0.40, 0.0)
    assert g[i, j] == 0.0


def test_intention_channels_spatial_order_and_nonspatial_values():
    params = _params(
        num_robots=3, use_intention_map=False, use_intention_channels=True,
        intention_channel_encoding="spatial",
    )
    state = jax.jit(lambda k: E.reset(params, k))(jax.random.PRNGKey(0))
    pos = jnp.asarray([[0.0, 0.0], [0.4, 0.0], [-0.1, 0.0]])
    tgt = jnp.asarray([[0.0, 0.0], [0.4, 0.2], [-0.1, -0.2]])
    state = state.replace(
        robot_pos=pos,
        robot_heading=jnp.zeros(3),
        fsm=jnp.full((3,), MOVING, jnp.int32),
        target_ee=tgt,
    )
    glob_chans, local_chans = mapper.intention_channels(params, state, 0)
    assert len(glob_chans) == 2 and not local_chans
    # Nearest other robot first (robot 2 at 0.1 m, then robot 1 at 0.4 m):
    g0, g1 = np.asarray(glob_chans[0]), np.asarray(glob_chans[1])
    i, j = _px(params, -0.1, -0.2)
    assert g0[i, j] == 1.0 and g1[i, j] == 0.0
    i, j = _px(params, 0.4, 0.2)
    assert g1[i, j] == 1.0 and g0[i, j] == 0.0

    # Nonspatial: 2 constant channels per other robot, (d sin(theta),
    # d cos(theta)) x 0.025 (envs.py:2368-2375).
    params_ns = _params(
        num_robots=3, use_intention_map=False, use_intention_channels=True,
        intention_channel_encoding="nonspatial",
    )
    glob_chans, local_chans = mapper.intention_channels(params_ns, state, 0)
    assert not glob_chans and len(local_chans) == 4
    # Nearest robot (index 2): target (-0.1, -0.2), observer at origin
    # heading 0 => d = sqrt(0.05), theta = -atan2(-0.2, -0.1).
    d = math.sqrt(0.1 ** 2 + 0.2 ** 2)
    theta = 0.0 - math.atan2(-0.2, -0.1)
    exp = (0.025 * d * math.sin(theta), 0.025 * d * math.cos(theta))
    got = (float(np.asarray(local_chans[0])[0, 0]), float(np.asarray(local_chans[1])[0, 0]))
    assert got[0] == pytest.approx(exp[0], abs=1e-5)
    assert got[1] == pytest.approx(exp[1], abs=1e-5)
    assert np.asarray(local_chans[0]).std() == 0.0  # constant channel
