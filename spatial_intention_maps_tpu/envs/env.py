"""The batched environment: reset / step with the reference's sequential
action protocol.

``reset`` and ``step`` operate on ONE environment (vmap for a batch; see
``vector_env.py``).  ``step`` mirrors VectorEnv.step (envs.py:230-320):

  inject action -> run simulation substeps until some robot idles ->
  set exactly one idle robot awaiting -> cube post-processing ->
  rewards/stats for awaiting (or all, if done) robots -> observation for the
  awaiting robot.

Expensive perception (configuration spaces, wavefront distance images) is
evaluated at step boundaries; partial-reward distance lookups are deferred to
the step end using recorded (initial, final) cube-position pairs, which is
semantically equivalent because the reference's occupancy memory is monotone
and its distance deltas subtract lookups from the same metric
(envs.py:1082-1087, 1210-1215, 2189-2194).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from .. import constants
from ..ops import paths, raster_ops, wavefront
from . import dynamics, geometry, mapper
from .types import (
    CUBE_AVAILABLE,
    CUBE_REMOVED,
    IDLE,
    MOVING,
    EnvParams,
    EnvState,
)

BIG = 1e9
N = constants.LOCAL_MAP_PIXEL_WIDTH


# ---------------------------------------------------------------------------
# Reset (VectorEnv.reset, envs.py:187-222 + _create_env/_reset_poses)
# ---------------------------------------------------------------------------

def _random_position(key, params, bounds, padding):
    """_get_random_position (envs.py:701-717): uniform in the room rectangle
    shrunk by padding, intersected with the spawn bounds."""
    x_min, x_max, y_min, y_max = bounds[0], bounds[1], bounds[2], bounds[3]
    low_x = jnp.where(jnp.isfinite(x_min), x_min, -params.room_length / 2) + padding
    high_x = jnp.where(jnp.isfinite(x_max), x_max, params.room_length / 2) - padding
    low_y = jnp.where(jnp.isfinite(y_min), y_min, -params.room_width / 2) + padding
    high_y = jnp.where(jnp.isfinite(y_max), y_max, params.room_width / 2) - padding
    u = jax.random.uniform(key, (2,))
    return jnp.stack([low_x + u[0] * (high_x - low_x), low_y + u[1] * (high_y - low_y)])


def reset(params: EnvParams, key) -> EnvState:
    h, w = params.map_shape
    r_n, c_n = params.num_robots, params.num_cubes
    k_layout, k_cubes, k_robots, k_state = jax.random.split(key, 4)

    layout = geometry.sample_layout(
        k_layout, params.env_name, params.room_length, params.room_width, params.has_receptacle
    )
    rects, corners, robot_bounds, cube_bounds = layout
    wall_map, seg_base = geometry.rasterize_layout(
        layout, h, w, params.room_length, params.room_width, params.receptacle_position
    )

    # --- Cube spawns: rejection against the receptacle (envs.py:685-694) ---
    tries = constants.SPAWN_REJECTION_TRIES

    def spawn_cube(k):
        k1, k2 = jax.random.split(k)
        cand = jax.vmap(lambda kk: _random_position(kk, params, cube_bounds, constants.CUBE_WIDTH / 2))(
            jax.random.split(k1, tries)
        )
        ok = ~dynamics.in_receptacle(params, cand) if params.has_receptacle else jnp.ones(tries, bool)
        idx = jnp.argmax(ok)
        heading = jax.random.uniform(k2, (), minval=-math.pi, maxval=math.pi)
        return cand[idx], heading

    cube_xy, cube_heading = jax.vmap(spawn_cube)(jax.random.split(k_cubes, c_n))
    cube_pos = jnp.concatenate(
        [cube_xy, jnp.full((c_n, 1), constants.CUBE_WIDTH / 2)], axis=-1
    )

    # --- Robot spawns: rejection against walls / robots / cubes
    # (_reset_poses re-roll loop, envs.py:651-683) ---
    robot_pos = jnp.zeros((r_n, 2))
    robot_heading = jnp.zeros((r_n,))
    rkeys = jax.random.split(k_robots, r_n)
    radii = params.radii
    for r in range(r_n):
        k1, k2 = jax.random.split(rkeys[r])
        cand = jax.vmap(
            lambda kk: _random_position(kk, params, robot_bounds, radii[r])
        )(jax.random.split(k1, tries))
        headings = jax.random.uniform(k2, (tries,), minval=-math.pi, maxval=math.pi)

        def ok_fn(p, hd):
            a = p + constants.ROBOT_BACKPACK_OFFSET * jnp.stack([jnp.cos(hd), jnp.sin(hd)])
            b = p + (params.ee_locations[r] + constants.END_EFFECTOR_THICKNESS) * jnp.stack(
                [jnp.cos(hd), jnp.sin(hd)]
            )
            t = jnp.linspace(0.0, 1.0, 7)
            pts = a[None] + t[:, None] * (b - a)[None]
            bad = jnp.any(dynamics._point_aabb_dist(pts, rects) <= dynamics.ROBOT_R)
            bad |= jnp.any(dynamics._point_fillet_sd(pts, corners) <= dynamics.ROBOT_R)
            # placed robots
            for rr in range(r):
                bad |= (
                    jnp.min(jnp.linalg.norm(pts - robot_pos[rr][None], axis=-1))
                    <= 2 * dynamics.ROBOT_R + float(radii[rr])
                )
            # cubes ("stacked on top of a cube", envs.py:670-672)
            dc = jnp.linalg.norm(pts[:, None, :] - cube_xy[None], axis=-1)
            bad |= jnp.any(dc <= dynamics.ROBOT_R + dynamics.CUBE_R)
            return ~bad

        ok = jax.vmap(ok_fn)(cand, headings)
        idx = jnp.argmax(ok)
        robot_pos = robot_pos.at[r].set(cand[idx])
        robot_heading = robot_heading.at[r].set(headings[idx])

    state = EnvState(
        key=k_state,
        rects=rects,
        corners=corners,
        robot_bounds=robot_bounds,
        cube_bounds=cube_bounds,
        wall_map=wall_map,
        seg_base=seg_base,
        robot_pos=robot_pos,
        robot_heading=robot_heading,
        target_pos=robot_pos,
        target_heading=robot_heading,
        fsm=jnp.zeros(r_n, jnp.int32),
        awaiting=jnp.zeros(r_n, bool),
        action=jnp.zeros((r_n, 3), jnp.int32),
        target_ee=robot_pos,
        waypoints=jnp.tile(robot_pos[:, None, :], (1, constants.MAX_WAYPOINTS, 1)),
        wp_headings=jnp.zeros((r_n, constants.MAX_WAYPOINTS)),
        num_wp=jnp.full((r_n,), 2, jnp.int32),
        wp_index=jnp.ones((r_n,), jnp.int32),
        prev_pos=robot_pos,
        prev_heading=robot_heading,
        has_prev=jnp.zeros(r_n, bool),
        ctrl_sim_steps=jnp.zeros(r_n, jnp.int32),
        consec_turn=jnp.zeros(r_n, jnp.int32),
        manip_target=jnp.zeros(r_n, jnp.int32),
        manip_steps=jnp.zeros(r_n, jnp.int32),
        lifting=jnp.zeros(r_n, bool),
        carried_cube=jnp.full((r_n,), -1, jnp.int32),
        throw_seed=jax.random.randint(
            k_state, (), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32
        ),
        throw_counter=jnp.zeros(r_n, jnp.int32),
        potential_cube=jnp.full((r_n,), -1, jnp.int32),
        blocked_obstacle=jnp.zeros(r_n, bool),
        blocked_robot=jnp.zeros(r_n, bool),
        cubes=jnp.zeros(r_n, jnp.int32),
        cubes_with_reward=jnp.zeros(r_n, jnp.int32),
        step_distance=jnp.zeros(r_n),
        prev_wp_pos=robot_pos,
        collided_obstacle=jnp.zeros(r_n, bool),
        collided_robot=jnp.zeros(r_n, bool),
        pointless_drop=jnp.zeros(r_n, bool),
        reward=jnp.zeros(r_n),
        cube_dist_closer=jnp.zeros(r_n),
        pr_initial=jnp.zeros((r_n, 2)),
        pr_final=jnp.zeros((r_n, 2)),
        pr_pending=jnp.zeros(r_n, bool),
        push_initial_cube_pos=jnp.full((c_n, 2), BIG),
        cum_cubes=jnp.zeros(r_n, jnp.int32),
        cum_distance=jnp.zeros(r_n),
        cum_reward=jnp.zeros(r_n),
        cum_obstacle_collisions=jnp.zeros(r_n, jnp.int32),
        cum_robot_collisions=jnp.zeros(r_n, jnp.int32),
        cube_pos=cube_pos,
        cube_heading=cube_heading,
        cube_vel=jnp.zeros((c_n, 3)),
        cube_status=jnp.zeros(c_n, jnp.int32),
        overhead_map=jnp.zeros((r_n, h, w), jnp.uint8),
        occupancy=jnp.zeros((r_n, h, w), bool),
        steps=jnp.int32(0),
        simulation_steps=jnp.int32(0),
        inactivity_steps=jnp.int32(0),
        done=jnp.bool_(False),
    )

    # Settle: separate any overlapping cubes (stand-in for
    # _step_simulation_until_still, envs.py:719-745).
    def settle(s, _):
        return dynamics.physics_substep(params, s, jnp.bool_(True)), None

    state, _ = jax.lax.scan(settle, state, None, length=8)
    state = state.replace(simulation_steps=jnp.int32(0))

    # First robot awaits an action (envs.py:211).
    state = state.replace(awaiting=state.awaiting.at[0].set(True))

    # Initial map update for every robot (envs.py:214-215).
    state = mapper.update_robot_maps(params, state, jnp.ones(r_n, bool))
    return state


# ---------------------------------------------------------------------------
# Planning grids with a dynamic robot index
# ---------------------------------------------------------------------------

def _distinct_radii(params: EnvParams):
    seen, out = set(), []
    for rad in params.cspace_radii_px:
        if rad not in seen:
            seen.add(rad)
            out.append(rad)
    return tuple(out)


def grids_for_robot(params: EnvParams, state: EnvState, r_dyn):
    """(cspace, cspace_thin, snap_payload) for a traced robot index.

    The per-type dilation radius is static, so we dilate once per *distinct*
    radius and select (OccupancyMap configuration space, envs.py:2452-2459).
    """
    h, w = params.map_shape
    occ = state.occupancy[r_dyn]
    rmask = geometry.room_mask(h, w, params.room_length, params.room_width)
    distinct = _distinct_radii(params)
    cspaces = [rmask & ~raster_ops.binary_dilate_disk(occ, rad) for rad in distinct]
    if len(distinct) == 1:
        cspace = cspaces[0]
    else:
        which = jnp.asarray(
            [_distinct_radii(params).index(rad) for rad in params.cspace_radii_px]
        )[r_dyn]
        cspace = jnp.select([which == k for k in range(len(distinct))], cspaces)
    thin_r = int(math.ceil(constants.ROBOT_HALF_WIDTH * constants.LOCAL_MAP_PIXELS_PER_METER))
    cspace_thin = ~raster_ops.binary_dilate_disk(occ & rmask, thin_r)
    _, snap_payload = wavefront.multi_source_distance(
        jnp.ones((h, w), bool), cspace, params.num_pass_pairs
    )
    return cspace, cspace_thin, snap_payload


# ---------------------------------------------------------------------------
# Action injection (Robot.store_new_action, envs.py:856-919)
# ---------------------------------------------------------------------------

def compute_action_target(params: EnvParams, state: EnvState, actions):
    """Decode the flat action of the acting robot into the world end-effector
    target (envs.py:856-868). Returns (has_action, acting, channel, pi, pj,
    target_ee)."""
    has_action = jnp.any(actions >= 0)
    acting = jnp.argmax(actions >= 0)
    a = jnp.maximum(actions[acting], 0)
    ch = a // (N * N)
    pi = (a // N) % N
    pj = a % N
    cur_p = state.robot_pos[acting]
    cur_h = state.robot_heading[acting]
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    dx = ((pj.astype(jnp.float32) + 0.5) - N / 2) / ppm
    dy = (N / 2 - (pi.astype(jnp.float32) + 0.5)) / ppm
    dist = jnp.sqrt(dx ** 2 + dy ** 2)
    theta = cur_h + jnp.arctan2(-dx, dy)
    target_ee = cur_p + dist * jnp.stack([jnp.cos(theta), jnp.sin(theta)])
    return has_action, acting, ch, pi, pj, target_ee


def inject_action(params: EnvParams, state: EnvState, actions, percep=None,
                  plan_dist_img=None, plan_waypoints=None) -> EnvState:
    """Store a new action for the (single) robot with actions[r] >= 0.

    If ``percep`` (a :func:`perception_pass` result computed on the same
    occupancy, with its awaiting robot == the acting robot) is provided, the
    planner reuses its configuration space and snap payload; the fused loop
    additionally passes ``plan_dist_img`` (the target-seeded distance image,
    computed batched with the Pallas kernel) and ``plan_waypoints`` (a
    ``(waypoints_px (K, 2) f32, num_wp)`` pair from the batched
    backtrace + MXU string pulling) so neither a sweep nor per-env LOS
    gathers run here.
    """
    h, w = params.map_shape
    has_action, acting, ch, pi, pj, target_ee = compute_action_target(
        params, state, actions
    )
    cur_p = state.robot_pos[acting]
    cur_h = state.robot_heading[acting]
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER

    # Snapshot available-cube positions for pushing partial rewards at the
    # start of the step (envs.py:236-240).
    avail0 = state.cube_status == CUBE_AVAILABLE
    snapshot = jnp.where(avail0[:, None], state.cube_pos[:, :2], BIG)
    state = state.replace(
        push_initial_cube_pos=jnp.where(
            has_action, snapshot, state.push_initial_cube_pos
        )
    )

    k = constants.MAX_WAYPOINTS

    if params.use_shortest_path_movement:
        if percep is not None:
            cspace = percep["cspaces"][acting]
            snap_payload = percep["snaps"][acting]
            cspace_thin = percep["cspace_thin"]
        else:
            cspace, cspace_thin, snap_payload = grids_for_robot(params, state, acting)
        si, sj = geometry.position_to_pixel(cur_p[0], cur_p[1], h, w)
        ti, tj = geometry.position_to_pixel(target_ee[0], target_ee[1], h, w)
        straight = raster_ops.line_free(
            cspace_thin, jnp.stack([si, sj]).astype(jnp.float32),
            jnp.stack([ti, tj]).astype(jnp.float32), constants.LOS_SAMPLES,
        )
        if plan_waypoints is not None:
            wps_px, num_wp_sp = plan_waypoints
        else:
            wps_px, num_wp_sp, _ = paths.plan_path_pixels(
                cspace, snap_payload, jnp.stack([si, sj]), jnp.stack([ti, tj]),
                params.num_pass_pairs, dist_img=plan_dist_img,
            )
        # Pixel waypoints -> world; endpoints replaced by the true positions
        # (envs.py:2492-2503).
        wx = ((wps_px[:, 1] + 0.5) - w / 2) / ppm
        wy = (h / 2 - (wps_px[:, 0] + 0.5)) / ppm
        wps_world = jnp.stack([wx, wy], axis=-1)
        wps_world = wps_world.at[0].set(cur_p)
        wps_world = jnp.where(
            (jnp.arange(k) == num_wp_sp - 1)[:, None], target_ee[None], wps_world
        )
        # Straight-line shortcut (envs.py:2483-2485).
        straight_wps = jnp.concatenate(
            [cur_p[None], target_ee[None], jnp.tile(target_ee[None], (k - 2, 1))]
        )
        waypoints = jnp.where(straight, straight_wps, wps_world)
        num_wp = jnp.where(straight, 2, num_wp_sp)
    else:
        waypoints = jnp.concatenate(
            [cur_p[None], target_ee[None], jnp.tile(target_ee[None], (k - 2, 1))]
        )
        num_wp = jnp.int32(2)

    # Waypoint headings (envs.py:880-884).
    seg = waypoints[1:] - waypoints[:-1]
    headings = jnp.arctan2(seg[:, 1], seg[:, 0])
    wp_headings = jnp.concatenate([cur_h[None], headings])

    # Offset the final waypoint from end-effector to robot center
    # (envs.py:886-895).
    ee_loc = jnp.asarray(params.ee_locations)[acting]
    last = num_wp - 1
    signed_dist = (
        jnp.linalg.norm(waypoints[last] - waypoints[last - 1])
        - (ee_loc + constants.CUBE_WIDTH / 2)
    )
    tgt_heading = wp_headings[last]
    tgt_pos = waypoints[last - 1] + signed_dist * jnp.stack(
        [jnp.cos(tgt_heading), jnp.sin(tgt_heading)]
    )
    waypoints = waypoints.at[last].set(tgt_pos)

    # Avoid awkward backing up (envs.py:897-902).
    backup = (num_wp > 2) & (signed_dist < 0)
    prev2 = jnp.where(backup, waypoints[last], waypoints[last - 1])
    waypoints = waypoints.at[last - 1].set(prev2)
    seg2 = prev2 - waypoints[jnp.maximum(last - 2, 0)]
    h2 = jnp.arctan2(seg2[1], seg2[0])
    wp_headings = wp_headings.at[last - 1].set(
        jnp.where(backup, h2, wp_headings[last - 1])
    )

    # Scatter per-robot fields for the acting robot.
    def sca(arr, val):
        return arr.at[acting].set(jnp.where(has_action, val, arr[acting]))

    state = state.replace(
        action=sca(state.action, jnp.stack([ch, pi, pj])),
        target_ee=sca(state.target_ee, target_ee),
        waypoints=sca(state.waypoints, waypoints),
        wp_headings=sca(state.wp_headings, wp_headings),
        num_wp=sca(state.num_wp, num_wp),
        wp_index=sca(state.wp_index, jnp.int32(1)),
        fsm=sca(state.fsm, jnp.int32(MOVING)),
        awaiting=sca(state.awaiting, jnp.bool_(False)),
        has_prev=sca(state.has_prev, jnp.bool_(False)),
        ctrl_sim_steps=sca(state.ctrl_sim_steps, jnp.int32(0)),
        consec_turn=sca(state.consec_turn, jnp.int32(0)),
        cubes=sca(state.cubes, jnp.int32(0)),
        cubes_with_reward=sca(state.cubes_with_reward, jnp.int32(0)),
        step_distance=sca(state.step_distance, jnp.float32(0)),
        prev_wp_pos=sca(state.prev_wp_pos, cur_p),
        collided_obstacle=sca(state.collided_obstacle, jnp.bool_(False)),
        collided_robot=sca(state.collided_robot, jnp.bool_(False)),
        pointless_drop=sca(state.pointless_drop, jnp.bool_(False)),
        cube_dist_closer=sca(state.cube_dist_closer, jnp.float32(0)),
        reward=sca(state.reward, jnp.float32(0)),
    )

    # Potential cube via ray test from the target pose (envs.py:1187, 1292,
    # 1352): lifting robots only when ready + channel 1; other hooks robots
    # on channel 1.
    tm = dynamics._type_masks(params)
    gate = tm["hooks"] & (state.action[:, 0] == 1) & ~(tm["lifting"] & state.lifting)
    cand = dynamics.ray_test_cubes_all(params, state)
    val = jnp.where(gate, cand, -1)
    is_acting = has_action & (jnp.arange(params.num_robots) == acting)
    state = state.replace(
        potential_cube=jnp.where(is_acting, val, state.potential_cube)
    )
    return state


# ---------------------------------------------------------------------------
# Substep loop (VectorEnv._execute_actions, envs.py:754-765)
# ---------------------------------------------------------------------------

def run_substeps(params: EnvParams, state: EnvState, n: int, refresh: bool = True) -> EnvState:
    """Run exactly ``n`` simulation substeps.  An env freezes whenever any of
    its robots is idle (the reference stops simulating between actions,
    envs.py:754-765) or its episode is done; frozen substeps are no-ops, so
    this is safe to call unconditionally in the fused trainer.  With
    ``refresh``, ends with a map refresh for still-executing robots (the
    every-200-substeps refresh, envs.py:1400-1402; the fused loop triggers it
    on its own cadence)."""

    def one(s, _):
        active = (~jnp.any(s.fsm == IDLE)) & (~s.done)
        return dynamics.substep(params, s, active), None

    state, _ = jax.lax.scan(one, state, None, length=n)
    if refresh:
        state = mid_action_map_refresh(params, state)
    return state


def mid_action_map_refresh(params: EnvParams, state: EnvState) -> EnvState:
    env_running = (~jnp.any(state.fsm == IDLE)) & (~state.done)
    return mapper.update_robot_maps(
        params, state, (state.fsm != IDLE) & env_running
    )


def run_until_idle(params: EnvParams, state: EnvState) -> EnvState:
    """Run simulation substeps until some robot is idle, in chunks of
    ``substep_chunk`` with map refreshes between chunks (approximating the
    every-200-own-sim-steps refresh, envs.py:1400-1402)."""
    chunk = params.substep_chunk

    def any_idle(s):
        return jnp.any(s.fsm == IDLE)

    def cond(carry):
        s, n = carry
        return (~any_idle(s)) & (n < params.max_substeps) & (~s.done)

    def body(carry):
        s, n = carry

        def one(s, _):
            active = ~jnp.any(s.fsm == IDLE)
            s = dynamics.substep(params, s, active)
            return s, None

        s, _ = jax.lax.scan(one, s, None, length=chunk)
        # Refresh maps for robots still executing (mid-action map updates).
        s = mapper.update_robot_maps(params, s, s.fsm != IDLE)
        return (s, n + chunk)

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return state


def set_awaiting(state: EnvState) -> EnvState:
    """_set_awaiting_new_action (envs.py:747-752): if nobody is awaiting,
    mark the first idle robot."""
    none_awaiting = ~jnp.any(state.awaiting)
    idle = state.fsm == IDLE
    first_idle = jnp.argmax(idle)
    new_awaiting = state.awaiting.at[first_idle].set(
        state.awaiting[first_idle] | (none_awaiting & jnp.any(idle))
    )
    return state.replace(awaiting=new_awaiting)


# ---------------------------------------------------------------------------
# Step-end processing
# ---------------------------------------------------------------------------

def _respawn_out_of_bounds_cubes(params: EnvParams, state: EnvState) -> EnvState:
    """envs.py:256-261: cubes on top of / inside obstacles respawn."""
    key, sub = jax.random.split(state.key)
    z = state.cube_pos[:, 2]
    bad = (state.cube_status == CUBE_AVAILABLE) & (
        (z > constants.WALL_HEIGHT + 0.49 * constants.CUBE_WIDTH)
        | (z < 0.4 * constants.CUBE_WIDTH)
    )
    tries = constants.SPAWN_REJECTION_TRIES

    def respawn(k):
        k1, k2 = jax.random.split(k)
        cand = jax.vmap(
            lambda kk: _random_position(kk, params, state.cube_bounds, constants.CUBE_WIDTH / 2)
        )(jax.random.split(k1, tries))
        ok = (
            ~dynamics.in_receptacle(params, cand)
            if params.has_receptacle
            else jnp.ones(tries, bool)
        )
        idx = jnp.argmax(ok)
        heading = jax.random.uniform(k2, (), minval=-math.pi, maxval=math.pi)
        return cand[idx], heading

    new_xy, new_h = jax.vmap(respawn)(jax.random.split(sub, params.num_cubes))
    new_pos = jnp.concatenate(
        [new_xy, jnp.full((params.num_cubes, 1), constants.CUBE_WIDTH / 2)], axis=-1
    )
    return state.replace(
        key=key,
        cube_pos=jnp.where(bad[:, None], new_pos, state.cube_pos),
        cube_heading=jnp.where(bad, new_h, state.cube_heading),
        cube_vel=jnp.where(bad[:, None], 0.0, state.cube_vel),
        # Respawned cubes skip partial-reward / scoring processing this step
        # (the reference `continue`s, envs.py:257-262).
        push_initial_cube_pos=jnp.where(bad[:, None], BIG, state.push_initial_cube_pos),
    )


def perception_pass(params: EnvParams, state: EnvState):
    """All step-boundary wavefront products in TWO vmapped sweep instances.

    Returns a dict with:
      * cspaces (R, H, W) bool — per-robot configuration spaces
      * snaps (R, H, W) int32 — nearest-valid-cell payloads (EDT replacement)
      * recep_imgs (R, H, W) float32 meters — receptacle distance images
        (present iff the env has a receptacle)
      * self_img (H, W) float32 meters — distance image seeded at the
        awaiting robot's position on its own cspace
    """
    h, w = params.map_shape
    r_n = params.num_robots
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    rmask = geometry.room_mask(h, w, params.room_length, params.room_width)
    distinct = _distinct_radii(params)
    dilated = {
        rad: jax.vmap(lambda o: raster_ops.binary_dilate_disk(o, rad))(state.occupancy)
        for rad in distinct
    }
    cspaces = jnp.stack(
        [rmask & ~dilated[params.cspace_radii_px[r]][r] for r in range(r_n)]
    )

    # One vmapped snap sweep for all robots.
    ones = jnp.ones((h, w), bool)
    _, snaps = jax.vmap(
        lambda cs: wavefront.multi_source_distance(ones, cs, params.num_pass_pairs)
    )(cspaces)

    # One vmapped distance sweep: R receptacle rows (if any) + 1 self row.
    r_awaiting = jnp.argmax(state.awaiting)
    free_rows = [cspaces] if params.has_receptacle else []
    seed_rows = []
    if params.has_receptacle:
        rx, ry = params.receptacle_position
        ri, rj = geometry.position_to_pixel(jnp.float32(rx), jnp.float32(ry), h, w)
        si, sj = jax.vmap(lambda s: wavefront.snap_to_valid(s, ri, rj))(snaps)
        seed_rows.append(jnp.stack([si, sj], axis=-1))
    pos = state.robot_pos[r_awaiting]
    pi, pj = geometry.position_to_pixel(pos[0], pos[1], h, w)
    pi, pj = wavefront.snap_to_valid(snaps[r_awaiting], pi, pj)
    free_rows.append(cspaces[r_awaiting][None])
    seed_rows.append(jnp.stack([pi, pj])[None])

    free_batch = jnp.concatenate(free_rows, axis=0)
    seed_batch = jnp.concatenate(seed_rows, axis=0)
    dists = jax.vmap(
        lambda f, s: wavefront.distance_image(f, s[0], s[1], params.num_pass_pairs)
    )(free_batch, seed_batch)

    # Thin configuration space for straight-line shortcut tests
    # (envs.py:2455), on the awaiting robot's occupancy memory — consumed by
    # the next inject_action so the planner can reuse this pass.
    thin_r = int(math.ceil(constants.ROBOT_HALF_WIDTH * constants.LOCAL_MAP_PIXELS_PER_METER))
    occ_awaiting = state.occupancy[r_awaiting]
    cspace_thin = ~raster_ops.binary_dilate_disk(occ_awaiting & rmask, thin_r)

    out = {
        "cspaces": cspaces,
        "snaps": snaps,
        "self_img": dists[-1] / ppm,
        "cspace_thin": cspace_thin,
        "awaiting": r_awaiting,
    }
    if params.has_receptacle:
        out["recep_imgs"] = dists[:r_n] / ppm
    return out


def perception_pass_batched(params: EnvParams, state_b):
    """perception_pass over a leading batch axis, with all sweeps flattened
    into TWO batched kernel calls (Pallas on TPU) instead of vmapped per-env
    scans.  state_b: EnvState with leading dim M.  Returns a percep pytree
    with leading dim M (same structure as :func:`perception_pass`)."""
    m = state_b.occupancy.shape[0]
    r_n = params.num_robots
    h, w = params.map_shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    npp = params.num_pass_pairs
    rmask = geometry.room_mask(h, w, params.room_length, params.room_width)

    occ = state_b.occupancy  # (M, R, H, W)
    distinct = _distinct_radii(params)
    dilated = {rad: raster_ops.binary_dilate_disk(occ, rad) for rad in distinct}
    cspaces = jnp.stack(
        [dilated[params.cspace_radii_px[r]][:, r] for r in range(r_n)], axis=1
    )
    cspaces = rmask & ~cspaces  # (M, R, H, W)

    # --- Snap payload sweep: flat (M*R) rows ---
    flat_cs = cspaces.reshape(m * r_n, h, w)
    idx_img = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    dist0 = jnp.where(flat_cs, 0.0, wavefront.BIG).astype(jnp.float32)
    pay0 = jnp.where(flat_cs, idx_img, 0)
    ones = jnp.ones_like(flat_cs)
    _, snaps_flat = wavefront.sweep_batched(dist0, pay0, ones, npp)
    snaps = snaps_flat.reshape(m, r_n, h, w)

    # --- Distance sweeps: R receptacle rows + 1 self row per env ---
    r_awaiting = jnp.argmax(state_b.awaiting, axis=1)  # (M,)
    menv = jnp.arange(m)
    cspace_awaiting = cspaces[menv, r_awaiting]        # (M, H, W)
    snap_awaiting = snaps[menv, r_awaiting]

    free_rows = []
    seed_rows = []
    if params.has_receptacle:
        rx, ry = params.receptacle_position
        ri, rj = geometry.position_to_pixel(jnp.float32(rx), jnp.float32(ry), h, w)
        flat_snap = snaps.reshape(m * r_n, h, w)
        si = flat_snap[:, ri, rj] // w
        sj = flat_snap[:, ri, rj] % w
        free_rows.append(flat_cs)
        seed_rows.append(jnp.stack([si, sj], axis=-1))
    pos = state_b.robot_pos[menv, r_awaiting]
    pi, pj = geometry.position_to_pixel(pos[:, 0], pos[:, 1], h, w)
    flatidx = snap_awaiting[menv, pi, pj]
    free_rows.append(cspace_awaiting)
    seed_rows.append(jnp.stack([flatidx // w, flatidx % w], axis=-1))

    free_b = jnp.concatenate(free_rows, axis=0)
    seeds = jnp.concatenate(seed_rows, axis=0)  # (K, 2)
    k = free_b.shape[0]
    krows = jnp.arange(k)
    free_b = free_b.at[krows, seeds[:, 0], seeds[:, 1]].set(True)
    dist0 = jnp.full((k, h, w), wavefront.BIG, jnp.float32)
    dist0 = dist0.at[krows, seeds[:, 0], seeds[:, 1]].set(0.0)
    pay0 = jnp.zeros((k, h, w), jnp.int32)
    dists, _ = wavefront.sweep_batched(dist0, pay0, free_b, npp)
    dists = dists / ppm

    # --- Thin cspace for the awaiting robot ---
    thin_r = int(math.ceil(constants.ROBOT_HALF_WIDTH * ppm))
    occ_awaiting = occ[menv, r_awaiting]
    cspace_thin = ~raster_ops.binary_dilate_disk(occ_awaiting & rmask, thin_r)

    out = {
        "cspaces": cspaces,
        "snaps": snaps,
        "self_img": dists[-m:],
        "cspace_thin": cspace_thin,
        "awaiting": r_awaiting,
    }
    if params.has_receptacle:
        out["recep_imgs"] = dists[: m * r_n].reshape(m, r_n, h, w)
    return out


def make_percep_cache(params: EnvParams, num_envs: int):
    """All-invalid distance-field cache for :func:`perception_pass_batched_cached`.

    The reference rebuilds its GridGraph only when the occupancy map changes
    and caches per-source SPFA results (envs.py:2459, shortest_paths.pyx:
    116-119).  This is the SPMD equivalent: per-(env, robot) configuration
    spaces, snap payloads, and receptacle distance images are carried across
    rounds and re-swept only for rows whose occupancy memory gained cells
    (occupancy is monotone, so unchanged occupancy ⇒ bit-identical fields).
    """
    h, w = params.map_shape
    r_n = params.num_robots
    cache = {
        "cspaces": jnp.zeros((num_envs, r_n, h, w), bool),
        "snaps": jnp.zeros((num_envs, r_n, h, w), jnp.int32),
        "valid": jnp.zeros((num_envs, r_n), bool),
    }
    if params.has_receptacle:
        cache["recep_imgs"] = jnp.zeros((num_envs, r_n, h, w), jnp.float32)
    return cache


def perception_pass_batched_cached(params: EnvParams, state_b, cache,
                                   budget: int):
    """:func:`perception_pass_batched` with cross-round caching.

    ``cache`` rows (leading dim M, gathered from the loop-state cache by the
    caller) carry per-(env, robot) cspaces/snaps/receptacle images plus a
    ``valid`` flag the CALLER maintains (cleared whenever that robot's
    occupancy changed).  Rows still valid are returned as-is — bit-identical
    to a recompute since occupancy is monotone — and invalid rows are
    re-dilated and re-swept in ``budget``-row passes inside a while loop
    (zero passes when everything is valid, ceil(dirty/budget) otherwise), so
    results are ALWAYS exact.  Only the per-env self distance image (seeded
    at the awaiting robot, which moves every action) is swept every call.

    Returns (percep, new_cache_rows).
    """
    m = state_b.occupancy.shape[0]
    r_n = params.num_robots
    h, w = params.map_shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    npp = params.num_pass_pairs
    rmask = geometry.room_mask(h, w, params.room_length, params.room_width)
    mr = m * r_n
    budget = min(budget, mr)
    distinct = _distinct_radii(params)
    idx_img = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    menv = jnp.arange(m)
    r_awaiting = jnp.argmax(state_b.awaiting, axis=1)  # (M,)

    if params.has_receptacle:
        rx, ry = params.receptacle_position
        ri, rj = geometry.position_to_pixel(
            jnp.float32(rx), jnp.float32(ry), h, w
        )

    def put(full, vals, rows):
        return full.reshape(mr, h, w).at[rows].set(vals).reshape(m, r_n, h, w)

    def refresh_pass(carry):
        dirty_flat = ~carry["valid"].reshape(mr)
        order = jnp.argsort(~dirty_flat, stable=True)  # dirty rows first
        rows = order[:budget]
        rrob = rows % r_n
        occ_rows = state_b.occupancy.reshape(mr, h, w)[rows]

        # Re-dilate the selected rows (one dilation per distinct radius).
        dil = [raster_ops.binary_dilate_disk(occ_rows, rad) for rad in distinct]
        if len(distinct) == 1:
            cs_rows = dil[0]
        else:
            which = jnp.asarray(
                [distinct.index(rad) for rad in params.cspace_radii_px]
            )[rrob]
            cs_rows = jnp.select(
                [which[:, None, None] == k for k in range(len(distinct))], dil
            )
        cs_rows = rmask & ~cs_rows

        # Snap sweep for the selected rows.
        dist0 = jnp.where(cs_rows, 0.0, wavefront.BIG).astype(jnp.float32)
        pay0 = jnp.where(cs_rows, idx_img, 0)
        _, snap_rows = wavefront.sweep_batched(
            dist0, pay0, jnp.ones_like(cs_rows), npp
        )

        out = {
            "cspaces": put(carry["cspaces"], cs_rows, rows),
            "snaps": put(carry["snaps"], snap_rows, rows),
            "valid": carry["valid"].reshape(mr).at[rows].set(True).reshape(
                m, r_n
            ),
        }
        if params.has_receptacle:
            rsnap = snap_rows[:, ri, rj]
            seeds = jnp.stack([rsnap // w, rsnap % w], axis=-1)
            krows = jnp.arange(budget)
            free2 = cs_rows.at[krows, seeds[:, 0], seeds[:, 1]].set(True)
            d0 = jnp.full((budget, h, w), wavefront.BIG, jnp.float32)
            d0 = d0.at[krows, seeds[:, 0], seeds[:, 1]].set(0.0)
            p0 = jnp.zeros((budget, h, w), jnp.int32)
            dists, _ = wavefront.sweep_batched(d0, p0, free2, npp)
            out["recep_imgs"] = put(carry["recep_imgs"], dists / ppm, rows)
        return out

    cache = jax.lax.while_loop(
        lambda c: jnp.any(~c["valid"]), refresh_pass, cache
    )

    # Per-env self distance image (seed moves every action: always swept).
    cs_await = cache["cspaces"][menv, r_awaiting]
    snap_await = cache["snaps"][menv, r_awaiting]
    pos = state_b.robot_pos[menv, r_awaiting]
    pi, pj = geometry.position_to_pixel(pos[:, 0], pos[:, 1], h, w)
    sflat = snap_await[menv, pi, pj]
    seeds = jnp.stack([sflat // w, sflat % w], axis=-1)
    free2 = cs_await.at[menv, seeds[:, 0], seeds[:, 1]].set(True)
    d0 = jnp.full((m, h, w), wavefront.BIG, jnp.float32)
    d0 = d0.at[menv, seeds[:, 0], seeds[:, 1]].set(0.0)
    p0 = jnp.zeros((m, h, w), jnp.int32)
    dists, _ = wavefront.sweep_batched(d0, p0, free2, npp)

    percep = {
        "cspaces": cache["cspaces"],
        "snaps": cache["snaps"],
        "self_img": dists / ppm,
        "awaiting": r_awaiting,
    }
    if params.has_receptacle:
        percep["recep_imgs"] = cache["recep_imgs"]

    # Thin cspace for the awaiting robot (uncached: small radius).
    thin_r = int(math.ceil(constants.ROBOT_HALF_WIDTH * ppm))
    occ_awaiting = state_b.occupancy[menv, r_awaiting]
    percep["cspace_thin"] = ~raster_ops.binary_dilate_disk(
        occ_awaiting & rmask, thin_r
    )
    return percep, cache


def _dist_to_receptacle_at(params, recep_imgs, snaps, r, position):
    """mapper.distance_to_receptacle (envs.py:2189-2194) for one position,
    indexing the stacked (R, H, W) percep arrays directly: a traced-robot
    slab extract (``recep_imgs[r]``) under a cube/robot vmap materializes
    (entities, H, W) temporaries — ~100 MB per service batch at the flagship
    shapes; two chained 1-element gathers replace them."""
    h, w = params.map_shape
    if params.use_shortest_path_partial_rewards:
        i, j = geometry.position_to_pixel(position[..., 0], position[..., 1], h, w)
        flat = snaps[r, i, j]
        return recep_imgs[r, flat // w, flat % w]
    rx, ry = params.receptacle_position
    return jnp.sqrt((position[..., 0] - rx) ** 2 + (position[..., 1] - ry) ** 2)


def step_end_pre(params: EnvParams, state: EnvState):
    """First half of step-end processing — everything that does NOT need
    distance images: awaiting selection, cube respawns, receptacle scoring,
    and the awaiting-robot map refresh (envs.py:249-280).

    Returns (state, ctx) where ctx carries the pre-removal cube geometry the
    reward deltas need.
    """
    state = set_awaiting(state)
    state = _respawn_out_of_bounds_cubes(params, state)

    avail = state.cube_status == CUBE_AVAILABLE
    pushing_mask = jnp.asarray(
        [constants.ROBOT_TYPES[t] == "pushing_robot" for t in params.robot_types]
    )
    cube_xy_now = state.cube_pos[:, :2]  # pre-removal positions for deltas
    closest = jnp.zeros(params.num_cubes, jnp.int32)

    if params.has_receptacle:
        # Closest robot per cube (envs.py:264-275).
        d_rc = jnp.linalg.norm(
            state.robot_pos[None, :, :] - cube_xy_now[:, None, :], axis=-1
        )  # (C, R)
        closest = jnp.argmin(d_rc, axis=1)  # (C,)

        # Receptacle scoring for pushed-in cubes (envs.py:271-275); no
        # distance images needed, so this runs before the map refresh like
        # the reference.
        in_recep = avail & dynamics.in_receptacle(params, cube_xy_now)
        scorer = closest
        score_counts = jnp.zeros(params.num_robots, jnp.int32).at[scorer].add(
            in_recep.astype(jnp.int32)
        )
        reward_counts = jnp.zeros(params.num_robots, jnp.int32).at[scorer].add(
            (in_recep & pushing_mask[scorer]).astype(jnp.int32)
        )
        state = state.replace(
            cubes=state.cubes + score_counts,
            cubes_with_reward=state.cubes_with_reward + reward_counts,
            cube_status=jnp.where(in_recep, CUBE_REMOVED, state.cube_status),
            cube_pos=jnp.where(
                in_recep[:, None], jnp.array([0.0, 0.0, -1000.0]), state.cube_pos
            ),
        )

    # Map refresh for awaiting robots (envs.py:277-280).  (The reference
    # evaluates reward deltas on the pre-refresh occupancy; since the
    # occupancy memory is monotone and refreshed every ~200 substeps anyway,
    # using the post-refresh map is an equivalent metric.)
    state = mapper.update_robot_maps(params, state, state.awaiting)

    # Episode bookkeeping (envs.py:285-294) — needs no distance images, so it
    # lives in the pre half (the fused loop gates auto-resets on `done`).
    scored_any = jnp.sum(state.cubes) > 0
    inactivity = jnp.where(scored_any, 0, state.inactivity_steps + 1)
    all_removed = jnp.all(state.cube_status == CUBE_REMOVED)
    done = all_removed | (inactivity >= params.inactivity_cutoff)
    state = state.replace(steps=state.steps + 1, inactivity_steps=inactivity, done=done)

    ctx = {"avail": avail, "cube_xy": cube_xy_now, "closest": closest}
    return state, ctx


def step_end_post(params: EnvParams, state: EnvState, ctx, percep):
    """Second half of step-end processing: distance-metric partial rewards,
    episode bookkeeping, final rewards (envs.py:285-318, 933-955)."""
    avail = ctx["avail"]
    cube_xy_now = ctx["cube_xy"]
    closest = ctx["closest"]
    pushing_mask = jnp.asarray(
        [constants.ROBOT_TYPES[t] == "pushing_robot" for t in params.robot_types]
    )

    if params.has_receptacle:
        recep_imgs, snaps = percep["recep_imgs"], percep["snaps"]

        # Pushing partial rewards (envs.py:1082-1087): delta of
        # distance-to-receptacle between the step-start snapshot and now,
        # credited to the closest robot when it's a pusher.
        eligible = avail & (state.push_initial_cube_pos[:, 0] < BIG / 2)

        def cube_delta(c):
            r = closest[c]
            d0 = _dist_to_receptacle_at(
                params, recep_imgs, snaps, r, state.push_initial_cube_pos[c]
            )
            d1 = _dist_to_receptacle_at(params, recep_imgs, snaps, r, cube_xy_now[c])
            ok = (
                eligible[c]
                & pushing_mask[r]
                & (d0 < wavefront.UNREACHABLE_THRESHOLD)
                & (d1 < wavefront.UNREACHABLE_THRESHOLD)
            )
            return jnp.where(ok, d0 - d1, 0.0), r

        deltas, owners = jax.vmap(cube_delta)(jnp.arange(params.num_cubes))
        state = state.replace(
            cube_dist_closer=state.cube_dist_closer.at[owners].add(deltas)
        )

        # Deferred lifted/thrown partial-reward pairs (envs.py:1210-1215,
        # 1331-1335).
        def robot_delta(r):
            d0 = _dist_to_receptacle_at(params, recep_imgs, snaps, r, state.pr_initial[r])
            d1 = _dist_to_receptacle_at(params, recep_imgs, snaps, r, state.pr_final[r])
            ok = (
                state.pr_pending[r]
                & (d0 < wavefront.UNREACHABLE_THRESHOLD)
                & (d1 < wavefront.UNREACHABLE_THRESHOLD)
            )
            return jnp.where(ok, d0 - d1, 0.0)

        rdeltas = jax.vmap(robot_delta)(jnp.arange(params.num_robots))
        # Robots whose segment closed this step and are still carrying start
        # the next segment at the current carried-cube position
        # (envs.py:1215).  Segments that did NOT close (a carrying robot's
        # action ended in a collision rather than at its final waypoint,
        # where the reference's _done_moving never runs) keep their baseline,
        # so the carry progress is credited when the next segment closes.
        carried = jnp.maximum(state.carried_cube, 0)
        carried_xy = state.cube_pos[carried, :2]
        closed = state.pr_pending & (state.carried_cube >= 0)
        state = state.replace(
            cube_dist_closer=state.cube_dist_closer + rdeltas,
            pr_pending=jnp.zeros_like(state.pr_pending),
            pr_initial=jnp.where(closed[:, None], carried_xy, state.pr_initial),
        )

    # Rewards for awaiting-or-done robots (envs.py:296-299, 933-955).
    done = state.done
    compute = state.awaiting | done
    # done: add the final leg of distance (envs.py:940-942).
    final_leg = jnp.linalg.norm(state.robot_pos - state.prev_wp_pos, axis=-1)
    extra_dist = jnp.where(done & (state.fsm != IDLE), final_leg, 0.0)
    step_distance = state.step_distance + extra_dist

    partial_ok = jnp.asarray(
        [
            constants.ROBOT_TYPES[t] in ("pushing_robot", "lifting_robot", "throwing_robot")
            for t in params.robot_types
        ]
    )
    is_lifting = jnp.asarray(
        [constants.ROBOT_TYPES[t] == "lifting_robot" for t in params.robot_types]
    )
    reward = (
        params.success_reward * state.cubes_with_reward
        - params.obstacle_collision_penalty * state.collided_obstacle
        - params.robot_collision_penalty * state.collided_robot
        + params.partial_rewards_scale * state.cube_dist_closer * partial_ok
        - params.lifting_pointless_drop_penalty * (state.pointless_drop & is_lifting)
    )

    state = state.replace(
        reward=jnp.where(compute, reward, state.reward),
        step_distance=jnp.where(compute, step_distance, state.step_distance),
        prev_wp_pos=jnp.where(compute[:, None], state.robot_pos, state.prev_wp_pos),
        cum_cubes=state.cum_cubes + jnp.where(compute, state.cubes, 0),
        cum_reward=state.cum_reward + jnp.where(compute, reward, 0.0),
        cum_distance=state.cum_distance + jnp.where(compute, step_distance, 0.0),
        cum_obstacle_collisions=state.cum_obstacle_collisions
        + jnp.where(compute & state.collided_obstacle, 1, 0),
        cum_robot_collisions=state.cum_robot_collisions
        + jnp.where(compute & state.collided_robot, 1, 0),
    )
    return state


def step_end(params: EnvParams, state: EnvState):
    """Full step-end processing (envs.py:249-318): pre + per-env perception
    + post.  The fused loop calls the halves directly with a batched
    perception pass between them."""
    state, ctx = step_end_pre(params, state)
    percep = perception_pass(params, state)
    state = step_end_post(params, state, ctx, percep)
    return state, percep


# ---------------------------------------------------------------------------
# Observation
# ---------------------------------------------------------------------------

def observe(params: EnvParams, state: EnvState, percep):
    """Observation stack for the awaiting robot (envs.py:322-323).

    Returns (obs (96, 96, C), robot_index, group_index).
    """
    r = jnp.argmax(state.awaiting)
    sp_recep = None
    sp_self = None
    if params.use_shortest_path_to_receptacle_map:
        sp_recep = percep["recep_imgs"][r]
    if params.use_shortest_path_map:
        sp_self = percep["self_img"]
    obs = mapper.build_state(params, state, r, sp_recep, sp_self)
    groups = jnp.asarray(params.robot_groups)
    return obs, r, groups[r]


def observe_standalone(params: EnvParams, state: EnvState):
    """Observation right after reset (env.reset returns get_state(),
    envs.py:222) — computes the distance images itself."""
    return observe(params, state, perception_pass(params, state))


def observe_standalone_with_percep(params: EnvParams, state: EnvState):
    percep = perception_pass(params, state)
    obs, robot, group = observe(params, state, percep)
    return obs, robot, group, percep


# ---------------------------------------------------------------------------
# Full step
# ---------------------------------------------------------------------------

def step(params: EnvParams, state: EnvState, actions):
    """One VectorEnv.step (envs.py:230-320).

    actions: (R,) int32 flat action index for the awaiting robot, -1 for
    everyone else.
    Returns (state, obs, obs_robot, obs_group, reward (R,), done, info dict).
    """
    state = inject_action(params, state, actions)
    state = run_until_idle(params, state)
    state, percep = step_end(params, state)
    obs, obs_robot, obs_group = observe(params, state, percep)

    compute = state.awaiting | state.done
    info = {
        "steps": state.steps,
        "simulation_steps": state.simulation_steps,
        "total_cubes": jnp.sum(state.cum_cubes),
        "total_obstacle_collisions": jnp.sum(state.cum_obstacle_collisions),
        "total_robot_collisions": jnp.sum(state.cum_robot_collisions),
        "cumulative_cubes": state.cum_cubes,
        "cumulative_distance": state.cum_distance,
        "cumulative_reward": state.cum_reward,
        "reward_mask": compute,
    }
    return state, obs, obs_robot, obs_group, state.reward, state.done, info
