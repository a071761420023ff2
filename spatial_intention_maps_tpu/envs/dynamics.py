"""Kinematic physics substep + controller FSM.

TPU-native replacement for the PyBullet hot loop (SURVEY N2).  The reference
drags robots with a fixed-constraint pose servo (envs.py:820, 985, 1459-1461)
whose calibrated effect is 1 mm translation / 3 deg rotation per simulation
step (envs.py:1369-1370 comments), so exact-parity dynamics are *kinematic*:

* each substep the body moves toward its servo target at the calibrated rate,
  blocked by obstacle/robot overlap (constraint force can't push through),
* cubes are position-projected out of robot/wall/cube overlaps (the only
  dynamic interaction that matters: pushing),
* lifted cubes ride kinematically at the hook offset (envs.py:1268-1276),
* thrown cubes integrate ballistically from the calibrated impulse
  (envs.py:1314-1329).

The controller FSM reproduces RobotController.step (envs.py:1394-1502):
turn-then-drive toward the current waypoint, stall/oscillation detection,
collision gating, waypoint advance, and the per-type manipulation dispatch
(lift/drop/throw/rescue).  Robots are processed in index order for grab
conflicts, like the reference's sequential robot list (envs.py:762-763).
"""

import math

import jax
import jax.numpy as jnp

from .. import constants
from . import geometry
from .types import (
    CUBE_AVAILABLE,
    CUBE_LIFTED,
    CUBE_REMOVED,
    CUBE_THROWN,
    IDLE,
    MANIPULATING,
    MOVING,
    EnvParams,
    EnvState,
)

ROBOT_R = constants.ROBOT_HALF_WIDTH        # capsule radius
CUBE_R = constants.CUBE_WIDTH / 2           # cube contact disc radius
_N_AXIS_SAMPLES = 7                          # capsule-axis samples for wall tests


def heading_diff(h1, h2):
    """restrict_heading_range(h2 - h1) (envs.py:2566-2570)."""
    return jnp.mod(h2 - h1 + math.pi, 2 * math.pi) - math.pi


def _dir(h):
    return jnp.stack([jnp.cos(h), jnp.sin(h)], axis=-1)


def capsule_endpoints(params: EnvParams, pos, heading):
    """(a, b): capsule axis endpoints per robot. pos (R,2), heading (R,)."""
    bo = constants.ROBOT_BACKPACK_OFFSET
    ee = jnp.asarray(params.ee_locations)
    hooks = jnp.asarray(params.has_hooks)
    front = jnp.where(hooks, ee + constants.END_EFFECTOR_THICKNESS, ee)
    d = _dir(heading)
    a = pos + bo * d
    b = pos + front[:, None] * d
    return a, b


def _point_aabb_dist(p, rects):
    """Distance from points p (..., 2) to each AABB (N, 4) -> (..., N)."""
    dx = jnp.abs(p[..., None, 0] - rects[:, 0]) - rects[:, 2]
    dy = jnp.abs(p[..., None, 1] - rects[:, 1]) - rects[:, 3]
    outside = jnp.sqrt(jnp.maximum(dx, 0.0) ** 2 + jnp.maximum(dy, 0.0) ** 2)
    inside = jnp.minimum(jnp.maximum(dx, dy), 0.0)
    return outside + inside  # signed distance


def _point_fillet_sd(p, corners):
    """Signed-distance approximation to each rounded-corner fillet
    (intersection SDF of the fillet square and disc complement)."""
    if corners.shape[0] == 0:
        return jnp.full(p.shape[:-1] + (0,), jnp.inf)
    w = constants.ROUNDED_CORNER_WIDTH
    off = w / math.sqrt(2)
    cx, cy, h = corners[:, 0], corners[:, 1], corners[:, 2]
    ax = cx - off * jnp.cos(h - math.radians(45))
    ay = cy - off * jnp.sin(h - math.radians(45))
    ccx, ccy = 2 * cx - ax, 2 * cy - ay
    dx = p[..., None, 0] - ax
    dy = p[..., None, 1] - ay
    ch, sh = jnp.cos(h), jnp.sin(h)
    lx = ch * dx + sh * dy
    ly = -sh * dx + ch * dy
    # SDF of the square [0,w] x [-w,0]
    qx = jnp.abs(lx - w / 2) - w / 2
    qy = jnp.abs(ly + w / 2) - w / 2
    sd_sq = jnp.sqrt(jnp.maximum(qx, 0) ** 2 + jnp.maximum(qy, 0) ** 2) + jnp.minimum(
        jnp.maximum(qx, qy), 0.0
    )
    # SDF of disc complement: w - |p - c|
    dcx = p[..., None, 0] - ccx
    dcy = p[..., None, 1] - ccy
    sd_dc = w - jnp.sqrt(dcx ** 2 + dcy ** 2)
    return jnp.maximum(sd_sq, sd_dc)


def robot_hits_walls(params: EnvParams, state: EnvState, pos, heading, margin=0.0):
    """(R,) bool: does each robot's capsule overlap any wall rect / fillet?"""
    a, b = capsule_endpoints(params, pos, heading)
    t = jnp.linspace(0.0, 1.0, _N_AXIS_SAMPLES)
    pts = a[:, None, :] + t[None, :, None] * (b - a)[:, None, :]  # (R, S, 2)
    sd_r = _point_aabb_dist(pts, state.rects)       # (R, S, N)
    hit = jnp.any(sd_r <= ROBOT_R + margin, axis=(1, 2))
    sd_c = _point_fillet_sd(pts, state.corners)
    hit |= jnp.any(sd_c <= ROBOT_R + margin, axis=(1, 2))
    return hit


def _seg_seg_dist(a0, a1, b0, b1):
    """Min distance between two 2D segments (sampled; segments are ~6 cm)."""
    t = jnp.linspace(0.0, 1.0, _N_AXIS_SAMPLES)
    pa = a0[None] + t[:, None] * (a1 - a0)[None]
    pb = b0[None] + t[:, None] * (b1 - b0)[None]
    d = jnp.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=-1)
    return jnp.min(d)


def robot_robot_hits(params: EnvParams, state: EnvState, pos, heading):
    """(R, R) bool symmetric: capsule-capsule overlap, plus other robots'
    carried cubes (carried cubes join the robot collision set,
    envs.py:1222-1223)."""
    r_n = params.num_robots
    a, b = capsule_endpoints(params, pos, heading)
    hits = jnp.zeros((r_n, r_n), bool)
    for i in range(r_n):
        for j in range(r_n):
            if i == j:
                continue
            d = _seg_seg_dist(a[i], b[i], a[j], b[j])
            hit = d <= 2 * ROBOT_R
            # carried cube of robot j vs capsule of robot i
            cj = state.carried_cube[j]
            has_cube = cj >= 0
            cube_p = state.cube_pos[jnp.maximum(cj, 0), :2]
            t = jnp.linspace(0.0, 1.0, _N_AXIS_SAMPLES)
            pts = a[i][None] + t[:, None] * (b[i] - a[i])[None]
            dcube = jnp.min(jnp.linalg.norm(pts - cube_p[None], axis=-1))
            hit |= has_cube & (dcube <= ROBOT_R + CUBE_R)
            hits = hits.at[i, j].set(hit)
    return hits


# ---------------------------------------------------------------------------
# Physics substep
# ---------------------------------------------------------------------------

def physics_substep(params: EnvParams, state: EnvState, active) -> EnvState:
    """One p.stepSimulation() equivalent (envs.py:332-335), gated by
    ``active`` (scalar bool: env still executing actions this step)."""
    r_n = params.num_robots

    # --- Robot servo motion toward (target_pos, target_heading) ---
    delta = state.target_pos - state.robot_pos
    dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    step = jnp.minimum(dist, constants.DRIVE_SPEED_PER_SIM_STEP)
    new_pos = state.robot_pos + jnp.where(dist > 1e-9, delta / jnp.maximum(dist, 1e-9) * step, 0.0)

    hd = heading_diff(state.robot_heading, state.target_heading)
    turn = jnp.clip(hd, -constants.TURN_SPEED_PER_SIM_STEP, constants.TURN_SPEED_PER_SIM_STEP)
    new_heading = state.robot_heading + turn

    # Block translation on obstacle / robot overlap (constraint maxForce can't
    # push through; contact is what check_for_collisions would report).
    wall_hit = robot_hits_walls(params, state, new_pos, new_heading)
    rr_hits = robot_robot_hits(params, state, new_pos, new_heading)
    robot_hit = jnp.any(rr_hits, axis=1)
    blocked = wall_hit | robot_hit
    moving_mask = (state.fsm == MOVING) & active
    new_pos = jnp.where((blocked | ~moving_mask)[:, None], state.robot_pos, new_pos)
    new_heading = jnp.where(moving_mask, new_heading, state.robot_heading)

    # Contact flags: the mover and (symmetrically) the robot it ran into.
    blocked_obstacle = wall_hit & moving_mask
    blocked_robot = (robot_hit & moving_mask) | jnp.any(
        rr_hits & moving_mask[:, None], axis=0
    )

    # --- Cube dynamics ---
    cube_pos = state.cube_pos
    cube_vel = state.cube_vel
    avail = state.cube_status == CUBE_AVAILABLE

    # 1) Robots push available cubes (disc vs capsule projection).
    a, b = capsule_endpoints(params, new_pos, new_heading)
    p2 = cube_pos[:, :2]
    t = jnp.linspace(0.0, 1.0, _N_AXIS_SAMPLES)
    axis_pts = a[:, None, :] + t[None, :, None] * (b - a)[:, None, :]   # (R, S, 2)
    dvec = p2[:, None, None, :] - axis_pts[None]                        # (C, R, S, 2)
    dd = jnp.linalg.norm(dvec, axis=-1)                                 # (C, R, S)
    k = jnp.argmin(dd.reshape(dd.shape[0], -1), axis=1)                 # closest axis pt
    dmin = jnp.min(dd.reshape(dd.shape[0], -1), axis=1)
    closest_vec = dvec.reshape(dd.shape[0], -1, 2)[jnp.arange(p2.shape[0]), k]
    pen = (ROBOT_R + CUBE_R) - dmin
    push_dir = closest_vec / jnp.maximum(dmin, 1e-9)[:, None]
    do_push = (pen > 0) & avail & active
    p2 = p2 + jnp.where(do_push[:, None], push_dir * pen[:, None], 0.0)

    # 2) Cube-cube separation (both available).
    diff = p2[:, None, :] - p2[None, :, :]
    dc = jnp.linalg.norm(diff, axis=-1)
    pair_ok = avail[:, None] & avail[None, :] & ~jnp.eye(p2.shape[0], dtype=bool)
    pen_cc = jnp.maximum(2 * CUBE_R * 0.9 - dc, 0.0) * pair_ok
    dir_cc = diff / jnp.maximum(dc, 1e-9)[..., None]
    p2 = p2 + jnp.where(active, 0.5, 0.0) * jnp.sum(pen_cc[..., None] * dir_cc, axis=1)

    # 3) Project cubes out of walls.
    sd_walls = _point_aabb_dist(p2, state.rects)            # (C, N)
    nearest = jnp.argmin(sd_walls, axis=1)
    sd_min = jnp.min(sd_walls, axis=1)
    pen_w = jnp.maximum(CUBE_R - sd_min, 0.0)
    # Gradient of AABB signed distance: push along the dominant axis.
    rect = state.rects[nearest]
    ddx = p2[:, 0] - rect[:, 0]
    ddy = p2[:, 1] - rect[:, 1]
    ox = jnp.abs(ddx) - rect[:, 2]
    oy = jnp.abs(ddy) - rect[:, 3]
    push_x = jnp.where(ox >= oy, jnp.sign(ddx), 0.0)
    push_y = jnp.where(oy > ox, jnp.sign(ddy), 0.0)
    grad = jnp.stack([push_x, push_y], axis=-1)
    p2 = p2 + jnp.where((avail & active & (pen_w > 0))[:, None], grad * pen_w[:, None], 0.0)
    # Fillets: push toward the arc center.
    if state.corners.shape[0] > 0:
        sd_f = _point_fillet_sd(p2, state.corners)
        nf = jnp.argmin(sd_f, axis=1)
        sdf_min = jnp.min(sd_f, axis=1)
        pen_f = jnp.maximum(CUBE_R - sdf_min, 0.0)
        w = constants.ROUNDED_CORNER_WIDTH
        off = w / math.sqrt(2)
        cn = state.corners[nf]
        axp = cn[:, 0] - off * jnp.cos(cn[:, 2] - math.radians(45))
        ayp = cn[:, 1] - off * jnp.sin(cn[:, 2] - math.radians(45))
        ccx, ccy = 2 * cn[:, 0] - axp, 2 * cn[:, 1] - ayp
        to_c = jnp.stack([ccx, ccy], axis=-1) - p2
        to_c = to_c / jnp.maximum(jnp.linalg.norm(to_c, axis=-1, keepdims=True), 1e-9)
        p2 = p2 + jnp.where((avail & active & (pen_f > 0))[:, None], to_c * pen_f[:, None], 0.0)

    cube_pos = cube_pos.at[:, :2].set(jnp.where(avail[:, None], p2, cube_pos[:, :2]))

    # 4) Carried cubes ride at the hook offset (envs.py:1268-1276).
    for r in range(r_n):
        c = state.carried_cube[r]
        has = c >= 0
        ci = jnp.maximum(c, 0)
        ee = params.ee_locations[r]
        offset = ee + constants.LIFTED_CUBE_OFFSET + CUBE_R
        cp = jnp.concatenate([
            new_pos[r] + offset * _dir(new_heading[r]),
            jnp.array([constants.LIFTED_CUBE_HEIGHT + CUBE_R]),
        ])
        cube_pos = cube_pos.at[ci].set(jnp.where(has & active, cp, cube_pos[ci]))

    # 5) Ballistic integration for thrown cubes (envs.py:1314-1329).
    thrown = (state.cube_status == CUBE_THROWN) & active
    dt = constants.SIM_DT
    vel = cube_vel + jnp.where(
        thrown[:, None], jnp.array([0.0, 0.0, -constants.GRAVITY * dt]), 0.0
    )
    pos3 = cube_pos + jnp.where(thrown[:, None], vel * dt, 0.0)
    # Ground / obstacle-top contact: rest height depends on the cell below.
    h, w = params.map_shape
    gi, gj = geometry.position_to_pixel(pos3[:, 0], pos3[:, 1], h, w)
    on_wall = state.wall_map[gi, gj]
    rest_z = jnp.where(on_wall, constants.WALL_HEIGHT + CUBE_R, CUBE_R)
    landed = thrown & (pos3[:, 2] <= rest_z) & (vel[:, 2] < 0)
    pos3 = pos3.at[:, 2].set(jnp.where(landed, rest_z, pos3[:, 2]))
    vel = jnp.where(
        landed[:, None], vel * jnp.array([0.3, 0.3, 0.0]), vel
    )  # friction kills slide quickly
    cube_pos = jnp.where(thrown[:, None], pos3, cube_pos)
    cube_vel = jnp.where(thrown[:, None], vel, cube_vel)

    return state.replace(
        robot_pos=new_pos,
        robot_heading=new_heading,
        blocked_obstacle=blocked_obstacle,
        blocked_robot=blocked_robot,
        cube_pos=cube_pos,
        cube_vel=cube_vel,
        simulation_steps=state.simulation_steps + jnp.where(active, 1, 0),
    )


# ---------------------------------------------------------------------------
# Ray test (RobotWithHooks.ray_test_cube, envs.py:1110-1126)
# ---------------------------------------------------------------------------

def ray_test_cube(params: EnvParams, state: EnvState, r):
    """First body hit by a CUBE_WIDTH-long ray from the target end-effector
    position along the target heading; returns cube index or -1."""
    k = state.num_wp[r] - 1
    tgt = state.waypoints[r, k]
    th = state.wp_headings[r, k]
    ee = params.ee_locations[r]
    d = _dir(th)
    p0 = tgt + ee * d
    p1 = p0 + constants.END_EFFECTOR_DIST_THRESHOLD * d

    # Cube hits: segment vs axis-aligned square in each cube's frame.
    def cube_t(c):
        cp = state.cube_pos[c, :2]
        chd = state.cube_heading[c]
        ch, sh = jnp.cos(chd), jnp.sin(chd)
        rot = jnp.array([[ch, sh], [-sh, ch]])
        q0 = rot @ (p0 - cp)
        q1 = rot @ (p1 - cp)
        dq = q1 - q0
        half = CUBE_R
        # slab test
        inv = 1.0 / jnp.where(jnp.abs(dq) < 1e-12, 1e-12, dq)
        t0 = (-half - q0) * inv
        t1 = (half - q0) * inv
        tmin = jnp.max(jnp.minimum(t0, t1))
        tmax = jnp.min(jnp.maximum(t0, t1))
        valid = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= 1.0)
        t_hit = jnp.where(tmin >= 0.0, tmin, 0.0)
        avail = state.cube_status[c] == CUBE_AVAILABLE
        return jnp.where(valid & avail, t_hit, jnp.inf)

    ts = jax.vmap(cube_t)(jnp.arange(params.num_cubes))

    # Wall hits block the ray (rayTestBatch returns the first body).
    t = jnp.linspace(0.0, 1.0, 16)
    pts = p0[None] + t[:, None] * (p1 - p0)[None]
    sd = _point_aabb_dist(pts, state.rects)
    wall_ts = jnp.where(jnp.any(sd <= 0.0, axis=1), t, jnp.inf)
    t_wall = jnp.min(wall_ts)

    c_best = jnp.argmin(ts)
    t_best = ts[c_best]
    found = (t_best < jnp.inf) & (t_best <= t_wall)
    return jnp.where(found, c_best, -1)


# ---------------------------------------------------------------------------
# Manipulation primitives
# ---------------------------------------------------------------------------

def _remove_cube(state: EnvState, c):
    """envs.py:348-350: teleport far below and mark removed."""
    pos = jnp.array([0.0, 0.0, -1000.0])
    return state.replace(
        cube_pos=state.cube_pos.at[c].set(pos),
        cube_status=state.cube_status.at[c].set(CUBE_REMOVED),
    )


def in_receptacle(params: EnvParams, cube_xy):
    """cube_position_in_receptacle (envs.py:352-361): top-right corner
    semantics."""
    if not params.has_receptacle:
        return jnp.bool_(False)
    rx, ry = params.receptacle_position
    half = (constants.RECEPTACLE_WIDTH - constants.CUBE_WIDTH) / 2
    return (cube_xy[..., 0] > rx - half) & (cube_xy[..., 1] > ry - half)


# ---------------------------------------------------------------------------
# Controller FSM (RobotController.step, envs.py:1394-1502)
# ---------------------------------------------------------------------------

def _update_distance(state: EnvState, r, cur_p, pred):
    """Robot.update_distance (envs.py:1001-1010), gated by pred."""
    d = jnp.linalg.norm(cur_p - state.prev_wp_pos[r])
    return state.replace(
        step_distance=state.step_distance.at[r].add(jnp.where(pred, d, 0.0)),
        prev_wp_pos=state.prev_wp_pos.at[r].set(
            jnp.where(pred, cur_p, state.prev_wp_pos[r])
        ),
    )


def _lift_cube(params: EnvParams, state: EnvState, r, c, pred):
    """LiftingRobot.lift_cube (envs.py:1217-1234), gated."""
    ci = jnp.maximum(c, 0)
    ee = params.ee_locations[r]
    offset = ee + constants.LIFTED_CUBE_OFFSET + CUBE_R
    lifted = jnp.concatenate([
        state.robot_pos[r] + offset * _dir(state.robot_heading[r]),
        jnp.array([constants.LIFTED_CUBE_HEIGHT + CUBE_R]),
    ])
    return state.replace(
        carried_cube=state.carried_cube.at[r].set(jnp.where(pred, ci, state.carried_cube[r])),
        lifting=state.lifting.at[r].set(jnp.where(pred, True, state.lifting[r])),
        cube_status=state.cube_status.at[ci].set(
            jnp.where(pred, CUBE_LIFTED, state.cube_status[ci])
        ),
        cube_pos=state.cube_pos.at[ci].set(jnp.where(pred, lifted, state.cube_pos[ci])),
        cube_heading=state.cube_heading.at[ci].set(
            jnp.where(pred, state.robot_heading[r], state.cube_heading[ci])
        ),
        pr_initial=state.pr_initial.at[r].set(
            jnp.where(pred, state.cube_pos[ci, :2], state.pr_initial[r])
        ),
    )


def _drop_cube(params: EnvParams, state: EnvState, r, pred):
    """LiftingRobot.drop_cube (envs.py:1236-1266), gated."""
    c = jnp.maximum(state.carried_cube[r], 0)
    cur_p = state.robot_pos[r]
    cur_h = state.robot_heading[r]
    ee = params.ee_locations[r]
    offset = ee + constants.END_EFFECTOR_THICKNESS + CUBE_R
    drop_xy = cur_p + offset * _dir(cur_h)
    success = in_receptacle(params, drop_xy)

    # Partial-reward pair: carried position at drop time.
    state = state.replace(
        pr_final=state.pr_final.at[r].set(
            jnp.where(pred, state.cube_pos[c, :2], state.pr_final[r])
        ),
        pr_pending=state.pr_pending.at[r].set(state.pr_pending[r] | pred),
    )

    new_status = jnp.where(success, CUBE_REMOVED, CUBE_AVAILABLE)
    new_pos = jnp.where(
        success,
        jnp.array([0.0, 0.0, -1000.0]),
        jnp.concatenate([drop_xy, jnp.array([CUBE_R])]),
    )
    state = state.replace(
        cube_status=state.cube_status.at[c].set(
            jnp.where(pred, new_status, state.cube_status[c])
        ),
        cube_pos=state.cube_pos.at[c].set(jnp.where(pred, new_pos, state.cube_pos[c])),
        cube_heading=state.cube_heading.at[c].set(
            jnp.where(pred, cur_h, state.cube_heading[c])
        ),
        cubes=state.cubes.at[r].add(jnp.where(pred & success, 1, 0)),
        cubes_with_reward=state.cubes_with_reward.at[r].add(jnp.where(pred & success, 1, 0)),
        pointless_drop=state.pointless_drop.at[r].set(
            state.pointless_drop[r] | (pred & ~success)
        ),
        lifting=state.lifting.at[r].set(jnp.where(pred, False, state.lifting[r])),
        carried_cube=state.carried_cube.at[r].set(
            jnp.where(pred, -1, state.carried_cube[r])
        ),
    )
    return state


def _throw_cube(params: EnvParams, state: EnvState, r, c, pred):
    """ThrowingRobot.prepare_throw_cube + throw_cube (envs.py:1306-1329)."""
    ci = jnp.maximum(c, 0)
    key, k1, k2, k3 = jax.random.split(state.key, 4)
    fx = constants.THROW_FORCE_X_MEAN + constants.THROW_FORCE_X_STD * jax.random.normal(k1)
    fy = constants.THROW_FORCE_Y_MEAN + constants.THROW_FORCE_Y_STD * jax.random.normal(k2)
    fy = fy * jnp.where(jax.random.uniform(k3) < 0.5, -1.0, 1.0)
    kvel = constants.THROW_IMPULSE_TO_VELOCITY
    cur_p = state.robot_pos[r]
    cur_h = state.robot_heading[r]
    ch, sh = jnp.cos(cur_h), jnp.sin(cur_h)
    # LINK_FRAME force (-fx, -fy, 0) rotated to world.
    v = jnp.array([(-fx) * ch - (-fy) * sh, (-fx) * sh + (-fy) * ch, 0.0]) * kvel
    back = jnp.concatenate([
        cur_p + constants.ROBOT_BACKPACK_OFFSET * _dir(cur_h),
        jnp.array([constants.ROBOT_HEIGHT + constants.CUBE_WIDTH]),
    ])
    return state.replace(
        key=jnp.where(pred, key, state.key),
        carried_cube=state.carried_cube.at[r].set(jnp.where(pred, ci, state.carried_cube[r])),
        cube_status=state.cube_status.at[ci].set(
            jnp.where(pred, CUBE_THROWN, state.cube_status[ci])
        ),
        cube_pos=state.cube_pos.at[ci].set(jnp.where(pred, back, state.cube_pos[ci])),
        cube_heading=state.cube_heading.at[ci].set(
            jnp.where(pred, cur_h, state.cube_heading[ci])
        ),
        cube_vel=state.cube_vel.at[ci].set(jnp.where(pred, v, state.cube_vel[ci])),
        pr_initial=state.pr_initial.at[r].set(
            jnp.where(pred, state.cube_pos[ci, :2], state.pr_initial[r])
        ),
    )


def _finish_throw(params: EnvParams, state: EnvState, r, pred):
    """ThrowingRobot.finish_throw_cube (envs.py:1331-1343)."""
    c = jnp.maximum(state.carried_cube[r], 0)
    cube_xy = state.cube_pos[c, :2]
    success = in_receptacle(params, cube_xy)
    new_status = jnp.where(success, CUBE_REMOVED, CUBE_AVAILABLE)
    new_pos = jnp.where(
        success, jnp.array([0.0, 0.0, -1000.0]),
        state.cube_pos[c].at[2].set(jnp.maximum(state.cube_pos[c, 2], CUBE_R)),
    )
    return state.replace(
        pr_final=state.pr_final.at[r].set(jnp.where(pred, cube_xy, state.pr_final[r])),
        pr_pending=state.pr_pending.at[r].set(state.pr_pending[r] | pred),
        cube_status=state.cube_status.at[c].set(
            jnp.where(pred, new_status, state.cube_status[c])
        ),
        cube_pos=state.cube_pos.at[c].set(jnp.where(pred, new_pos, state.cube_pos[c])),
        cube_vel=state.cube_vel.at[c].set(
            jnp.where(pred, jnp.zeros(3), state.cube_vel[c])
        ),
        cubes=state.cubes.at[r].add(jnp.where(pred & success, 1, 0)),
        cubes_with_reward=state.cubes_with_reward.at[r].add(jnp.where(pred & success, 1, 0)),
        carried_cube=state.carried_cube.at[r].set(jnp.where(pred, -1, state.carried_cube[r])),
    )


def _rescue_cube(params: EnvParams, state: EnvState, r, c, pred):
    """RescueRobot.rescue_cube (envs.py:1358-1366)."""
    ci = jnp.maximum(c, 0)
    return state.replace(
        cube_status=state.cube_status.at[ci].set(
            jnp.where(pred, CUBE_REMOVED, state.cube_status[ci])
        ),
        cube_pos=state.cube_pos.at[ci].set(
            jnp.where(pred, jnp.array([0.0, 0.0, -1000.0]), state.cube_pos[ci])
        ),
        cubes=state.cubes.at[r].add(jnp.where(pred, 1, 0)),
        cubes_with_reward=state.cubes_with_reward.at[r].add(jnp.where(pred, 1, 0)),
    )


def _done_moving(params: EnvParams, state: EnvState, r, pred):
    """RobotController._done_moving (envs.py:1480-1502).

    Sets fsm to IDLE or MANIPULATING and performs the per-type manipulation.
    ``r`` is a static int so the type dispatch is Python-level.
    """
    typ = params.robot_types[r]
    typ_name = constants.ROBOT_TYPES[typ]
    cur_p = state.robot_pos[r]

    state = state.replace(
        fsm=state.fsm.at[r].set(jnp.where(pred, IDLE, state.fsm[r]))
    )

    if typ_name == "lifting_robot":
        carrying = state.lifting[r]
        drop = pred & carrying & (state.action[r, 0] == 1)
        keep = pred & carrying & (state.action[r, 0] != 1)
        state = _drop_cube(params, state, r, drop)
        state = state.replace(
            fsm=state.fsm.at[r].set(jnp.where(drop, MANIPULATING, state.fsm[r])),
            manip_target=state.manip_target.at[r].set(
                jnp.where(drop, constants.MANIPULATION_STEPS_DROP, state.manip_target[r])
            ),
            manip_steps=state.manip_steps.at[r].set(
                jnp.where(drop, 0, state.manip_steps[r])
            ),
        )
        # Keep carrying: close a partial-reward segment at the action end
        # (process_lifted_cube_position, envs.py:1488).
        c = jnp.maximum(state.carried_cube[r], 0)
        state = state.replace(
            pr_final=state.pr_final.at[r].set(
                jnp.where(keep, state.cube_pos[c, :2], state.pr_final[r])
            ),
            pr_pending=state.pr_pending.at[r].set(state.pr_pending[r] | keep),
        )
        # Ready state: try to grab.
        near = (
            jnp.linalg.norm(cur_p - state.waypoints[r, state.num_wp[r] - 1])
            < constants.DRIVE_STEP_SIZE
        )
        try_grab = pred & ~carrying & (state.potential_cube[r] >= 0) & near
        c_found = ray_test_cube(params, state, r)
        state = _lift_cube(params, state, r, c_found, try_grab & (c_found >= 0))

    elif typ_name == "throwing_robot":
        near = (
            jnp.linalg.norm(cur_p - state.waypoints[r, state.num_wp[r] - 1])
            < constants.DRIVE_STEP_SIZE
        )
        try_grab = pred & (state.potential_cube[r] >= 0) & near
        c_found = ray_test_cube(params, state, r)
        do = try_grab & (c_found >= 0)
        state = _throw_cube(params, state, r, c_found, do)
        state = state.replace(
            fsm=state.fsm.at[r].set(jnp.where(do, MANIPULATING, state.fsm[r])),
            manip_target=state.manip_target.at[r].set(
                jnp.where(do, constants.MANIPULATION_STEPS_THROW, state.manip_target[r])
            ),
            manip_steps=state.manip_steps.at[r].set(jnp.where(do, 0, state.manip_steps[r])),
        )

    elif typ_name == "rescue_robot":
        near = (
            jnp.linalg.norm(cur_p - state.waypoints[r, state.num_wp[r] - 1])
            < constants.DRIVE_STEP_SIZE
        )
        try_grab = pred & (state.potential_cube[r] >= 0) & near
        c_found = ray_test_cube(params, state, r)
        state = _rescue_cube(params, state, r, c_found, try_grab & (c_found >= 0))

    # pushing_robot: nothing to do (1-channel, no end effector).
    return state


def controller_substep(params: EnvParams, state: EnvState, active) -> EnvState:
    """One controller tick for every robot (robots processed in index order
    like the reference's flat robot list, envs.py:762-763)."""
    for r in range(params.num_robots):
        act = active & (state.fsm[r] != IDLE)
        state = state.replace(
            ctrl_sim_steps=state.ctrl_sim_steps.at[r].add(jnp.where(act, 1, 0))
        )

        # ---------------- MOVING ----------------
        mov = act & (state.fsm[r] == MOVING)
        cur_p = state.robot_pos[r]
        cur_h = state.robot_heading[r]
        hp = state.has_prev[r]

        driving = jnp.linalg.norm(cur_p - state.prev_pos[r]) > constants.NOT_MOVING_POS_EPS
        turning = (
            jnp.abs(heading_diff(state.prev_heading[r], cur_h))
            > constants.NOT_MOVING_HEADING_EPS
        )
        consec = jnp.where(turning, state.consec_turn[r] + 1, 0)
        state = state.replace(
            consec_turn=state.consec_turn.at[r].set(
                jnp.where(mov & hp, consec, state.consec_turn[r])
            )
        )
        stuck = consec > constants.STUCK_OSCILLATING_STEPS
        not_moving = ((~driving) & (~turning)) | stuck

        # Collision check gating (envs.py:1418-1419)
        far_from_start = (
            jnp.linalg.norm(cur_p - state.waypoints[r, 0]) > constants.DRIVE_STEP_SIZE
        )
        check = mov & hp & (far_from_start | not_moving)
        state = state.replace(
            collided_obstacle=state.collided_obstacle.at[r].set(
                state.collided_obstacle[r] | (check & state.blocked_obstacle[r])
            ),
            collided_robot=state.collided_robot.at[r].set(
                state.collided_robot[r] | (check & state.blocked_robot[r])
            ),
        )

        step_limit = state.ctrl_sim_steps[r] > constants.STEP_LIMIT_SIM_STEPS
        go_idle = mov & hp & (
            state.collided_obstacle[r] | state.collided_robot[r] | step_limit
        )
        state = _update_distance(state, r, cur_p, go_idle)
        state = state.replace(fsm=state.fsm.at[r].set(jnp.where(go_idle, IDLE, state.fsm[r])))

        reached = mov & hp & ~go_idle & not_moving
        state = _update_distance(state, r, cur_p, reached)
        last_wp = state.wp_index[r] == state.num_wp[r] - 1
        dm = reached & last_wp
        advance = reached & ~last_wp
        state = state.replace(
            wp_index=state.wp_index.at[r].add(jnp.where(advance, 1, 0))
        )
        state = _done_moving(params, state, r, dm)

        # If still moving, retarget the servo (envs.py:1437-1461).
        still = mov & (state.fsm[r] == MOVING)
        wp_i = state.wp_index[r]
        wp = state.waypoints[r, wp_i]
        hd = heading_diff(cur_h, state.wp_headings[r, wp_i])
        turn_mode = jnp.abs(hd) > constants.TURN_STEP_SIZE
        t_heading_turn = cur_h + jnp.sign(hd) * constants.TURN_STEP_SIZE

        dxy = wp - cur_p
        near_wp = jnp.linalg.norm(dxy) < constants.DRIVE_STEP_SIZE
        ms = jnp.sign(
            jnp.linalg.norm(cur_p - state.target_ee[r])
            - (params.ee_locations[r] + constants.CUBE_WIDTH / 2)
        )
        ms = jnp.where(ms == 0, 1.0, ms)
        nh = jnp.arctan2(ms * dxy[1], ms * dxy[0])
        drive_pos = cur_p + ms * constants.DRIVE_STEP_SIZE * _dir(nh)
        t_pos = jnp.where(turn_mode, cur_p, jnp.where(near_wp, wp, drive_pos))
        t_heading = jnp.where(turn_mode, t_heading_turn, jnp.where(near_wp, cur_h, nh))
        state = state.replace(
            target_pos=state.target_pos.at[r].set(
                jnp.where(still, t_pos, state.target_pos[r])
            ),
            target_heading=state.target_heading.at[r].set(
                jnp.where(still, t_heading, state.target_heading[r])
            ),
            prev_pos=state.prev_pos.at[r].set(jnp.where(mov, cur_p, state.prev_pos[r])),
            prev_heading=state.prev_heading.at[r].set(
                jnp.where(mov, cur_h, state.prev_heading[r])
            ),
            has_prev=state.has_prev.at[r].set(state.has_prev[r] | mov),
        )

        # ---------------- MANIPULATING ----------------
        man = act & (state.fsm[r] == MANIPULATING)
        msteps = state.manip_steps[r] + 1
        fin = man & (msteps >= state.manip_target[r])
        state = state.replace(
            manip_steps=state.manip_steps.at[r].set(
                jnp.where(fin, 0, jnp.where(man, msteps, state.manip_steps[r]))
            ),
            manip_target=state.manip_target.at[r].set(
                jnp.where(fin, 0, state.manip_target[r])
            ),
        )
        if constants.ROBOT_TYPES[params.robot_types[r]] == "throwing_robot":
            state = _finish_throw(params, state, r, fin)
        state = state.replace(fsm=state.fsm.at[r].set(jnp.where(fin, IDLE, state.fsm[r])))

    return state


def substep(params: EnvParams, state: EnvState, active) -> EnvState:
    """step_simulation + per-robot controller tick (envs.py:754-765)."""
    state = physics_substep(params, state, active)
    state = controller_substep(params, state, active)
    return state
