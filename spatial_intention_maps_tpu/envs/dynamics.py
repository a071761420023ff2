"""Kinematic physics substep + controller FSM, fully vectorized over robots.

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
(lift/drop/throw/rescue).  Everything is masked vector math over the robot
axis; the only ordering the reference's sequential robot loop
(envs.py:762-763) can expose is two robots grabbing the same cube in the same
substep, resolved here by lowest-robot-index priority.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

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
_N_AXIS_SAMPLES = 7                          # capsule-axis samples
_REMOVED_POS = jnp.array([0.0, 0.0, -1000.0])


def heading_diff(h1, h2):
    """restrict_heading_range(h2 - h1) (envs.py:2566-2570)."""
    return jnp.mod(h2 - h1 + math.pi, 2 * math.pi) - math.pi


# ---------------------------------------------------------------------------
# Counter-based throw-noise RNG (reference envs.py:1306-1313 distributions).
#
# The reference draws np.random.normal throw forces at throw time.  Here the
# draw must be computable inside the Pallas substep kernel, where the
# threefry PRNG behind jax.random cannot run — so throw noise comes from a
# murmur3-style integer hash of (episode seed, robot index, per-robot throw
# counter), turned into normals via Box-Muller.  Both engines (the lax.scan
# path below and ops/pallas_substep) call these same functions, so their
# trajectories stay bit-identical.
# ---------------------------------------------------------------------------

# murmur3 finalizer multipliers as wrapped int32 literals
_MIX_M1 = np.int32(np.uint32(0x85EBCA6B).astype(np.int32))
_MIX_M2 = np.int32(np.uint32(0xC2B2AE35).astype(np.int32))
_TWO_PI = 2.0 * math.pi


def _mix32(h):
    """murmur3 fmix32 on int32 (two's-complement wrap == uint32 wrap)."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * _MIX_M1
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * _MIX_M2
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _hash_uniform(h):
    """int32 hash -> float32 uniform in (0, 1) (23 mantissa bits, never 0)."""
    bits = h & jnp.int32(0x7FFFFF)
    return (bits.astype(jnp.float32) + 0.5) * jnp.float32(1.0 / (1 << 23))


def throw_draws(seed, counter, robot_index):
    """Throw-force samples (fx, fy) for each robot.

    seed: int32 episode seed (broadcastable); counter: int32 per-robot throw
    counter; robot_index: int32 per-robot index.  All broadcast together.
    fx ~ N(THROW_FORCE_X_MEAN, THROW_FORCE_X_STD); fy ~ N(Y_MEAN, Y_STD)
    with a random sign flip — the reference's throw_cube draw
    (envs.py:1306-1313).
    """
    base = _mix32(_mix32(_mix32(seed) ^ counter) ^ robot_index)
    u1 = _hash_uniform(_mix32(base ^ jnp.int32(0x1B56C4E9)))
    u2 = _hash_uniform(_mix32(base ^ jnp.int32(0x2545F491)))
    u3 = _hash_uniform(_mix32(base ^ jnp.int32(0x68E31DA4)))
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    z0 = rad * jnp.cos(_TWO_PI * u2)
    z1 = rad * jnp.sin(_TWO_PI * u2)
    fx = constants.THROW_FORCE_X_MEAN + constants.THROW_FORCE_X_STD * z0
    fy = constants.THROW_FORCE_Y_MEAN + constants.THROW_FORCE_Y_STD * z1
    fy = fy * jnp.where(u3 < 0.5, -1.0, 1.0)
    return fx, fy


def _dir(h):
    return jnp.stack([jnp.cos(h), jnp.sin(h)], axis=-1)


def _has_type(params: EnvParams, name: str) -> bool:
    """Static robot-type presence test (python bool, prunes whole blocks)."""
    return any(constants.ROBOT_TYPES[t] == name for t in params.robot_types)


def _type_masks(params: EnvParams):
    names = [constants.ROBOT_TYPES[t] for t in params.robot_types]
    m = lambda n: jnp.asarray([x == n for x in names])
    return {
        "lifting": m("lifting_robot"),
        "pushing": m("pushing_robot"),
        "throwing": m("throwing_robot"),
        "rescue": m("rescue_robot"),
        "hooks": jnp.asarray([constants.ROBOT_HAS_HOOKS[x] for x in names]),
    }


def capsule_endpoints(params: EnvParams, pos, heading):
    """(a, b): capsule axis endpoints per robot. pos (R,2), heading (R,).

    The capsule (radius ROBOT_R) approximates the backpack cylinder + base
    box (envs.py:1019-1040).  The axis ends ROBOT_R short of the physical
    front so the end cap terminates AT the front face — otherwise the cap
    would bulge 3 cm past the blade and push cubes early / hit walls early.
    """
    bo = constants.ROBOT_BACKPACK_OFFSET
    ee = jnp.asarray(params.ee_locations)
    hooks = jnp.asarray(params.has_hooks)
    front = jnp.where(hooks, ee + constants.END_EFFECTOR_THICKNESS, ee)
    d = _dir(heading)
    a = pos + bo * d
    b = pos + jnp.maximum(front - ROBOT_R, bo)[:, None] * d
    return a, b


def _capsule_points(params, pos, heading):
    a, b = capsule_endpoints(params, pos, heading)
    t = jnp.linspace(0.0, 1.0, _N_AXIS_SAMPLES)
    return a[:, None, :] + t[None, :, None] * (b - a)[:, None, :]  # (R, S, 2)


def _point_aabb_dist(p, rects):
    """Signed distance from points p (..., 2) to each AABB (N, 4) -> (..., N)."""
    dx = jnp.abs(p[..., None, 0] - rects[:, 0]) - rects[:, 2]
    dy = jnp.abs(p[..., None, 1] - rects[:, 1]) - rects[:, 3]
    outside = jnp.sqrt(jnp.maximum(dx, 0.0) ** 2 + jnp.maximum(dy, 0.0) ** 2)
    inside = jnp.minimum(jnp.maximum(dx, dy), 0.0)
    return outside + inside


def _point_fillet_sd(p, corners):
    """Signed-distance approximation to each rounded-corner fillet
    (intersection SDF of the fillet square and the disc complement)."""
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
    qx = jnp.abs(lx - w / 2) - w / 2
    qy = jnp.abs(ly + w / 2) - w / 2
    sd_sq = jnp.sqrt(jnp.maximum(qx, 0) ** 2 + jnp.maximum(qy, 0) ** 2) + jnp.minimum(
        jnp.maximum(qx, qy), 0.0
    )
    dcx = p[..., None, 0] - ccx
    dcy = p[..., None, 1] - ccy
    sd_dc = w - jnp.sqrt(dcx ** 2 + dcy ** 2)
    return jnp.maximum(sd_sq, sd_dc)


def robot_hits_walls(params: EnvParams, state: EnvState, pos, heading):
    """(R,) bool: capsule overlap with any wall rect / corner fillet."""
    pts = _capsule_points(params, pos, heading)  # (R, S, 2)
    hit = jnp.any(_point_aabb_dist(pts, state.rects) <= ROBOT_R, axis=(1, 2))
    hit |= jnp.any(_point_fillet_sd(pts, state.corners) <= ROBOT_R, axis=(1, 2))
    return hit


def robot_robot_hits(params: EnvParams, state: EnvState, pos, heading):
    """(R, R) bool: capsule-capsule overlap (i hits j), plus robot j's
    carried cube vs robot i's capsule (carried cubes join the robot
    collision set, envs.py:1222-1223)."""
    return robot_robot_contacts(params, state, pos, heading)[0]


def robot_robot_contacts(params: EnvParams, state: EnvState, pos, heading):
    """(hits (R, R) bool, clearance (R, R) float): overlap flags plus the
    margin-to-contact per pair (min capsule-capsule distance minus 2R, or
    capsule-to-carried-cube distance minus R+CUBE_R, whichever is tighter).
    The clearance picks the deepest contact for the tangential slide."""
    r_n = params.num_robots
    pts = _capsule_points(params, pos, heading)  # (R, S, 2)
    d = jnp.linalg.norm(
        pts[:, None, :, None, :] - pts[None, :, None, :, :], axis=-1
    )  # (R, R, S, S)
    clear = jnp.min(d, axis=(2, 3)) - 2 * ROBOT_R
    carried = state.carried_cube
    has = carried >= 0
    cube_p = state.cube_pos[jnp.maximum(carried, 0), :2]  # (R, 2)
    dc = jnp.linalg.norm(pts[:, None, :, :] - cube_p[None, :, None, :], axis=-1)
    clear_c = jnp.min(dc, axis=2) - (ROBOT_R + CUBE_R)
    clear = jnp.minimum(clear, jnp.where(has[None, :], clear_c, jnp.inf))
    clear = jnp.where(jnp.eye(r_n, dtype=bool), jnp.inf, clear)
    return clear <= 0.0, clear


# ---------------------------------------------------------------------------
# Physics substep
# ---------------------------------------------------------------------------

def physics_substep(params: EnvParams, state: EnvState, active) -> EnvState:
    """One p.stepSimulation() equivalent (envs.py:332-335), gated by
    ``active`` (scalar bool: env still executing actions this step)."""
    c_n = params.num_cubes

    # --- Robot servo motion toward (target_pos, target_heading) ---
    delta = state.target_pos - state.robot_pos
    dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    step = jnp.minimum(dist, constants.DRIVE_SPEED_PER_SIM_STEP)
    new_pos = state.robot_pos + jnp.where(
        dist > 1e-9, delta / jnp.maximum(dist, 1e-9) * step, 0.0
    )
    hd = heading_diff(state.robot_heading, state.target_heading)
    turn = jnp.clip(hd, -constants.TURN_SPEED_PER_SIM_STEP, constants.TURN_SPEED_PER_SIM_STEP)
    new_heading = state.robot_heading + turn

    # Block translation on obstacle overlap; robot-robot contact SLIDES.
    # The reference's constraint-servo robots slide along each other under
    # PyBullet contact resolution rather than freeze (envs.py:1459-1461);
    # a hard block exaggerates no-coordination interference (VERDICT r3).
    # Contact tests evaluate every robot at its EFFECTIVE candidate pose
    # (frozen robots stay put; their stale servo target is not a phantom).
    moving_mask = (state.fsm == MOVING) & active
    cand = jnp.where(moving_mask[:, None], new_pos, state.robot_pos)
    cand_h = jnp.where(moving_mask, new_heading, state.robot_heading)
    wall_hit = robot_hits_walls(params, state, cand, cand_h)
    rr_hits, clearance = robot_robot_contacts(params, state, cand, cand_h)
    robot_hit = jnp.any(rr_hits, axis=1)

    # Tangential slide: drop the servo step's approach component toward the
    # deepest contact.  Relative motion orthogonal to the separation vector
    # can only grow the pair distance, so no robot-robot recheck is needed;
    # the slid pose is re-tested against walls only.
    v = cand - state.robot_pos                                   # (R, 2)
    j_star = jnp.argmin(jnp.where(rr_hits, clearance, jnp.inf), axis=1)
    n_vec = cand - cand[j_star]
    n_hat = n_vec / jnp.maximum(
        jnp.linalg.norm(n_vec, axis=-1, keepdims=True), 1e-9
    )
    appr = jnp.minimum(jnp.sum(v * n_hat, axis=-1), 0.0)         # (R,)
    slid = state.robot_pos + (v - appr[:, None] * n_hat)
    slide_ok = ~robot_hits_walls(params, state, slid, cand_h)
    do_slide = robot_hit & ~wall_hit & moving_mask & slide_ok

    blocked = wall_hit | (robot_hit & ~do_slide)
    new_pos = jnp.where((blocked | ~moving_mask)[:, None], state.robot_pos, cand)
    new_pos = jnp.where(do_slide[:, None], slid, new_pos)
    new_heading = jnp.where(moving_mask, new_heading, state.robot_heading)

    # Contact flags: the mover and (symmetrically) the robot it ran into
    # (actual-touch semantics like getContactPoints; sliding robots in
    # contact still register, so collision aborts fire as in the reference).
    blocked_obstacle = wall_hit & moving_mask
    blocked_robot = (robot_hit & moving_mask) | jnp.any(
        rr_hits & moving_mask[:, None], axis=0
    )

    # --- Cube dynamics ---
    cube_pos = state.cube_pos
    cube_vel = state.cube_vel
    cube_heading = state.cube_heading
    avail = state.cube_status == CUBE_AVAILABLE

    # 1) Robots push available cubes.  The front face acts as a FLAT blade
    # (the reference robots push with a flat front, envs.py:1059): cubes
    # within the blade's lateral span are pushed straight along the robot's
    # heading; other contacts fall back to radial capsule projection.
    axis_pts = _capsule_points(params, new_pos, new_heading)  # (R, S, 2)
    p2 = cube_pos[:, :2]
    rdir = _dir(new_heading)                                   # (R, 2)
    rel = p2[:, None, :] - new_pos[None]                       # (C, R, 2)
    fwd = jnp.einsum("crk,rk->cr", rel, rdir)
    lat = rel[..., 0] * (-rdir[:, 1])[None] + rel[..., 1] * rdir[:, 0][None]
    ee = jnp.asarray(params.ee_locations)
    hooks = jnp.asarray(params.has_hooks)
    front = jnp.where(hooks, ee + constants.END_EFFECTOR_THICKNESS, ee)  # (R,)
    in_face = (
        (jnp.abs(lat) <= constants.ROBOT_HALF_WIDTH)
        & (fwd > 0)
        & (fwd <= front[None] + CUBE_R)
    )
    pen_face = jnp.where(in_face, front[None] + CUBE_R - fwd, -jnp.inf)  # (C, R)

    dvec = p2[:, None, None, :] - axis_pts[None]              # (C, R, S, 2)
    dd = jnp.linalg.norm(dvec, axis=-1)                        # (C, R, S)
    s_best = jnp.argmin(dd, axis=2)                            # (C, R)
    d_axis = jnp.min(dd, axis=2)
    pen_rad = (ROBOT_R + CUBE_R) - d_axis                      # (C, R)
    rad_vec = jnp.take_along_axis(dvec, s_best[..., None, None], axis=2)[:, :, 0]
    rad_dir = rad_vec / jnp.maximum(d_axis, 1e-9)[..., None]   # (C, R, 2)

    use_face = pen_face > 0
    pen_cr = jnp.where(use_face, pen_face, pen_rad)            # (C, R)
    dir_cr = jnp.where(
        use_face[..., None], jnp.broadcast_to(rdir[None], rad_dir.shape), rad_dir
    )
    r_best = jnp.argmax(pen_cr, axis=1)                        # (C,)
    pen = jnp.take_along_axis(pen_cr, r_best[:, None], axis=1)[:, 0]
    push_dir = jnp.take_along_axis(dir_cr, r_best[:, None, None], axis=1)[:, 0]
    do_push = (pen > 0) & avail & active
    p2 = p2 + jnp.where(do_push[:, None], push_dir * pen[:, None], 0.0)

    # 2) Cube-cube separation (both available).
    diff = p2[:, None, :] - p2[None, :, :]
    dc = jnp.linalg.norm(diff, axis=-1)
    pair_ok = avail[:, None] & avail[None, :] & ~jnp.eye(c_n, dtype=bool)
    pen_cc = jnp.maximum(2 * CUBE_R * 0.9 - dc, 0.0) * pair_ok
    dir_cc = diff / jnp.maximum(dc, 1e-9)[..., None]
    p2 = p2 + jnp.where(active, 0.5, 0.0) * jnp.sum(pen_cc[..., None] * dir_cc, axis=1)

    # 3) Project cubes out of walls (dominant-axis AABB gradient).
    sd_walls = _point_aabb_dist(p2, state.rects)
    nearest = jnp.argmin(sd_walls, axis=1)
    sd_min = jnp.min(sd_walls, axis=1)
    pen_w = jnp.maximum(CUBE_R - sd_min, 0.0)
    rect = state.rects[nearest]
    ddx = p2[:, 0] - rect[:, 0]
    ddy = p2[:, 1] - rect[:, 1]
    ox = jnp.abs(ddx) - rect[:, 2]
    oy = jnp.abs(ddy) - rect[:, 3]
    grad = jnp.stack(
        [jnp.where(ox >= oy, jnp.sign(ddx), 0.0), jnp.where(oy > ox, jnp.sign(ddy), 0.0)],
        axis=-1,
    )
    p2 = p2 + jnp.where((avail & active & (pen_w > 0))[:, None], grad * pen_w[:, None], 0.0)
    # Fillets: push toward the arc center (the only exit direction).
    if state.corners.shape[0] > 0:
        sd_f = _point_fillet_sd(p2, state.corners)
        nf = jnp.argmin(sd_f, axis=1)
        pen_f = jnp.maximum(CUBE_R - jnp.min(sd_f, axis=1), 0.0)
        w = constants.ROUNDED_CORNER_WIDTH
        off = w / math.sqrt(2)
        cn = state.corners[nf]
        axp = cn[:, 0] - off * jnp.cos(cn[:, 2] - math.radians(45))
        ayp = cn[:, 1] - off * jnp.sin(cn[:, 2] - math.radians(45))
        to_c = jnp.stack([2 * cn[:, 0] - axp, 2 * cn[:, 1] - ayp], axis=-1) - p2
        to_c = to_c / jnp.maximum(jnp.linalg.norm(to_c, axis=-1, keepdims=True), 1e-9)
        p2 = p2 + jnp.where(
            (avail & active & (pen_f > 0))[:, None], to_c * pen_f[:, None], 0.0
        )

    cube_pos = cube_pos.at[:, :2].set(jnp.where(avail[:, None], p2, cube_pos[:, :2]))

    # 4) LIFTED cubes ride at the hook offset (envs.py:1268-1276).  Status
    # gating matters: throwing robots also hold their cube id in
    # carried_cube during the manipulation window, but a THROWN cube is a
    # free ballistic body, not a constraint rider.
    if _has_type(params, "lifting_robot"):
        carried = state.carried_cube
        has_carry = (
            (carried >= 0)
            & active
            & (state.cube_status[jnp.maximum(carried, 0)] == CUBE_LIFTED)
        )
        c_idx = jnp.where(has_carry, carried, c_n)  # out-of-range rows dropped
        offset = jnp.asarray(params.ee_locations) + constants.LIFTED_CUBE_OFFSET + CUBE_R
        cp = jnp.concatenate(
            [
                new_pos + offset[:, None] * _dir(new_heading),
                jnp.full((params.num_robots, 1), constants.LIFTED_CUBE_HEIGHT + CUBE_R),
            ],
            axis=-1,
        )
        cube_pos = cube_pos.at[c_idx].set(cp, mode="drop")
        cube_heading = cube_heading.at[c_idx].set(new_heading, mode="drop")

    # 5) Ballistic integration for thrown cubes (envs.py:1314-1329).  Gated
    # statically: only throwing robots set CUBE_THROWN, and the landing test
    # is the one map gather in the substep loop.
    if _has_type(params, "throwing_robot"):
        thrown = (state.cube_status == CUBE_THROWN) & active
        dt = constants.SIM_DT
        vel = cube_vel + jnp.where(
            thrown[:, None], jnp.array([0.0, 0.0, -constants.GRAVITY * dt]), 0.0
        )
        pos3 = cube_pos + jnp.where(thrown[:, None], vel * dt, 0.0)
        # Landing-surface test: the wall map is rects_mask | corners_mask
        # rasterized at pixel centers (geometry.rasterize_layout), so
        # snapping the cube to its pixel center and running the analytic
        # point test reproduces the raster lookup bit-for-bit — without the
        # per-substep map gather the Pallas kernel cannot express.
        h, w = params.map_shape
        gi, gj = geometry.position_to_pixel(pos3[:, 0], pos3[:, 1], h, w)
        cx, cy = geometry.pixel_to_position(gi, gj, h, w)
        on_wall = geometry.rects_mask(cx, cy, state.rects) | geometry.corners_mask(
            cx, cy, state.corners
        )
        rest_z = jnp.where(on_wall, constants.WALL_HEIGHT + CUBE_R, CUBE_R)
        landed = thrown & (pos3[:, 2] <= rest_z) & (vel[:, 2] < 0)
        pos3 = pos3.at[:, 2].set(jnp.where(landed, rest_z, pos3[:, 2]))
        vel = jnp.where(landed[:, None], vel * jnp.array([0.3, 0.3, 0.0]), vel)
        cube_pos = jnp.where(thrown[:, None], pos3, cube_pos)
        cube_vel = jnp.where(thrown[:, None], vel, cube_vel)

    return state.replace(
        robot_pos=new_pos,
        robot_heading=new_heading,
        blocked_obstacle=blocked_obstacle,
        blocked_robot=blocked_robot,
        cube_pos=cube_pos,
        cube_vel=cube_vel,
        cube_heading=cube_heading,
        simulation_steps=state.simulation_steps + jnp.where(active, 1, 0),
    )


# ---------------------------------------------------------------------------
# Ray test (RobotWithHooks.ray_test_cube, envs.py:1110-1126), all robots
# ---------------------------------------------------------------------------

def ray_test_cubes_all(params: EnvParams, state: EnvState):
    """(R,) int32: first available cube hit by each robot's CUBE_WIDTH-long
    end-effector ray from the TARGET pose (waypoints[-1], wp_headings[-1]),
    -1 if none (or a wall is hit first)."""
    r_n, c_n = params.num_robots, params.num_cubes
    ridx = jnp.arange(r_n)
    last = state.num_wp - 1
    tgt = state.waypoints[ridx, last]       # (R, 2)
    th = state.wp_headings[ridx, last]      # (R,)
    ee = jnp.asarray(params.ee_locations)
    d = _dir(th)
    p0 = tgt + ee[:, None] * d
    p1 = p0 + constants.END_EFFECTOR_DIST_THRESHOLD * d

    # Slab test of each ray against each cube's rotated square.
    cube_xy = state.cube_pos[:, :2]
    ch, sh = jnp.cos(state.cube_heading), jnp.sin(state.cube_heading)  # (C,)
    rel0 = p0[:, None, :] - cube_xy[None]   # (R, C, 2)
    rel1 = p1[:, None, :] - cube_xy[None]
    q0 = jnp.stack(
        [ch * rel0[..., 0] + sh * rel0[..., 1], -sh * rel0[..., 0] + ch * rel0[..., 1]],
        axis=-1,
    )
    q1 = jnp.stack(
        [ch * rel1[..., 0] + sh * rel1[..., 1], -sh * rel1[..., 0] + ch * rel1[..., 1]],
        axis=-1,
    )
    dq = q1 - q0
    inv = 1.0 / jnp.where(jnp.abs(dq) < 1e-12, 1e-12, dq)
    t0 = (-CUBE_R - q0) * inv
    t1 = (CUBE_R - q0) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)   # (R, C)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    avail = (state.cube_status == CUBE_AVAILABLE)[None, :]
    valid = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= 1.0) & avail
    ts = jnp.where(valid, jnp.maximum(tmin, 0.0), jnp.inf)  # (R, C)

    # Walls block the ray (rayTestBatch returns the first body).
    t = jnp.linspace(0.0, 1.0, 16)
    pts = p0[:, None, :] + t[None, :, None] * (p1 - p0)[:, None, :]  # (R, 16, 2)
    wall_hit = jnp.any(_point_aabb_dist(pts, state.rects) <= 0.0, axis=2)  # (R, 16)
    wall_ts = jnp.where(wall_hit, t[None, :], jnp.inf)
    t_wall = jnp.min(wall_ts, axis=1)  # (R,)

    c_best = jnp.argmin(ts, axis=1)
    t_best = jnp.min(ts, axis=1)
    found = (t_best < jnp.inf) & (t_best <= t_wall)
    return jnp.where(found, c_best, -1)


def in_receptacle(params: EnvParams, cube_xy):
    """cube_position_in_receptacle (envs.py:352-361): top-right corner
    semantics."""
    if not params.has_receptacle:
        return jnp.zeros(cube_xy.shape[:-1], bool)
    rx, ry = params.receptacle_position
    half = (constants.RECEPTACLE_WIDTH - constants.CUBE_WIDTH) / 2
    return (cube_xy[..., 0] > rx - half) & (cube_xy[..., 1] > ry - half)


# ---------------------------------------------------------------------------
# Controller FSM (RobotController.step, envs.py:1394-1502), vectorized
# ---------------------------------------------------------------------------

def _scatter_cube(arr, c_idx, mask, values, c_n):
    idx = jnp.where(mask, c_idx, c_n)
    return arr.at[idx].set(values, mode="drop")


def controller_substep(params: EnvParams, state: EnvState, active) -> EnvState:
    r_n, c_n = params.num_robots, params.num_cubes
    ridx = jnp.arange(r_n)
    tm = _type_masks(params)
    ee = jnp.asarray(params.ee_locations)

    act = active & (state.fsm != IDLE)
    ctrl_sim_steps = state.ctrl_sim_steps + act.astype(jnp.int32)
    state = state.replace(ctrl_sim_steps=ctrl_sim_steps)

    # ---------------- MOVING ----------------
    mov = act & (state.fsm == MOVING)
    cur_p = state.robot_pos
    cur_h = state.robot_heading
    hp = state.has_prev

    driving = jnp.linalg.norm(cur_p - state.prev_pos, axis=-1) > constants.NOT_MOVING_POS_EPS
    turning = jnp.abs(heading_diff(state.prev_heading, cur_h)) > constants.NOT_MOVING_HEADING_EPS
    consec = jnp.where(turning, state.consec_turn + 1, 0)
    state = state.replace(consec_turn=jnp.where(mov & hp, consec, state.consec_turn))
    stuck = consec > constants.STUCK_OSCILLATING_STEPS
    not_moving = ((~driving) & (~turning)) | stuck

    # Collision check gating (envs.py:1418-1419).
    far_from_start = (
        jnp.linalg.norm(cur_p - state.waypoints[:, 0], axis=-1) > constants.DRIVE_STEP_SIZE
    )
    check = mov & hp & (far_from_start | not_moving)
    collided_obstacle = state.collided_obstacle | (check & state.blocked_obstacle)
    collided_robot = state.collided_robot | (check & state.blocked_robot)
    state = state.replace(
        collided_obstacle=collided_obstacle, collided_robot=collided_robot
    )

    step_limit = ctrl_sim_steps > constants.STEP_LIMIT_SIM_STEPS
    go_idle = mov & hp & (collided_obstacle | collided_robot | step_limit)
    reached = mov & hp & ~go_idle & not_moving

    # update_distance (envs.py:1001-1010) on both exits.
    upd = go_idle | reached
    leg = jnp.linalg.norm(cur_p - state.prev_wp_pos, axis=-1)
    state = state.replace(
        step_distance=state.step_distance + jnp.where(upd, leg, 0.0),
        prev_wp_pos=jnp.where(upd[:, None], cur_p, state.prev_wp_pos),
        fsm=jnp.where(go_idle, IDLE, state.fsm),
    )

    last_wp = state.wp_index == state.num_wp - 1
    dm = reached & last_wp
    state = state.replace(
        wp_index=state.wp_index + (reached & ~last_wp).astype(jnp.int32)
    )

    # ---------------- _done_moving dispatch (envs.py:1480-1502) ----------
    state = state.replace(fsm=jnp.where(dm, IDLE, state.fsm))

    # Per-type manipulation blocks are statically pruned when the team has
    # no robot of that type (they cannot fire, and the substep loop runs
    # thousands of times per action).
    has_lifting = _has_type(params, "lifting_robot")
    has_throwing = _has_type(params, "throwing_robot")
    has_rescue = _has_type(params, "rescue_robot")
    has_hooks = has_lifting or has_throwing or has_rescue

    # Lifting robots carrying a cube: drop (action channel 1) or keep.
    carrying = state.lifting
    carried = jnp.maximum(state.carried_cube, 0)
    if has_lifting:
        drop = dm & tm["lifting"] & carrying & (state.action[:, 0] == 1)
        keep = dm & tm["lifting"] & carrying & (state.action[:, 0] != 1)
        carried_xy = state.cube_pos[carried, :2]

        # Partial-reward segment closes at drop/keep with the carried
        # position (envs.py:1210-1215, 1236-1239).
        close_pr = drop | keep
        state = state.replace(
            pr_final=jnp.where(close_pr[:, None], carried_xy, state.pr_final),
            pr_pending=state.pr_pending | close_pr,
        )

        # drop_cube (envs.py:1236-1266): place ahead, score or mark pointless.
        drop_offset = ee + constants.END_EFFECTOR_THICKNESS + CUBE_R
        drop_xy = cur_p + drop_offset[:, None] * _dir(cur_h)
        success = in_receptacle(params, drop_xy)
        new_status = jnp.where(success, CUBE_REMOVED, CUBE_AVAILABLE)
        placed = jnp.concatenate([drop_xy, jnp.full((r_n, 1), CUBE_R)], axis=-1)
        new_cpos = jnp.where(success[:, None], _REMOVED_POS, placed)
        state = state.replace(
            cube_status=_scatter_cube(state.cube_status, carried, drop, new_status, c_n),
            cube_pos=_scatter_cube(state.cube_pos, carried, drop, new_cpos, c_n),
            cube_heading=_scatter_cube(state.cube_heading, carried, drop, cur_h, c_n),
            cubes=state.cubes + (drop & success).astype(jnp.int32),
            cubes_with_reward=state.cubes_with_reward + (drop & success).astype(jnp.int32),
            pointless_drop=state.pointless_drop | (drop & ~success),
            lifting=jnp.where(drop, False, state.lifting),
            carried_cube=jnp.where(drop, -1, state.carried_cube),
            fsm=jnp.where(drop, MANIPULATING, state.fsm),
            manip_target=jnp.where(drop, constants.MANIPULATION_STEPS_DROP, state.manip_target),
            manip_steps=jnp.where(drop, 0, state.manip_steps),
        )

    if has_hooks:
        # Grab attempts (hooks robots at their final waypoint with a
        # candidate, envs.py:1489-1502).  Lowest robot index wins a
        # contested cube.
        near = (
            jnp.linalg.norm(cur_p - state.waypoints[ridx, state.num_wp - 1], axis=-1)
            < constants.DRIVE_STEP_SIZE
        )
        try_grab = dm & tm["hooks"] & ~(tm["lifting"] & carrying) & (
            state.potential_cube >= 0
        ) & near
        cand = ray_test_cubes_all(params, state)
        want = try_grab & (cand >= 0)
        same = (cand[:, None] == cand[None, :]) & want[:, None] & want[None, :]
        loses = jnp.any(same & jnp.tril(jnp.ones((r_n, r_n), bool), -1), axis=1)
        win = want & ~loses
        cand_xy = state.cube_pos[jnp.maximum(cand, 0), :2]

    if has_lifting:
        # lift_cube (envs.py:1217-1234)
        lift = win & tm["lifting"]
        lifted_offset = ee + constants.LIFTED_CUBE_OFFSET + CUBE_R
        lifted_pos = jnp.concatenate(
            [
                cur_p + lifted_offset[:, None] * _dir(cur_h),
                jnp.full((r_n, 1), constants.LIFTED_CUBE_HEIGHT + CUBE_R),
            ],
            axis=-1,
        )
        state = state.replace(
            carried_cube=jnp.where(lift, cand, state.carried_cube),
            lifting=state.lifting | lift,
            cube_status=_scatter_cube(
                state.cube_status, jnp.maximum(cand, 0), lift,
                jnp.full((r_n,), CUBE_LIFTED), c_n,
            ),
            cube_pos=_scatter_cube(state.cube_pos, jnp.maximum(cand, 0), lift, lifted_pos, c_n),
            cube_heading=_scatter_cube(state.cube_heading, jnp.maximum(cand, 0), lift, cur_h, c_n),
            pr_initial=jnp.where(lift[:, None], cand_xy, state.pr_initial),
        )

    if has_throwing:
        # prepare_throw + throw_cube (envs.py:1306-1329); noise from the
        # counter-based hash RNG (kernel-computable, see throw_draws)
        throw = win & tm["throwing"]
        fx, fy = throw_draws(
            state.throw_seed, state.throw_counter, jnp.arange(r_n, dtype=jnp.int32)
        )
        kvel = constants.THROW_IMPULSE_TO_VELOCITY
        ch, sh = jnp.cos(cur_h), jnp.sin(cur_h)
        v = jnp.stack(
            [(-fx) * ch - (-fy) * sh, (-fx) * sh + (-fy) * ch, jnp.zeros(r_n)], axis=-1
        ) * kvel
        back = jnp.concatenate(
            [
                cur_p + constants.ROBOT_BACKPACK_OFFSET * _dir(cur_h),
                jnp.full((r_n, 1), constants.ROBOT_HEIGHT + constants.CUBE_WIDTH),
            ],
            axis=-1,
        )
        state = state.replace(
            throw_counter=state.throw_counter + throw.astype(jnp.int32),
            carried_cube=jnp.where(throw, cand, state.carried_cube),
            cube_status=_scatter_cube(
                state.cube_status, jnp.maximum(cand, 0), throw,
                jnp.full((r_n,), CUBE_THROWN), c_n,
            ),
            cube_pos=_scatter_cube(state.cube_pos, jnp.maximum(cand, 0), throw, back, c_n),
            cube_heading=_scatter_cube(state.cube_heading, jnp.maximum(cand, 0), throw, cur_h, c_n),
            cube_vel=_scatter_cube(state.cube_vel, jnp.maximum(cand, 0), throw, v, c_n),
            pr_initial=jnp.where(throw[:, None], cand_xy, state.pr_initial),
            fsm=jnp.where(throw, MANIPULATING, state.fsm),
            manip_target=jnp.where(
                throw, constants.MANIPULATION_STEPS_THROW, state.manip_target
            ),
            manip_steps=jnp.where(throw, 0, state.manip_steps),
        )

    if has_rescue:
        # rescue_cube (envs.py:1358-1366): immediate removal + score.
        rescue = win & tm["rescue"]
        state = state.replace(
            cube_status=_scatter_cube(
                state.cube_status, jnp.maximum(cand, 0), rescue,
                jnp.full((r_n,), CUBE_REMOVED), c_n,
            ),
            cube_pos=_scatter_cube(
                state.cube_pos, jnp.maximum(cand, 0), rescue,
                jnp.tile(_REMOVED_POS[None], (r_n, 1)), c_n,
            ),
            cubes=state.cubes + rescue.astype(jnp.int32),
            cubes_with_reward=state.cubes_with_reward + rescue.astype(jnp.int32),
        )

    # ---------------- servo retarget (envs.py:1437-1461) -----------------
    still = mov & (state.fsm == MOVING)
    wp = state.waypoints[ridx, state.wp_index]
    hdw = heading_diff(cur_h, state.wp_headings[ridx, state.wp_index])
    turn_mode = jnp.abs(hdw) > constants.TURN_STEP_SIZE
    t_heading_turn = cur_h + jnp.sign(hdw) * constants.TURN_STEP_SIZE
    dxy = wp - cur_p
    near_wp = jnp.linalg.norm(dxy, axis=-1) < constants.DRIVE_STEP_SIZE
    ms = jnp.sign(
        jnp.linalg.norm(cur_p - state.target_ee, axis=-1)
        - (ee + constants.CUBE_WIDTH / 2)
    )
    ms = jnp.where(ms == 0, 1.0, ms)
    nh = jnp.arctan2(ms * dxy[:, 1], ms * dxy[:, 0])
    drive_pos = cur_p + (ms * constants.DRIVE_STEP_SIZE)[:, None] * _dir(nh)
    t_pos = jnp.where(
        turn_mode[:, None], cur_p, jnp.where(near_wp[:, None], wp, drive_pos)
    )
    t_heading = jnp.where(turn_mode, t_heading_turn, jnp.where(near_wp, cur_h, nh))
    state = state.replace(
        target_pos=jnp.where(still[:, None], t_pos, state.target_pos),
        target_heading=jnp.where(still, t_heading, state.target_heading),
        prev_pos=jnp.where(mov[:, None], cur_p, state.prev_pos),
        prev_heading=jnp.where(mov, cur_h, state.prev_heading),
        has_prev=state.has_prev | mov,
    )

    # ---------------- MANIPULATING (envs.py:1465-1472) -------------------
    man = act & (state.fsm == MANIPULATING)
    msteps = jnp.where(man, state.manip_steps + 1, state.manip_steps)
    fin = man & (msteps >= state.manip_target)
    state = state.replace(
        manip_steps=jnp.where(fin, 0, msteps),
        manip_target=jnp.where(fin, 0, state.manip_target),
    )

    if has_throwing:
        # finish_throw_cube (envs.py:1331-1343)
        fin_throw = fin & tm["throwing"]
        c2 = jnp.maximum(state.carried_cube, 0)
        cube_xy2 = state.cube_pos[c2, :2]
        succ2 = in_receptacle(params, cube_xy2)
        st2 = jnp.where(succ2, CUBE_REMOVED, CUBE_AVAILABLE)
        landed_pos = state.cube_pos[c2].at[:, 2].set(
            jnp.maximum(state.cube_pos[c2, 2], CUBE_R)
        )
        pos2 = jnp.where(succ2[:, None], _REMOVED_POS, landed_pos)
        state = state.replace(
            pr_final=jnp.where(fin_throw[:, None], cube_xy2, state.pr_final),
            pr_pending=state.pr_pending | fin_throw,
            cube_status=_scatter_cube(state.cube_status, c2, fin_throw, st2, c_n),
            cube_pos=_scatter_cube(state.cube_pos, c2, fin_throw, pos2, c_n),
            cube_vel=_scatter_cube(state.cube_vel, c2, fin_throw, jnp.zeros((r_n, 3)), c_n),
            cubes=state.cubes + (fin_throw & succ2).astype(jnp.int32),
            cubes_with_reward=state.cubes_with_reward
            + (fin_throw & succ2).astype(jnp.int32),
            carried_cube=jnp.where(fin_throw, -1, state.carried_cube),
        )
    state = state.replace(fsm=jnp.where(fin, IDLE, state.fsm))
    return state


def substep(params: EnvParams, state: EnvState, active) -> EnvState:
    """step_simulation + controller ticks (envs.py:754-765)."""
    state = physics_substep(params, state, active)
    state = controller_substep(params, state, active)
    return state
