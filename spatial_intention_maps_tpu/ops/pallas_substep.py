"""Lane-major Pallas kernel for the simulation substep scan.

The fused round advances every env by ``substeps_per_round`` simulation
substeps (`env.run_substeps`, the p.stepSimulation hot loop of the
reference, envs.py:332-335, 754-765).  As a ``lax.scan`` of
``dynamics.substep`` this is dispatch-bound: each substep is ~300 tiny
(B, R)/(B, C)-shaped VPU ops, each paying XLA's fixed per-op cost, and the
scan runs 64 sequential iterations — the substep phase alone was ~92 ms per
round at B=512 (PERF.md).  This kernel runs the ENTIRE substep loop as one
Pallas program: the batch rides the 128-wide lane dimension, every state
field lives in VMEM for all 64 iterations, and the per-op overhead
disappears into straight-line VPU code.

Semantics: bit-equivalent to ``dynamics.substep`` (physics_substep +
controller_substep) for every robot team.  Throwing works in-kernel because
both engines share the gather-free landing test (analytic point-in-layout at
the cube's pixel center) and the counter-hash throw RNG
(dynamics.throw_draws) instead of wall-map lookups + threefry.  All
reference behaviors are cited in dynamics.py; this file only re-lays-out
that math lane-major, with gathers/scatters/argmins re-expressed as one-hot
sums (TPU has no fast small-gather; one-hot VPU math is exact).

Layout: every field is moved batch-LAST ((R, 2, B), (C, B), ...), bools are
carried as int32 (1-bit vectors don't rotate on TPU — PERF.md lesson), and
the grid tiles B into 128-lane blocks.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from ..envs import dynamics
from ..envs.types import (
    CUBE_AVAILABLE,
    CUBE_LIFTED,
    CUBE_REMOVED,
    CUBE_THROWN,
    IDLE,
    MANIPULATING,
    MOVING,
    EnvParams,
)

ROBOT_R = constants.ROBOT_HALF_WIDTH
CUBE_R = constants.CUBE_WIDTH / 2
_N_AXIS = 7  # dynamics._N_AXIS_SAMPLES
_REMOVED_Z = -1000.0

# Fields the kernel mutates, in kernel argument order.  Shapes are the
# batch-last suffix shapes ((R, 2) means array (R, 2, B)).
_MUT = [
    ("robot_pos", "R2", jnp.float32),
    ("robot_heading", "R", jnp.float32),
    ("target_pos", "R2", jnp.float32),
    ("target_heading", "R", jnp.float32),
    ("fsm", "R", jnp.int32),
    ("wp_index", "R", jnp.int32),
    ("prev_pos", "R2", jnp.float32),
    ("prev_heading", "R", jnp.float32),
    ("has_prev", "R", jnp.int32),
    ("ctrl_sim_steps", "R", jnp.int32),
    ("consec_turn", "R", jnp.int32),
    ("manip_target", "R", jnp.int32),
    ("manip_steps", "R", jnp.int32),
    ("lifting", "R", jnp.int32),
    ("carried_cube", "R", jnp.int32),
    ("blocked_obstacle", "R", jnp.int32),
    ("blocked_robot", "R", jnp.int32),
    ("collided_obstacle", "R", jnp.int32),
    ("collided_robot", "R", jnp.int32),
    ("cubes", "R", jnp.int32),
    ("cubes_with_reward", "R", jnp.int32),
    ("step_distance", "R", jnp.float32),
    ("prev_wp_pos", "R2", jnp.float32),
    ("pointless_drop", "R", jnp.int32),
    ("pr_initial", "R2", jnp.float32),
    ("pr_final", "R2", jnp.float32),
    ("pr_pending", "R", jnp.int32),
    ("cube_pos", "C3", jnp.float32),
    ("cube_heading", "C", jnp.float32),
    ("cube_status", "C", jnp.int32),
    ("cube_vel", "C3", jnp.float32),
    ("throw_counter", "R", jnp.int32),
    ("simulation_steps", "1", jnp.int32),
]

# Read-only inputs.
_RO = [
    ("rects", "N4", jnp.float32),
    ("corners", "F3", jnp.float32),
    ("action_ch", "R", jnp.int32),
    ("target_ee", "R2", jnp.float32),
    ("waypoints", "RK2", jnp.float32),
    ("wp_headings", "RK", jnp.float32),
    ("num_wp", "R", jnp.int32),
    ("potential_cube", "R", jnp.int32),
    ("done", "1", jnp.int32),
    ("throw_seed", "1", jnp.int32),
    ("rc", "PR", jnp.float32),
]

# Per-robot derived constants (dynamics.py:84-97, 492-494, 534, 619-621).
# Pallas kernels cannot capture array constants, so these ride in as one
# (NF, R, B) read-only input (broadcast over lanes); each entry unpacks to
# an (R, B) tensor inside the kernel.
_RC_FIELDS = [
    "bmul", "m_lift", "m_rescue", "m_hooks", "m_throw", "front",
    "lift_off", "drop_off", "msub", "ee",
]


def _robot_consts(params: EnvParams):
    """(NF, R) float32 table of the per-robot constants used in-kernel."""
    names = [constants.ROBOT_TYPES[t] for t in params.robot_types]
    ee = np.asarray(params.ee_locations, np.float32)
    hooks = np.asarray(params.has_hooks, bool)
    front = np.where(hooks, ee + constants.END_EFFECTOR_THICKNESS, ee)
    vals = {
        "bmul": np.maximum(front - ROBOT_R, constants.ROBOT_BACKPACK_OFFSET),
        "m_lift": np.asarray([n == "lifting_robot" for n in names], np.float32),
        "m_rescue": np.asarray([n == "rescue_robot" for n in names], np.float32),
        "m_throw": np.asarray([n == "throwing_robot" for n in names], np.float32),
        "m_hooks": hooks.astype(np.float32),
        "front": front,
        "lift_off": ee + constants.LIFTED_CUBE_OFFSET + CUBE_R,
        "drop_off": ee + constants.END_EFFECTOR_THICKNESS + CUBE_R,
        "msub": ee + constants.CUBE_WIDTH / 2,
        "ee": ee,
    }
    return np.stack([np.asarray(vals[f], np.float32) for f in _RC_FIELDS])


def supports(params: EnvParams) -> bool:
    """Kernel covers every robot team.  Throwing support rides the analytic
    pixel-center landing test (dynamics.physics_substep section 5) and the
    counter-based hash RNG (dynamics.throw_draws) — both chosen precisely so
    the scan path and this kernel compute identical trajectories without a
    map gather or threefry in the loop."""
    del params
    return True


def _suffix_shape(code, params, n_rect, n_corner):
    r, c, k = params.num_robots, params.num_cubes, constants.MAX_WAYPOINTS
    return {
        "R": (r,), "R2": (r, 2), "C": (c,), "C3": (c, 3), "1": (1,),
        "N4": (n_rect, 4), "F3": (n_corner, 3),
        "RK2": (r, k, 2), "RK": (r, k),
        "PR": (len(_RC_FIELDS), r),
    }[code]


# ---------------------------------------------------------------------------
# Batch-last math helpers (trailing axis = lanes)
# ---------------------------------------------------------------------------

def _norm2(x, axis):
    """sqrt(sum(x^2)) matching jnp.linalg.norm's op sequence."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis))


def _heading_diff(h1, h2):
    return jnp.mod(h2 - h1 + math.pi, 2 * math.pi) - math.pi


# Near-minimax even polynomial for atan(t)/t on t in [0, 1] (Chebyshev
# interpolant of degree 8 in t^2; max f32 error ~1.1e-7 rad, well inside
# the 1e-5 kernel-vs-scan equivalence tolerance).
_ATAN_COEFFS = (
    0.9999999817886541, -0.33333036709275443, 0.19991872028912389,
    -0.14197797792604977, 0.10618370631313427, -0.07456854814158088,
    0.04213762345019933, -0.015731249036827034, 0.002766283480395766,
)


def _atan2(y, x):
    """Branch-free octant-reduced atan2 — Mosaic has no atan/atan2 lowering.

    Matches jnp.arctan2 conventions on the axes: (0, 0) -> 0, (0, x<0) -> pi,
    (y<0, 0) -> -pi/2.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    u = t * t
    p = jnp.full_like(t, _ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * u + c
    r = t * p
    r = jnp.where(ay > ax, 0.5 * math.pi - r, r)
    r = jnp.where(x < 0, math.pi - r, r)
    return jnp.where(y < 0, -r, r)


def _iota(shape, axis):
    """In-kernel integer iota (array constants cannot be captured by a
    pallas_call; broadcasted_iota is a computed primitive)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


# Mosaic cannot relayout 1-bit vectors: any i1 broadcast across sublanes,
# i1 shape_cast, or i1 reduction legalizes through an i8 widen +
# ``arith.trunci i8 -> i1`` that the backend rejects ("Unsupported target
# bitwidth for truncation").  The helpers below route every mask
# broadcast/expand/reduce through int32, converting back to bool only with
# a full-shape ``!= 0`` compare (cmpi is always legal).

def _bx(m, axis, shape):
    """expand_dims(m, axis) broadcast to ``shape``, relayout done in int32."""
    mi = m.astype(jnp.int32)
    if axis is not None:
        mi = jnp.expand_dims(mi, axis)
    return jnp.broadcast_to(mi, shape) != 0


def _wherex(m, axis, a, b):
    """jnp.where(expand_dims(m, axis), a, b) with the mask broadcast in i32."""
    mi = m.astype(jnp.int32)
    if axis is not None:
        mi = jnp.expand_dims(mi, axis)
    shape = jnp.broadcast_shapes(mi.shape, jnp.shape(a), jnp.shape(b))
    return jnp.where(jnp.broadcast_to(mi, shape) != 0, a, b)


def _anyx(m, axis, keepdims=False):
    """jnp.any for bool vectors without an i1 reduction."""
    return jnp.max(m.astype(jnp.int32), axis=axis, keepdims=keepdims) != 0


def _first_min_onehot(d, axis):
    """One-hot of the FIRST minimum along ``axis`` (argmin semantics).

    Masked-iota construction (no cumsum — keeps the op set Mosaic-simple)."""
    dmin = jnp.min(d, axis=axis, keepdims=True)
    is_min = d == dmin
    iota = _iota(d.shape, axis)
    big = d.shape[axis]
    midx = jnp.min(jnp.where(is_min, iota, big), axis=axis, keepdims=True)
    return (is_min & (iota == midx)).astype(d.dtype)


def _first_max_onehot(d, axis):
    dmax = jnp.max(d, axis=axis, keepdims=True)
    is_max = d == dmax
    iota = _iota(d.shape, axis)
    big = d.shape[axis]
    midx = jnp.min(jnp.where(is_max, iota, big), axis=axis, keepdims=True)
    return (is_max & (iota == midx)).astype(jnp.float32)


def _onehot_index(idx, n):
    """(n,) one-hot planes of integer array ``idx``: result[c] = idx == c.

    idx (..., B) int32 -> (n, ..., B) bool.
    """
    iota = _iota((n,) + idx.shape, 0)
    return idx[None] == iota


def _aabb_sd(px, py, rects):
    """Signed distance of points to each wall rect.

    px/py (..., B); rects (N, 4, B) -> (N, ..., B) stacked via loop (keeps
    transients at point-set size instead of points x rects).
    """
    out = []
    n = rects.shape[0]
    for i in range(n):
        cx, cy, hw, hh = rects[i, 0], rects[i, 1], rects[i, 2], rects[i, 3]
        dx = jnp.abs(px - cx) - hw
        dy = jnp.abs(py - cy) - hh
        outside = jnp.sqrt(jnp.maximum(dx, 0.0) ** 2 + jnp.maximum(dy, 0.0) ** 2)
        inside = jnp.minimum(jnp.maximum(dx, dy), 0.0)
        out.append(outside + inside)
    return out  # list of (..., B)


def _fillet_sd(px, py, corners):
    """Signed distance to each rounded-corner fillet, list over corners."""
    w = constants.ROUNDED_CORNER_WIDTH
    off = w / math.sqrt(2)
    out = []
    for i in range(corners.shape[0]):
        cx, cy, h = corners[i, 0], corners[i, 1], corners[i, 2]
        ax = cx - off * jnp.cos(h - math.radians(45))
        ay = cy - off * jnp.sin(h - math.radians(45))
        ccx, ccy = 2 * cx - ax, 2 * cy - ay
        dx = px - ax
        dy = py - ay
        ch, sh = jnp.cos(h), jnp.sin(h)
        lx = ch * dx + sh * dy
        ly = -sh * dx + ch * dy
        qx = jnp.abs(lx - w / 2) - w / 2
        qy = jnp.abs(ly + w / 2) - w / 2
        sd_sq = jnp.sqrt(
            jnp.maximum(qx, 0) ** 2 + jnp.maximum(qy, 0) ** 2
        ) + jnp.minimum(jnp.maximum(qx, qy), 0.0)
        sd_dc = w - jnp.sqrt((px - ccx) ** 2 + (py - ccy) ** 2)
        out.append(jnp.maximum(sd_sq, sd_dc))
    return out


def _capsule_points(rc, pos, heading):
    """(R, S, 2, B) capsule-axis samples (dynamics._capsule_points)."""
    bo = constants.ROBOT_BACKPACK_OFFSET
    d = jnp.stack([jnp.cos(heading), jnp.sin(heading)], axis=1)  # (R, 2, B)
    a = pos + bo * d
    b = pos + rc["bmul"][:, None] * d
    t = (
        _iota((1, _N_AXIS, 1, 1), 1).astype(jnp.float32) / (_N_AXIS - 1)
    )
    return a[:, None] + t * (b - a)[:, None]


def _gather_cube(arr_cb, idx_rb):
    """arr (C, ..., B) gathered at per-robot cube index (R, B) -> (R, ..., B).

    Out-of-range (negative) indices must be pre-clamped by the caller.
    The one-hot is laid out (R, C, ..., B) so the contraction reduces a
    MIDDLE dim — Mosaic cannot lower reductions over the leading dim of >2D
    vectors ("unsupported output implicit dimension").
    """
    c = arr_cb.shape[0]
    iota = _iota((idx_rb.shape[0], c) + idx_rb.shape[1:], 1)  # (R, C, B)
    oh = (idx_rb[:, None] == iota).astype(arr_cb.dtype)
    extra = arr_cb.ndim - 2                      # middle dims of arr
    ohx = oh.reshape(oh.shape[:2] + (1,) * extra + oh.shape[2:])
    return jnp.sum(ohx * arr_cb[None], axis=1)


def _scatter_cube(arr_cb, idx_rb, mask_rb, val_rb):
    """dynamics._scatter_cube lane-major: write val[r] into arr[idx[r]] where
    mask[r] (indices are disjoint across robots by construction)."""
    c = arr_cb.shape[0]
    ohi = _onehot_index(idx_rb, c).astype(jnp.int32) * (
        mask_rb.astype(jnp.int32)[None]
    )  # (C, R, B) int32
    extra = arr_cb.ndim - 2
    ohx = ohi.reshape(ohi.shape[:2] + (1,) * extra + ohi.shape[2:])
    sel = jnp.max(ohx, axis=1)  # (C, 1*, B) int32
    upd = jnp.sum(ohx.astype(arr_cb.dtype) * val_rb[None], axis=1)
    return jnp.where(jnp.broadcast_to(sel, arr_cb.shape) != 0, upd, arr_cb)


def _wp_at(wps_rkb, idx_rb):
    """waypoints (R, K, ..., B) at per-robot index (R, B) -> (R, ..., B)."""
    k = wps_rkb.shape[1]
    iota = _iota((wps_rkb.shape[0], k) + idx_rb.shape[1:], 1)
    oh = (idx_rb[:, None] == iota).astype(wps_rkb.dtype)
    extra = wps_rkb.ndim - 3
    ohx = oh.reshape(oh.shape[:2] + (1,) * extra + oh.shape[2:])
    return jnp.sum(ohx * wps_rkb, axis=1)


def _in_receptacle(params, xy_r2b):
    if not params.has_receptacle:
        return jnp.zeros(xy_r2b.shape[:1] + xy_r2b.shape[2:], bool)
    rx, ry = params.receptacle_position
    half = (constants.RECEPTACLE_WIDTH - constants.CUBE_WIDTH) / 2
    return (xy_r2b[:, 0] > rx - half) & (xy_r2b[:, 1] > ry - half)


# ---------------------------------------------------------------------------
# One substep, lane-major (mirrors dynamics.physics_substep +
# dynamics.controller_substep block for block; reference citations live
# there)
# ---------------------------------------------------------------------------

def _substep(params: EnvParams, rc, s):
    r_n, c_n = params.num_robots, params.num_cubes
    names = [constants.ROBOT_TYPES[t] for t in params.robot_types]
    has_lifting = any(n == "lifting_robot" for n in names)
    has_rescue = any(n == "rescue_robot" for n in names)
    has_throwing = any(n == "throwing_robot" for n in names)
    has_hooks = any(constants.ROBOT_HAS_HOOKS[n] for n in names)
    m_lift = rc["m_lift"] != 0                    # (R, B) bool
    m_rescue = rc["m_rescue"] != 0
    m_throw = rc["m_throw"] != 0
    m_hooks = rc["m_hooks"] != 0

    b = s["fsm"].shape[-1]
    active = (~_anyx(s["fsm"] == IDLE, axis=0, keepdims=True)) & (
        s["done"] == 0
    )  # (1, B)
    act_r = _bx(active, None, (r_n, b))                       # (R, B)
    act_c = _bx(active, None, (c_n, b))                       # (C, B)

    # ================= physics_substep =================
    delta = s["target_pos"] - s["robot_pos"]                  # (R, 2, B)
    dist = _norm2(delta, axis=1)[:, None]                     # (R, 1, B)
    step = jnp.minimum(dist, constants.DRIVE_SPEED_PER_SIM_STEP)
    new_pos = s["robot_pos"] + _wherex(
        dist > 1e-9, None, delta / jnp.maximum(dist, 1e-9) * step, 0.0
    )
    hd = _heading_diff(s["robot_heading"], s["target_heading"])
    turn = jnp.clip(
        hd, -constants.TURN_SPEED_PER_SIM_STEP, constants.TURN_SPEED_PER_SIM_STEP
    )
    new_heading = s["robot_heading"] + turn

    moving_mask = (s["fsm"] == MOVING) & act_r                # (R, B) bool
    # Effective candidate poses: frozen robots are contact-tested where they
    # stand, not at their stale servo target (dynamics.physics_substep).
    cand = _wherex(moving_mask, 1, new_pos, s["robot_pos"])   # (R, 2, B)
    cand_h = jnp.where(moving_mask, new_heading, s["robot_heading"])

    pts = _capsule_points(rc, cand, cand_h)                   # (R, S, 2, B)
    px, py = pts[:, :, 0], pts[:, :, 1]                       # (R, S, B)
    wall_hit = jnp.zeros(px.shape[:1] + px.shape[2:], bool)   # (R, B)
    for sd in _aabb_sd(px, py, s["rects"]):
        wall_hit |= _anyx(sd <= ROBOT_R, axis=1)
    for sd in _fillet_sd(px, py, s["corners"]):
        wall_hit |= _anyx(sd <= ROBOT_R, axis=1)

    # robot-robot clearance (margin to contact) per pair (R, R, B)
    dvec_rr = pts[:, None, :, None] - pts[None, :, None, :]
    d_rr = _norm2(dvec_rr, axis=4)                            # (R, R, S, S, B)
    clear = jnp.min(d_rr, axis=(2, 3)) - 2 * ROBOT_R          # (R, R, B)
    carried = s["carried_cube"]
    has_carry0 = carried >= 0                                 # (R, B)
    cube_p = _gather_cube(s["cube_pos"][:, :2], jnp.maximum(carried, 0))
    dc = _norm2(pts[:, None] - cube_p[None, :, None], axis=3)  # (R, R, S, B)
    clear_c = jnp.min(dc, axis=2) - (ROBOT_R + CUBE_R)        # (R, R, B)
    clear = jnp.minimum(clear, _wherex(has_carry0, 0, clear_c, jnp.inf))
    eye = _iota(clear.shape, 0) == _iota(clear.shape, 1)
    clear = jnp.where(eye, jnp.inf, clear)
    rr_hits = clear <= 0.0                                    # (R, R, B)
    robot_hit = _anyx(rr_hits, axis=1)                        # (R, B)

    # Tangential slide (dynamics.physics_substep): drop the servo step's
    # approach component toward the deepest contact (relative motion
    # orthogonal to the separation vector can only grow the pair distance,
    # so no robot recheck is needed); wall-recheck the slid pose.
    vx = cand[:, 0] - s["robot_pos"][:, 0]                    # (R, B)
    vy = cand[:, 1] - s["robot_pos"][:, 1]
    oh_j = _first_min_onehot(jnp.where(rr_hits, clear, jnp.inf), axis=1)
    cx, cy = cand[:, 0], cand[:, 1]                           # (R, B)
    selx = jnp.zeros_like(cx)
    sely = jnp.zeros_like(cy)
    for j in range(r_n):                 # unrolled: no leading-dim reduce
        selx = selx + oh_j[:, j] * cx[j][None]
        sely = sely + oh_j[:, j] * cy[j][None]
    nx, ny = cx - selx, cy - sely
    nn = jnp.maximum(jnp.sqrt(nx * nx + ny * ny), 1e-9)
    nx, ny = nx / nn, ny / nn
    appr = jnp.minimum(vx * nx + vy * ny, 0.0)                # (R, B)
    slx = s["robot_pos"][:, 0] + (vx - appr * nx)
    sly = s["robot_pos"][:, 1] + (vy - appr * ny)
    slid = jnp.stack([slx, sly], axis=1)                      # (R, 2, B)
    pts2 = _capsule_points(rc, slid, cand_h)
    px2, py2 = pts2[:, :, 0], pts2[:, :, 1]
    wall2 = jnp.zeros_like(wall_hit)
    for sd in _aabb_sd(px2, py2, s["rects"]):
        wall2 |= _anyx(sd <= ROBOT_R, axis=1)
    for sd in _fillet_sd(px2, py2, s["corners"]):
        wall2 |= _anyx(sd <= ROBOT_R, axis=1)
    do_slide = robot_hit & ~wall_hit & moving_mask & ~wall2

    blocked = wall_hit | (robot_hit & ~do_slide)
    new_pos = _wherex(
        blocked | ~moving_mask, 1, s["robot_pos"], cand
    )
    new_pos = _wherex(do_slide, 1, slid, new_pos)
    new_heading = jnp.where(moving_mask, new_heading, s["robot_heading"])
    blocked_obstacle = wall_hit & moving_mask
    # "hit by a moving robot": OR over the leading (i) axis, unrolled —
    # Mosaic cannot reduce the leading dim of a >2D vector
    rr_mov = rr_hits & _bx(moving_mask, 1, rr_hits.shape)     # [i, j, B]
    hit_by_moving = jnp.zeros_like(robot_hit)
    for i in range(r_n):
        hit_by_moving = hit_by_moving | rr_mov[i]
    blocked_robot = (robot_hit & moving_mask) | hit_by_moving

    # ---- Cube dynamics ----
    cube_pos = s["cube_pos"]
    cube_heading = s["cube_heading"]
    avail = s["cube_status"] == CUBE_AVAILABLE                # (C, B)

    axis_pts = _capsule_points(rc, new_pos, new_heading)  # (R, S, 2, B)
    p2x, p2y = cube_pos[:, 0], cube_pos[:, 1]                 # (C, B)
    rdx = jnp.cos(new_heading)                                # (R, B)
    rdy = jnp.sin(new_heading)
    # NB: mixed None+int indexing (new_pos[None, :, 0]) lowers to a >2D
    # lax.gather, which Mosaic rejects — slice first, then broadcast.
    npx, npy = new_pos[:, 0], new_pos[:, 1]                   # (R, B)
    relx = p2x[:, None] - npx[None]                           # (C, R, B)
    rely = p2y[:, None] - npy[None]
    fwd = relx * rdx[None] + rely * rdy[None]
    lat = relx * (-rdy)[None] + rely * rdx[None]
    front = rc["front"][None]                                 # (1, R, B)
    in_face = (
        (jnp.abs(lat) <= constants.ROBOT_HALF_WIDTH)
        & (fwd > 0)
        & (fwd <= front + CUBE_R)
    )
    pen_face = jnp.where(in_face, front + CUBE_R - fwd, -jnp.inf)  # (C, R, B)

    apx, apy = axis_pts[:, :, 0], axis_pts[:, :, 1]           # (R, S, B)
    dvx = p2x[:, None, None] - apx[None]                      # (C, R, S, B)
    dvy = p2y[:, None, None] - apy[None]
    dd = jnp.sqrt(dvx * dvx + dvy * dvy)                      # (C, R, S, B)
    oh_s = _first_min_onehot(dd, axis=2)
    d_axis = jnp.min(dd, axis=2)                              # (C, R, B)
    pen_rad = (ROBOT_R + CUBE_R) - d_axis
    rad_x = jnp.sum(oh_s * dvx, axis=2) / jnp.maximum(d_axis, 1e-9)
    rad_y = jnp.sum(oh_s * dvy, axis=2) / jnp.maximum(d_axis, 1e-9)

    use_face = pen_face > 0
    pen_cr = jnp.where(use_face, pen_face, pen_rad)           # (C, R, B)
    dir_x = jnp.where(use_face, jnp.broadcast_to(rdx[None], rad_x.shape), rad_x)
    dir_y = jnp.where(use_face, jnp.broadcast_to(rdy[None], rad_y.shape), rad_y)
    oh_r = _first_max_onehot(pen_cr, axis=1)                  # (C, R, B)
    pen = jnp.sum(oh_r * pen_cr, axis=1)                      # (C, B)
    push_x = jnp.sum(oh_r * dir_x, axis=1)
    push_y = jnp.sum(oh_r * dir_y, axis=1)
    do_push = (pen > 0) & avail & act_c
    p2x = p2x + jnp.where(do_push, push_x * pen, 0.0)
    p2y = p2y + jnp.where(do_push, push_y * pen, 0.0)

    # cube-cube separation (pair mask built in f32 — i1 cannot broadcast)
    diffx = p2x[:, None] - p2x[None]                          # (C, C, B)
    diffy = p2y[:, None] - p2y[None]
    dcc = jnp.sqrt(diffx * diffx + diffy * diffy)
    availf = avail.astype(jnp.float32)
    eye_cf = (
        _iota((c_n, c_n, dcc.shape[-1]), 0)
        == _iota((c_n, c_n, dcc.shape[-1]), 1)
    ).astype(jnp.float32)
    pair_ok = availf[:, None] * availf[None] * (1.0 - eye_cf)
    pen_cc = jnp.maximum(2 * CUBE_R * 0.9 - dcc, 0.0) * pair_ok
    inv_cc = 1.0 / jnp.maximum(dcc, 1e-9)
    gain = jnp.where(active, 0.5, 0.0)                        # (1, B)
    p2x = p2x + gain * jnp.sum(pen_cc * diffx * inv_cc, axis=1)
    p2y = p2y + gain * jnp.sum(pen_cc * diffy * inv_cc, axis=1)

    # project cubes out of walls (dominant-axis AABB gradient).  The
    # nearest-rect argmin is unrolled over the handful of rects — a stacked
    # (N, C, B) one-hot contraction would reduce the leading dim, which
    # Mosaic cannot lower.
    sd_list = _aabb_sd(p2x, p2y, s["rects"])                  # list (C, B)
    sd_min = sd_list[0]
    rcx = jnp.broadcast_to(s["rects"][0, 0], sd_min.shape)    # (C, B)
    rcy = jnp.broadcast_to(s["rects"][0, 1], sd_min.shape)
    rhw = jnp.broadcast_to(s["rects"][0, 2], sd_min.shape)
    rhh = jnp.broadcast_to(s["rects"][0, 3], sd_min.shape)
    for i, sd in enumerate(sd_list[1:], 1):
        better = sd < sd_min                                  # first-min ties
        sd_min = jnp.where(better, sd, sd_min)
        rcx = jnp.where(better, s["rects"][i, 0], rcx)
        rcy = jnp.where(better, s["rects"][i, 1], rcy)
        rhw = jnp.where(better, s["rects"][i, 2], rhw)
        rhh = jnp.where(better, s["rects"][i, 3], rhh)
    pen_w = jnp.maximum(CUBE_R - sd_min, 0.0)
    ddx = p2x - rcx
    ddy = p2y - rcy
    ox = jnp.abs(ddx) - rhw
    oy = jnp.abs(ddy) - rhh
    gx = jnp.where(ox >= oy, jnp.sign(ddx), 0.0)
    gy = jnp.where(oy > ox, jnp.sign(ddy), 0.0)
    wallp = avail & act_c & (pen_w > 0)
    p2x = p2x + jnp.where(wallp, gx * pen_w, 0.0)
    p2y = p2y + jnp.where(wallp, gy * pen_w, 0.0)

    # fillets: push toward the arc center
    if s["corners"].shape[0] > 0:
        sdf_list = _fillet_sd(p2x, p2y, s["corners"])
        w = constants.ROUNDED_CORNER_WIDTH
        off = w / math.sqrt(2)
        ccx = s["corners"][:, 0]                              # (F, B)
        ccy = s["corners"][:, 1]
        chh = s["corners"][:, 2]
        axp = ccx - off * jnp.cos(chh - math.radians(45))
        ayp = ccy - off * jnp.sin(chh - math.radians(45))
        cex = 2 * ccx - axp                                   # (F, B)
        cey = 2 * ccy - ayp
        # nearest-fillet argmin unrolled (same Mosaic leading-dim rule)
        sdf_min = sdf_list[0]
        ncx = jnp.broadcast_to(cex[0], sdf_min.shape)         # (C, B)
        ncy = jnp.broadcast_to(cey[0], sdf_min.shape)
        for i, sdf in enumerate(sdf_list[1:], 1):
            better = sdf < sdf_min
            sdf_min = jnp.where(better, sdf, sdf_min)
            ncx = jnp.where(better, cex[i], ncx)
            ncy = jnp.where(better, cey[i], ncy)
        pen_f = jnp.maximum(CUBE_R - sdf_min, 0.0)
        tcx = ncx - p2x
        tcy = ncy - p2y
        tn = jnp.maximum(jnp.sqrt(tcx * tcx + tcy * tcy), 1e-9)
        filp = avail & act_c & (pen_f > 0)
        p2x = p2x + jnp.where(filp, tcx / tn * pen_f, 0.0)
        p2y = p2y + jnp.where(filp, tcy / tn * pen_f, 0.0)

    # NB: .at[].set always emits lax.scatter, which Mosaic can't lower —
    # rebuild the axis-1 triple with slices + concatenate instead.
    npx2 = jnp.where(avail, p2x, cube_pos[:, 0])
    npy2 = jnp.where(avail, p2y, cube_pos[:, 1])
    cube_pos = jnp.concatenate(
        [npx2[:, None], npy2[:, None], cube_pos[:, 2:]], axis=1
    )

    # lifted cubes ride at the hook offset
    if has_lifting:
        carried_st = _gather_cube(s["cube_status"], jnp.maximum(carried, 0))
        has_carry = (
            (carried >= 0) & act_r & (carried_st == CUBE_LIFTED)
        )
        offset = rc["lift_off"]
        cpx = new_pos[:, 0] + offset * rdx                    # (R, B)
        cpy = new_pos[:, 1] + offset * rdy
        cpz = jnp.full_like(cpx, constants.LIFTED_CUBE_HEIGHT + CUBE_R)
        cp = jnp.stack([cpx, cpy, cpz], axis=1)               # (R, 3, B)
        cube_pos = _scatter_cube(cube_pos, jnp.maximum(carried, 0), has_carry, cp)
        cube_heading = _scatter_cube(
            cube_heading, jnp.maximum(carried, 0), has_carry, new_heading
        )

    # Ballistic integration for thrown cubes (dynamics.physics_substep
    # section 5, envs.py:1314-1329), with the analytic pixel-center landing
    # test in place of the wall-map gather (same result bit-for-bit).
    cube_vel = s["cube_vel"]                                  # (C, 3, B)
    if has_throwing:
        thrown = (s["cube_status"] == CUBE_THROWN) & act_c  # (C, B)
        dt = constants.SIM_DT
        vz = cube_vel[:, 2] + jnp.where(thrown, -constants.GRAVITY * dt, 0.0)
        vel = jnp.concatenate([cube_vel[:, :2], vz[:, None]], axis=1)
        pos3 = cube_pos + _wherex(thrown, 1, vel * dt, 0.0)
        px3, py3, pz3 = pos3[:, 0], pos3[:, 1], pos3[:, 2]   # (C, B)
        h, w = params.map_shape
        ppm = constants.LOCAL_MAP_PIXELS_PER_METER
        gi = jnp.clip(jnp.floor(h / 2 - py3 * ppm).astype(jnp.int32), 0, h - 1)
        gj = jnp.clip(jnp.floor(w / 2 + px3 * ppm).astype(jnp.int32), 0, w - 1)
        ccx = ((gj + 0.5) - w / 2) / ppm                      # pixel centers
        ccy = (h / 2 - (gi + 0.5)) / ppm
        on_wall = jnp.zeros(px3.shape, bool)
        for i in range(s["rects"].shape[0]):                  # rects_mask
            rcx, rcy, rhw, rhh = (s["rects"][i, k] for k in range(4))  # (B,)
            on_wall |= (jnp.abs(ccx - rcx[None]) <= rhw[None]) & (
                jnp.abs(ccy - rcy[None]) <= rhh[None]
            )
        wfc = constants.ROUNDED_CORNER_WIDTH                  # corners_mask
        offc = wfc / math.sqrt(2)
        for i in range(s["corners"].shape[0]):
            kx, ky, kh = (s["corners"][i, k] for k in range(3))  # (B,)
            ax = kx - offc * jnp.cos(kh - math.radians(45))
            ay = ky - offc * jnp.sin(kh - math.radians(45))
            cex, cey = 2 * kx - ax, 2 * ky - ay
            ddx = ccx - ax[None]
            ddy = ccy - ay[None]
            chh, shh = jnp.cos(kh)[None], jnp.sin(kh)[None]
            lx = chh * ddx + shh * ddy
            ly = -shh * ddx + chh * ddy
            in_square = (lx >= 0) & (lx <= wfc) & (ly >= -wfc) & (ly <= 0)
            out_disc = (ccx - cex[None]) ** 2 + (ccy - cey[None]) ** 2 >= wfc ** 2
            on_wall |= in_square & out_disc
        rest_z = jnp.where(on_wall, constants.WALL_HEIGHT + CUBE_R, CUBE_R)
        landed = thrown & (pz3 <= rest_z) & (vel[:, 2] < 0)
        pz_new = jnp.where(landed, rest_z, pz3)
        pos3 = jnp.concatenate([pos3[:, :2], pz_new[:, None]], axis=1)
        vx2 = jnp.where(landed, vel[:, 0] * 0.3, vel[:, 0])
        vy2 = jnp.where(landed, vel[:, 1] * 0.3, vel[:, 1])
        vz2 = jnp.where(landed, vel[:, 2] * 0.0, vel[:, 2])
        vel = jnp.stack([vx2, vy2, vz2], axis=1)
        cube_pos = _wherex(thrown, 1, pos3, cube_pos)
        cube_vel = _wherex(thrown, 1, vel, cube_vel)

    simulation_steps = s["simulation_steps"] + jnp.where(active, 1, 0)

    s = dict(
        s,
        robot_pos=new_pos,
        robot_heading=new_heading,
        blocked_obstacle=blocked_obstacle.astype(jnp.int32),
        blocked_robot=blocked_robot.astype(jnp.int32),
        cube_pos=cube_pos,
        cube_heading=cube_heading,
        cube_vel=cube_vel,
        simulation_steps=simulation_steps,
    )

    # ================= controller_substep =================
    act = act_r & (s["fsm"] != IDLE)                          # (R, B)
    ctrl_sim_steps = s["ctrl_sim_steps"] + act.astype(jnp.int32)

    mov = act & (s["fsm"] == MOVING)
    cur_p = s["robot_pos"]
    cur_h = s["robot_heading"]
    hp = s["has_prev"] != 0

    driving = _norm2(cur_p - s["prev_pos"], axis=1) > constants.NOT_MOVING_POS_EPS
    turning = (
        jnp.abs(_heading_diff(s["prev_heading"], cur_h))
        > constants.NOT_MOVING_HEADING_EPS
    )
    consec = jnp.where(turning, s["consec_turn"] + 1, 0)
    consec_turn = jnp.where(mov & hp, consec, s["consec_turn"])
    stuck = consec > constants.STUCK_OSCILLATING_STEPS
    not_moving = ((~driving) & (~turning)) | stuck

    far_from_start = (
        _norm2(cur_p - s["waypoints"][:, 0], axis=1) > constants.DRIVE_STEP_SIZE
    )
    check = mov & hp & (far_from_start | not_moving)
    collided_obstacle = (s["collided_obstacle"] != 0) | (
        check & (s["blocked_obstacle"] != 0)
    )
    collided_robot = (s["collided_robot"] != 0) | (
        check & (s["blocked_robot"] != 0)
    )

    step_limit = ctrl_sim_steps > constants.STEP_LIMIT_SIM_STEPS
    go_idle = mov & hp & (collided_obstacle | collided_robot | step_limit)
    reached = mov & hp & ~go_idle & not_moving

    upd = go_idle | reached
    leg = _norm2(cur_p - s["prev_wp_pos"], axis=1)
    step_distance = s["step_distance"] + jnp.where(upd, leg, 0.0)
    prev_wp_pos = _wherex(upd, 1, cur_p, s["prev_wp_pos"])
    fsm = jnp.where(go_idle, IDLE, s["fsm"])

    last_wp = s["wp_index"] == s["num_wp"] - 1
    dm = reached & last_wp
    wp_index = s["wp_index"] + (reached & ~last_wp).astype(jnp.int32)
    fsm = jnp.where(dm, IDLE, fsm)

    lifting = s["lifting"] != 0
    carried = s["carried_cube"]
    carried_cl = jnp.maximum(carried, 0)
    cube_status = s["cube_status"]
    cube_pos = s["cube_pos"]
    cube_heading = s["cube_heading"]
    cube_vel = s["cube_vel"]
    throw_counter = s["throw_counter"]
    cubes = s["cubes"]
    cubes_with_reward = s["cubes_with_reward"]
    pointless_drop = s["pointless_drop"] != 0
    pr_initial = s["pr_initial"]
    pr_final = s["pr_final"]
    pr_pending = s["pr_pending"] != 0
    manip_target = s["manip_target"]
    manip_steps = s["manip_steps"]

    if has_lifting:
        drop = dm & m_lift & lifting & (s["action_ch"] == 1)
        keep = dm & m_lift & lifting & (s["action_ch"] != 1)
        carried_xy = _gather_cube(cube_pos[:, :2], carried_cl)  # (R, 2, B)

        close_pr = drop | keep
        pr_final = _wherex(close_pr, 1, carried_xy, pr_final)
        pr_pending = pr_pending | close_pr

        drop_offset = rc["drop_off"]
        dxp = cur_p[:, 0] + drop_offset * jnp.cos(cur_h)
        dyp = cur_p[:, 1] + drop_offset * jnp.sin(cur_h)
        drop_xy = jnp.stack([dxp, dyp], axis=1)               # (R, 2, B)
        success = _in_receptacle(params, drop_xy)             # (R, B)
        new_status = jnp.where(success, CUBE_REMOVED, CUBE_AVAILABLE)
        placed = jnp.stack([dxp, dyp, jnp.full_like(dxp, CUBE_R)], axis=1)
        removed = jnp.stack(
            [jnp.zeros_like(dxp), jnp.zeros_like(dxp),
             jnp.full_like(dxp, _REMOVED_Z)], axis=1,
        )
        new_cpos = _wherex(success, 1, removed, placed)
        cube_status = _scatter_cube(cube_status, carried_cl, drop, new_status)
        cube_pos = _scatter_cube(cube_pos, carried_cl, drop, new_cpos)
        cube_heading = _scatter_cube(cube_heading, carried_cl, drop, cur_h)
        cubes = cubes + (drop & success).astype(jnp.int32)
        cubes_with_reward = cubes_with_reward + (drop & success).astype(jnp.int32)
        pointless_drop = pointless_drop | (drop & ~success)
        lifting = lifting & ~drop
        carried = jnp.where(drop, -1, carried)
        fsm = jnp.where(drop, MANIPULATING, fsm)
        manip_target = jnp.where(
            drop, constants.MANIPULATION_STEPS_DROP, manip_target
        )
        manip_steps = jnp.where(drop, 0, manip_steps)
        carried_cl = jnp.maximum(carried, 0)

    if has_hooks:
        # grab attempts: ray test from the TARGET pose
        near = (
            _norm2(cur_p - _wp_at(s["waypoints"], s["num_wp"] - 1), axis=1)
            < constants.DRIVE_STEP_SIZE
        )
        try_grab = (
            dm
            & m_hooks
            & ~(m_lift & lifting)
            & (s["potential_cube"] >= 0)
            & near
        )
        cand, cand_found = _ray_test(params, rc, s, cube_pos, cube_heading, cube_status)
        want = try_grab & cand_found
        wanti = want.astype(jnp.int32)
        same = (cand[:, None] == cand[None]) & (
            (wanti[:, None] * wanti[None]) != 0
        )  # (R, R, B)
        tril = _iota(same.shape, 1) < _iota(same.shape, 0)
        loses = _anyx(same & tril, axis=1)
        win = want & ~loses
        cand_cl = jnp.maximum(cand, 0)
        cand_xy = _gather_cube(cube_pos[:, :2], cand_cl)      # (R, 2, B)

    if has_lifting:
        lift = win & m_lift
        lifted_offset = rc["lift_off"]
        lxp = cur_p[:, 0] + lifted_offset * jnp.cos(cur_h)
        lyp = cur_p[:, 1] + lifted_offset * jnp.sin(cur_h)
        lifted_pos = jnp.stack(
            [lxp, lyp, jnp.full_like(lxp, constants.LIFTED_CUBE_HEIGHT + CUBE_R)],
            axis=1,
        )
        carried = jnp.where(lift, cand, carried)
        lifting = lifting | lift
        cube_status = _scatter_cube(
            cube_status, cand_cl, lift, jnp.full_like(cand_cl, CUBE_LIFTED)
        )
        cube_pos = _scatter_cube(cube_pos, cand_cl, lift, lifted_pos)
        cube_heading = _scatter_cube(cube_heading, cand_cl, lift, cur_h)
        pr_initial = _wherex(lift, 1, cand_xy, pr_initial)

    if has_throwing:
        # prepare_throw + throw_cube (dynamics.controller_substep,
        # envs.py:1306-1329) with the counter-hash noise draws
        throw = win & m_throw
        riota = _iota(throw.shape, 0)                         # (R, B)
        fx, fy = dynamics.throw_draws(s["throw_seed"], throw_counter, riota)
        kvel = constants.THROW_IMPULSE_TO_VELOCITY
        chh = jnp.cos(cur_h)                                  # (R, B)
        shh = jnp.sin(cur_h)
        vx = ((-fx) * chh - (-fy) * shh) * kvel
        vy = ((-fx) * shh + (-fy) * chh) * kvel
        v = jnp.stack([vx, vy, jnp.zeros_like(vx)], axis=1)   # (R, 3, B)
        bxp = cur_p[:, 0] + constants.ROBOT_BACKPACK_OFFSET * chh
        byp = cur_p[:, 1] + constants.ROBOT_BACKPACK_OFFSET * shh
        bzp = jnp.full_like(bxp, constants.ROBOT_HEIGHT + constants.CUBE_WIDTH)
        back = jnp.stack([bxp, byp, bzp], axis=1)             # (R, 3, B)
        throw_counter = throw_counter + throw.astype(jnp.int32)
        carried = jnp.where(throw, cand, carried)
        cube_status = _scatter_cube(
            cube_status, cand_cl, throw, jnp.full_like(cand_cl, CUBE_THROWN)
        )
        cube_pos = _scatter_cube(cube_pos, cand_cl, throw, back)
        cube_heading = _scatter_cube(cube_heading, cand_cl, throw, cur_h)
        cube_vel = _scatter_cube(cube_vel, cand_cl, throw, v)
        pr_initial = _wherex(throw, 1, cand_xy, pr_initial)
        fsm = jnp.where(throw, MANIPULATING, fsm)
        manip_target = jnp.where(
            throw, constants.MANIPULATION_STEPS_THROW, manip_target
        )
        manip_steps = jnp.where(throw, 0, manip_steps)
        carried_cl = jnp.maximum(carried, 0)

    if has_rescue:
        rescue = win & m_rescue
        cube_status = _scatter_cube(
            cube_status, cand_cl, rescue, jnp.full_like(cand_cl, CUBE_REMOVED)
        )
        zer = jnp.zeros_like(cur_p[:, 0])
        removed_r = jnp.stack(
            [zer, zer, jnp.full_like(zer, _REMOVED_Z)], axis=1,
        )
        cube_pos = _scatter_cube(cube_pos, cand_cl, rescue, removed_r)
        cubes = cubes + rescue.astype(jnp.int32)
        cubes_with_reward = cubes_with_reward + rescue.astype(jnp.int32)

    # servo retarget
    still = mov & (fsm == MOVING)
    wp = _wp_at(s["waypoints"], wp_index)                     # (R, 2, B)
    wph = _wp_at(s["wp_headings"], wp_index)                  # (R, B)
    hdw = _heading_diff(cur_h, wph)
    turn_mode = jnp.abs(hdw) > constants.TURN_STEP_SIZE
    t_heading_turn = cur_h + jnp.sign(hdw) * constants.TURN_STEP_SIZE
    dxy = wp - cur_p
    near_wp = _norm2(dxy, axis=1) < constants.DRIVE_STEP_SIZE
    ms = jnp.sign(_norm2(cur_p - s["target_ee"], axis=1) - rc["msub"])
    ms = jnp.where(ms == 0, 1.0, ms)
    nh = _atan2(ms * dxy[:, 1], ms * dxy[:, 0])
    dpx = cur_p[:, 0] + ms * constants.DRIVE_STEP_SIZE * jnp.cos(nh)
    dpy = cur_p[:, 1] + ms * constants.DRIVE_STEP_SIZE * jnp.sin(nh)
    drive_pos = jnp.stack([dpx, dpy], axis=1)
    t_pos = _wherex(
        turn_mode, 1, cur_p, _wherex(near_wp, 1, wp, drive_pos)
    )
    t_heading = jnp.where(turn_mode, t_heading_turn, jnp.where(near_wp, cur_h, nh))
    target_pos = _wherex(still, 1, t_pos, s["target_pos"])
    target_heading = jnp.where(still, t_heading, s["target_heading"])
    prev_pos = _wherex(mov, 1, cur_p, s["prev_pos"])
    prev_heading = jnp.where(mov, cur_h, s["prev_heading"])
    has_prev = (s["has_prev"] != 0) | mov

    # MANIPULATING countdown
    man = act & (fsm == MANIPULATING)
    msteps = jnp.where(man, manip_steps + 1, manip_steps)
    fin = man & (msteps >= manip_target)
    manip_steps = jnp.where(fin, 0, msteps)
    manip_target = jnp.where(fin, 0, manip_target)

    if has_throwing:
        # finish_throw_cube (envs.py:1331-1343): score or re-avail the
        # landed cube when the manipulation window closes
        fin_throw = fin & m_throw
        c2 = jnp.maximum(carried, 0)
        cube_xy2 = _gather_cube(cube_pos[:, :2], c2)          # (R, 2, B)
        succ2 = _in_receptacle(params, cube_xy2)              # (R, B)
        st2 = jnp.where(succ2, CUBE_REMOVED, CUBE_AVAILABLE)
        cz2 = _gather_cube(cube_pos[:, 2], c2)                # (R, B)
        lz = jnp.maximum(cz2, CUBE_R)
        landed_pos = jnp.stack([cube_xy2[:, 0], cube_xy2[:, 1], lz], axis=1)
        zer2 = jnp.zeros_like(lz)
        removed2 = jnp.stack([zer2, zer2, jnp.full_like(lz, _REMOVED_Z)], axis=1)
        pos2 = _wherex(succ2, 1, removed2, landed_pos)
        pr_final = _wherex(fin_throw, 1, cube_xy2, pr_final)
        pr_pending = pr_pending | fin_throw
        cube_status = _scatter_cube(cube_status, c2, fin_throw, st2)
        cube_pos = _scatter_cube(cube_pos, c2, fin_throw, pos2)
        cube_vel = _scatter_cube(
            cube_vel, c2, fin_throw, jnp.zeros_like(landed_pos)
        )
        cubes = cubes + (fin_throw & succ2).astype(jnp.int32)
        cubes_with_reward = cubes_with_reward + (fin_throw & succ2).astype(
            jnp.int32
        )
        carried = jnp.where(fin_throw, -1, carried)

    fsm = jnp.where(fin, IDLE, fsm)

    return dict(
        s,
        fsm=fsm,
        wp_index=wp_index,
        target_pos=target_pos,
        target_heading=target_heading,
        prev_pos=prev_pos,
        prev_heading=prev_heading,
        has_prev=has_prev.astype(jnp.int32),
        ctrl_sim_steps=ctrl_sim_steps,
        consec_turn=consec_turn,
        manip_target=manip_target,
        manip_steps=manip_steps,
        lifting=lifting.astype(jnp.int32),
        carried_cube=carried,
        collided_obstacle=collided_obstacle.astype(jnp.int32),
        collided_robot=collided_robot.astype(jnp.int32),
        cubes=cubes,
        cubes_with_reward=cubes_with_reward,
        step_distance=step_distance,
        prev_wp_pos=prev_wp_pos,
        pointless_drop=pointless_drop.astype(jnp.int32),
        pr_initial=pr_initial,
        pr_final=pr_final,
        pr_pending=pr_pending.astype(jnp.int32),
        cube_pos=cube_pos,
        cube_heading=cube_heading,
        cube_status=cube_status,
        cube_vel=cube_vel,
        throw_counter=throw_counter,
    )


def _ray_test(params: EnvParams, rc, s, cube_pos, cube_heading, cube_status):
    """dynamics.ray_test_cubes_all lane-major -> (cand (R, B) int32 clamped
    meaningless when not found, found (R, B) bool)."""
    r_n, c_n = params.num_robots, params.num_cubes
    ee = rc["ee"]                                             # (R, B)
    tgt = _wp_at(s["waypoints"], s["num_wp"] - 1)             # (R, 2, B)
    th = _wp_at(s["wp_headings"], s["num_wp"] - 1)            # (R, B)
    dx = jnp.cos(th)
    dy = jnp.sin(th)
    p0x = tgt[:, 0] + ee * dx                                 # (R, B)
    p0y = tgt[:, 1] + ee * dy
    reach = constants.END_EFFECTOR_DIST_THRESHOLD
    p1x = p0x + reach * dx
    p1y = p0y + reach * dy

    # All (R, C, B): the cube axis rides in the MIDDLE so the argmin below
    # reduces a middle dim (Mosaic cannot reduce the leading dim of >2D).
    ch = jnp.cos(cube_heading)[None]                          # (1, C, B)
    sh = jnp.sin(cube_heading)[None]
    cxb = cube_pos[:, 0][None]                                # (1, C, B)
    cyb = cube_pos[:, 1][None]
    rel0x = p0x[:, None] - cxb                                # (R, C, B)
    rel0y = p0y[:, None] - cyb
    rel1x = p1x[:, None] - cxb
    rel1y = p1y[:, None] - cyb
    q0x = ch * rel0x + sh * rel0y
    q0y = -sh * rel0x + ch * rel0y
    q1x = ch * rel1x + sh * rel1y
    q1y = -sh * rel1x + ch * rel1y
    tmins, tmaxs = [], []
    for q0, q1 in ((q0x, q1x), (q0y, q1y)):
        dq = q1 - q0
        inv = 1.0 / jnp.where(jnp.abs(dq) < 1e-12, 1e-12, dq)
        t0 = (-CUBE_R - q0) * inv
        t1 = (CUBE_R - q0) * inv
        tmins.append(jnp.minimum(t0, t1))
        tmaxs.append(jnp.maximum(t0, t1))
    tmin = jnp.maximum(tmins[0], tmins[1])                    # (R, C, B)
    tmax = jnp.minimum(tmaxs[0], tmaxs[1])
    avail = _bx(cube_status == CUBE_AVAILABLE, 0, tmin.shape)  # (R, C, B)
    valid = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= 1.0) & avail
    ts = jnp.where(valid, jnp.maximum(tmin, 0.0), jnp.inf)    # (R, C, B)

    # walls block the ray: 16 samples against the rects
    tline = _iota((1, 16, 1), 1).astype(jnp.float32) / 15.0
    sx = p0x[:, None] + tline * (p1x - p0x)[:, None]          # (R, 16, B)
    sy = p0y[:, None] + tline * (p1y - p0y)[:, None]
    wall_hit = jnp.zeros(sx.shape, bool)
    for sd in _aabb_sd(sx, sy, s["rects"]):
        wall_hit |= sd <= 0.0
    wall_ts = jnp.where(wall_hit, tline, jnp.inf)
    t_wall = jnp.min(wall_ts, axis=1)                         # (R, B)

    oh_c = _first_min_onehot(ts, axis=1)                      # (R, C, B)
    t_best = jnp.min(ts, axis=1)                              # (R, B)
    c_iota = _iota(ts.shape, 1).astype(jnp.float32)
    c_best = jnp.sum(oh_c * c_iota, axis=1).astype(jnp.int32)
    found = (t_best < jnp.inf) & (t_best <= t_wall)
    cand = jnp.where(found, c_best, -1)
    return cand, found


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

_BLOCK_B = 128


@functools.partial(
    jax.jit,
    static_argnames=("params", "n", "n_substeps", "interpret", "block_b"),
)
def _run(params, n, n_substeps, interpret, block_b, *arrays):
    n_mut = len(_MUT)

    def kernel(*refs):
        in_refs = refs[: n_mut + len(_RO)]
        out_refs = refs[n_mut + len(_RO):]
        s = {}
        rc = None
        for (name, _, _), ref in zip(_MUT + _RO, in_refs):
            if name == "rc":
                pack = ref[...]
                rc = {f: pack[i] for i, f in enumerate(_RC_FIELDS)}
            else:
                s[name] = ref[...]

        def body(_, s):
            return _substep(params, rc, s)

        s = jax.lax.fori_loop(0, n_substeps, body, s)
        for (name, _, _), ref in zip(_MUT, out_refs):
            ref[...] = s[name]

    grid = (n // block_b,)

    def spec_for(shape):
        blk = shape[:-1] + (block_b,)
        nd = len(shape)
        return pl.BlockSpec(
            blk,
            (lambda i, _nd=nd: (0,) * (_nd - 1) + (i,)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [spec_for(a.shape) for a in arrays]
    out_specs = [spec_for(a.shape) for a in arrays[:n_mut]]
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays[:n_mut]]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*arrays)


def run_substeps_pallas(params: EnvParams, state, n_substeps: int,
                        interpret: Optional[bool] = None,
                        block_b: int = _BLOCK_B):
    """Advance a BATCHED EnvState by ``n_substeps`` via the lane-major kernel.

    Drop-in replacement for ``vmap(run_substeps(..., refresh=False))`` on
    teams where :func:`supports` holds and the batch is a multiple of
    ``block_b`` (the caller falls back to the scan path otherwise).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = state.done.shape[0]
    assert b % block_b == 0 and supports(params)

    def pack(name, code, dtype):
        if name == "action_ch":
            x = state.action[:, :, 0]
        elif name == "simulation_steps":
            x = state.simulation_steps[:, None]
        elif name == "done":
            x = state.done[:, None]
        elif name == "throw_seed":
            x = state.throw_seed[:, None]
        elif name == "rc":
            t = jnp.asarray(_robot_consts(params))
            return jnp.broadcast_to(t[..., None], t.shape + (b,))
        else:
            x = getattr(state, name)
        x = jnp.moveaxis(x, 0, -1)  # batch-last
        return x.astype(dtype)

    arrays = [pack(nm, c, dt) for nm, c, dt in _MUT + _RO]
    outs = _run(params, b, n_substeps, interpret, block_b, *arrays)

    updates = {}
    for (name, code, dtype), out in zip(_MUT, outs):
        x = jnp.moveaxis(out, -1, 0)
        orig = getattr(state, name)
        if name == "simulation_steps":
            x = x[:, 0]
        updates[name] = x.astype(orig.dtype)
    return state.replace(**updates)
