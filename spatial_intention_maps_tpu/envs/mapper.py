"""Perception: map updates and observation (state-tensor) assembly.

Replaces Mapper / OccupancyMap / Camera (envs.py:1875-2554) with analytic,
batched array programs:

* :func:`current_seg_map` — the analytic top-down segmentation of the current
  scene (what the camera would see from above).
* :func:`update_robot_maps` — per-robot visibility-masked fusion into the
  persistent overhead (seg) and occupancy maps (envs.py:2053-2065, 2444-2450).
* :func:`build_state` — the 96x96xC egocentric observation stack
  (Mapper.get_state, envs.py:2067-2184).
"""

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..ops import pallas_crop, raster_ops, visibility, wavefront
from . import geometry
from .types import CUBE_AVAILABLE, CUBE_LIFTED, CUBE_REMOVED, IDLE, EnvParams, EnvState


# ---------------------------------------------------------------------------
# Scene segmentation
# ---------------------------------------------------------------------------

def current_seg_map(params: EnvParams, state: EnvState):
    """(H, W) uint8: seg_base + cubes overwritten + robots as 0 (unseen).

    Robots read as 0 because the reference's camera seg only classifies
    floor/obstacle/receptacle/cube — robot pixels fall through to 0 and are
    burned into the persistent map until re-observed (envs.py:1946-1952).
    """
    h, w = params.map_shape
    xs, ys = geometry.pixel_centers(h, w)
    seg = state.seg_base

    # Cubes (available or lifted are drawn; lifted cubes hover at the robot's
    # front and the overhead view sees them).  One vectorized any-over-cubes
    # instead of a sequential per-cube scan.
    drawn = (state.cube_status == CUBE_AVAILABLE) | (state.cube_status == CUBE_LIFTED)
    masks = jax.vmap(
        lambda p, hd: raster_ops.cube_mask(xs, ys, p, hd)
    )(state.cube_pos[:, :2], state.cube_heading)           # (C, H, W)
    any_cube = jnp.any(masks & drawn[:, None, None], axis=0)
    seg = jnp.where(any_cube, jnp.uint8(constants.SEG_CUBE), seg)

    # Robots blank out to 0.
    base_lengths = jnp.asarray(params.base_lengths)
    for r in range(params.num_robots):
        m = raster_ops.robot_body_mask(
            xs, ys, state.robot_pos[r], state.robot_heading[r], base_lengths[r]
        )
        seg = jnp.where(m, jnp.uint8(constants.SEG_UNSEEN), seg)
    return seg


def robot_seg_overlay(params: EnvParams, state: EnvState):
    """(H, W) uint8 robot stamps with per-group seg codes, and the float
    robot-map overlay (0.5 / 1.0-with-cube) used by the robot-map channel
    (envs.py:2243-2275)."""
    h, w = params.map_shape
    xs, ys = geometry.pixel_centers(h, w)
    base_lengths = params.base_lengths
    seg_overlay = jnp.zeros((h, w), jnp.uint8)
    robot_map = jnp.zeros((h, w), jnp.float32)
    for r in range(params.num_robots):
        carrying = state.carried_cube[r] >= 0
        mask_plain = raster_ops.robot_body_mask(
            xs, ys, state.robot_pos[r], state.robot_heading[r], float(base_lengths[r])
        )
        if constants.ROBOT_TYPES[params.robot_types[r]] == "lifting_robot":
            mask_cube = raster_ops.robot_body_mask(
                xs, ys, state.robot_pos[r], state.robot_heading[r],
                float(base_lengths[r]), with_cube=True,
            )
            mask = jnp.where(carrying, mask_cube, mask_plain)
            value = jnp.where(carrying, 1.0, 0.5)
        else:
            mask = mask_plain
            value = jnp.float32(0.5)
        code = constants.SEG_ROBOT_GROUP_1 + params.robot_groups[r]
        seg_overlay = jnp.where(mask, jnp.uint8(code), seg_overlay)
        robot_map = jnp.where(mask, jnp.maximum(robot_map, value), robot_map)
    return seg_overlay, robot_map


# ---------------------------------------------------------------------------
# Map updates (mapper.update, envs.py:2053-2065)
# ---------------------------------------------------------------------------

def update_robot_maps(params: EnvParams, state: EnvState, robot_mask):
    """Fuse a fresh observation into the selected robots' persistent maps.

    robot_mask: (R,) bool — which robots observe this round.
    """
    seg_now = current_seg_map(params, state)

    def upd(overhead_r, occ_r, pos, heading, active):
        vis = visibility.visible_mask(
            state.rects, state.corners, state.wall_map, pos, heading,
            params.use_partial_observations,
        )
        vis = vis & active
        overhead = jnp.where(vis, seg_now, overhead_r)
        occ = occ_r | (vis & state.wall_map)
        return overhead, occ

    overhead, occupancy = jax.vmap(upd)(
        state.overhead_map, state.occupancy, state.robot_pos, state.robot_heading, robot_mask
    )
    return state.replace(overhead_map=overhead, occupancy=occupancy)


# ---------------------------------------------------------------------------
# Planning grids (OccupancyMap.update, envs.py:2452-2459)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("params", "robot_index"))
def planning_grids(params: EnvParams, state: EnvState, robot_index: int):
    """(cspace, cspace_thin, snap_payload) for one robot's occupancy memory."""
    h, w = params.map_shape
    occ = state.occupancy[robot_index]
    rmask = geometry.room_mask(h, w, params.room_length, params.room_width)
    radius_px = params.cspace_radii_px[robot_index]
    cspace = rmask & ~raster_ops.binary_dilate_disk(occ, radius_px)
    thin_r = int(math.ceil(constants.ROBOT_HALF_WIDTH * constants.LOCAL_MAP_PIXELS_PER_METER))
    cspace_thin = ~raster_ops.binary_dilate_disk(occ & rmask, thin_r)
    _, snap_payload = wavefront.multi_source_distance(
        jnp.ones((h, w), bool), cspace, params.num_pass_pairs
    )
    return cspace, cspace_thin, snap_payload


def receptacle_distance_image(params: EnvParams, cspace, snap_payload):
    """Shortest-path distance image (meters) seeded at the receptacle
    (envs.py:2287-2292), with unreachable cells left at the sentinel."""
    h, w = params.map_shape
    rx, ry = params.receptacle_position
    ri, rj = geometry.position_to_pixel(jnp.float32(rx), jnp.float32(ry), h, w)
    ri, rj = wavefront.snap_to_valid(snap_payload, ri, rj)
    d = wavefront.distance_image(cspace, ri, rj, params.num_pass_pairs)
    return d / constants.LOCAL_MAP_PIXELS_PER_METER


def position_distance_image(params: EnvParams, cspace, snap_payload, position):
    h, w = params.map_shape
    i, j = geometry.position_to_pixel(position[0], position[1], h, w)
    i, j = wavefront.snap_to_valid(snap_payload, i, j)
    d = wavefront.distance_image(cspace, i, j, params.num_pass_pairs)
    return d / constants.LOCAL_MAP_PIXELS_PER_METER


# ---------------------------------------------------------------------------
# Intention / history map rendering (envs.py:2301-2346)
# ---------------------------------------------------------------------------

_PTS_PER_SEGMENT = 160


def _polyline_samples(params: EnvParams, points, valid, values_start, values_end):
    """Sample all polyline segments at once.

    points: (K, 2) world; valid: (K,); values per segment (K-1,).
    Returns (ii, jj, vals, ok) flattened over (K-1)*T samples.
    """
    h, w = params.map_shape
    i0, j0 = geometry.position_to_pixel(points[:-1, 0], points[:-1, 1], h, w)
    i1, j1 = geometry.position_to_pixel(points[1:, 0], points[1:, 1], h, w)
    t = jnp.linspace(0.0, 1.0, _PTS_PER_SEGMENT)
    ii = jnp.round(i0[:, None] + t[None] * (i1 - i0)[:, None]).astype(jnp.int32)
    jj = jnp.round(j0[:, None] + t[None] * (j1 - j0)[:, None]).astype(jnp.int32)
    vals = jnp.clip(
        values_start[:, None] + t[None] * (values_end - values_start)[:, None],
        0.0,
        1.0,
    )
    ok = (valid[:-1] & valid[1:])[:, None] & jnp.ones_like(ii, bool)
    return ii.reshape(-1), jj.reshape(-1), vals.reshape(-1), ok.reshape(-1)


def intention_path_points(params: EnvParams, state: EnvState, r):
    """get_intention_path (envs.py:1474-1475): current position + remaining
    waypoints (excluding the final robot-target) + target end-effector
    position, fixed-size with validity mask."""
    k = constants.MAX_WAYPOINTS
    pts = jnp.zeros((k + 1, 2), jnp.float32)
    valid = jnp.zeros((k + 1,), bool)
    pts = pts.at[0].set(state.robot_pos[r])
    valid = valid.at[0].set(True)
    idx = jnp.arange(1, k)  # candidate waypoint slots
    src = jnp.clip(state.wp_index[r] + idx - 1, 0, k - 1)
    use = (state.wp_index[r] + idx - 1) <= (state.num_wp[r] - 2)  # excl. last
    pts = pts.at[1:k].set(state.waypoints[r][src])
    valid = valid.at[1:k].set(use)
    # Compact: shift target_ee into the slot right after the last valid one.
    n_valid = 1 + jnp.sum(use.astype(jnp.int32))
    pts = pts.at[n_valid].set(state.target_ee[r])
    valid = valid.at[n_valid].set(True)
    # Invalidate slots between (they were already False) — ensure monotone
    # validity by construction: use is a prefix mask, so we're fine.
    return pts, valid


def history_path_points(params: EnvParams, state: EnvState, r):
    """get_history_path reversed (envs.py:1477-1478, 2316-2317): current
    position, then traversed waypoints backwards."""
    k = constants.MAX_WAYPOINTS
    pts = jnp.zeros((k + 1, 2), jnp.float32)
    valid = jnp.zeros((k + 1,), bool)
    pts = pts.at[0].set(state.robot_pos[r])
    valid = valid.at[0].set(True)
    idx = jnp.arange(1, k + 1)
    src = jnp.clip(state.wp_index[r] - idx, 0, k - 1)
    use = (state.wp_index[r] - idx) >= 0
    pts = pts.at[1:].set(state.waypoints[r][src])
    valid = valid.at[1:].set(use)
    return pts, valid


def global_intention_or_history_map(params: EnvParams, state: EnvState, self_r, encoding):
    """_create_global_intention_or_history_map (envs.py:2301-2346) for
    observer robot ``self_r`` (may be traced; self/idle robots are masked
    out, envs.py:2303-2305)."""
    h, w = params.map_shape
    g = jnp.zeros((h, w), jnp.float32)
    scale = params.intention_map_scale

    all_ii, all_jj, all_vals, all_ok = [], [], [], []
    # Rotate over the OTHER R-1 robots (traced indices) instead of all R
    # with a self-mask: the observer's slots were guaranteed -inf anyway,
    # so this drops 1/R of the polyline sampling and scatter descriptors
    # bit-exactly (scatter-max is order-independent).
    self_r = jnp.asarray(self_r)
    for k in range(1, params.num_robots):
        r = (self_r + k) % params.num_robots
        active = state.fsm[r] != IDLE  # r != self_r by construction

        if encoding == "circle":
            i, j = geometry.position_to_pixel(state.target_ee[r, 0], state.target_ee[r, 1], h, w)
            g = g.at[i, j].max(jnp.where(active, jnp.float32(scale), 0.0))
            continue

        if encoding in ("ramp", "binary", "line"):
            pts, valid = intention_path_points(params, state, r)
            if encoding == "line":
                # only first and last valid point
                n_valid = jnp.sum(valid.astype(jnp.int32))
                last = pts[n_valid - 1]
                pts = jnp.stack([pts[0], last] + [last] * (pts.shape[0] - 2))
                valid = jnp.zeros_like(valid).at[0].set(True).at[1].set(True)
        elif encoding == "history":
            pts, valid = history_path_points(params, state, r)
        else:
            raise ValueError(encoding)

        # Cumulative scaled path length at each point -> ramp values.
        seg_len = jnp.linalg.norm(pts[1:] - pts[:-1], axis=-1) * scale
        seg_len = jnp.where(valid[1:] & valid[:-1], seg_len, 0.0)
        cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg_len)])
        if encoding in ("ramp", "history"):
            v_start = 1.0 - cum[:-1]
            v_end = 1.0 - cum[1:]
        else:  # binary / line: constant value = scale
            v_start = jnp.full(seg_len.shape, scale)
            v_end = v_start
        ii, jj, vals, ok = _polyline_samples(
            params, pts, valid & active, v_start, v_end
        )
        all_ii.append(ii)
        all_jj.append(jj)
        all_vals.append(vals)
        all_ok.append(ok)

    if all_ii:
        # One scatter-max for every robot's whole path (scatters are
        # expensive; 48 sequential ones dominated the observe cost).  The
        # dedup variant pre-reduces the ~5k samples to their few hundred
        # unique cells before scattering — bit-identical (max commutes) —
        # but its two (P,) sorts lower to slow TPU bitonic networks: the
        # end-to-end bench REGRESSED 3132 -> 2273 steps/s with it on, so
        # it is OPT-IN (SIM_TPU_SCATTER_DEDUP=1) pending a faster sort.
        env_sd = os.environ.get("SIM_TPU_SCATTER_DEDUP")
        scatter = (
            raster_ops.scatter_max_dedup
            if (env_sd is not None and bool(int(env_sd)))
            else raster_ops.scatter_max
        )
        g = scatter(
            g,
            jnp.concatenate(all_ii),
            jnp.concatenate(all_jj),
            jnp.concatenate(all_vals),
            jnp.concatenate(all_ok),
        )

    if params.intention_map_line_thickness > 1:
        g = raster_ops.grey_dilate_disk(g, params.intention_map_line_thickness - 1)
    return g


def intention_channels(params: EnvParams, state: EnvState, self_r):
    """Baseline intention channels (envs.py:2348-2377), ordered nearest ->
    furthest other robot.

    Returns ``(global_chans, local_chans)``: spatial-encoded channels come
    back as GLOBAL (H, W) maps so the caller can fold them into the one
    batched egocentric gather; nonspatial channels are constant 96x96 local
    images appended after the crop.
    """
    h, w = params.map_shape
    n = constants.LOCAL_MAP_PIXEL_WIDTH
    pos = state.robot_pos[self_r]
    heading = state.robot_heading[self_r]
    dists = jnp.linalg.norm(state.robot_pos - pos[None], axis=-1)
    # Self sorts first (distance exactly 0); channels are the other robots
    # nearest-first (envs.py:2350-2354).
    order = jnp.argsort(dists)

    glob_chans = []
    chans = []
    # Iterate over rank slots; skip rank 0 (self, distance 0).
    for rank in range(1, params.num_robots):
        r = order[rank]
        active = state.fsm[r] != IDLE
        tgt = state.target_ee[r]
        if params.intention_channel_encoding == "spatial":
            g = jnp.zeros((h, w), jnp.float32)
            i, j = geometry.position_to_pixel(tgt[0], tgt[1], h, w)
            g = g.at[i, j].set(jnp.where(active, params.intention_map_scale, 0.0))
            g = raster_ops.grey_dilate_disk(g, params.intention_map_line_thickness - 1)
            glob_chans.append(g)
        else:  # nonspatial (envs.py:2368-2375)
            d = jnp.linalg.norm(tgt - pos)
            theta = heading - jnp.arctan2(tgt[1] - pos[1], tgt[0] - pos[0])
            rel = jnp.stack([d * jnp.sin(theta), d * jnp.cos(theta)])
            rel = jnp.where(active, rel, jnp.zeros(2))
            for coord in (rel[0], rel[1]):
                chans.append(
                    params.intention_channel_nonspatial_scale
                    * coord
                    * jnp.ones((n, n), jnp.float32)
                )
    return glob_chans, chans


# ---------------------------------------------------------------------------
# Distance-to-receptacle (straight-line variant, envs.py:2277-2285)
# ---------------------------------------------------------------------------

def euclidean_receptacle_map(params: EnvParams):
    h, w = params.map_shape
    xs, ys = geometry.pixel_centers(h, w)
    rx, ry = params.receptacle_position
    d = jnp.sqrt((xs - rx) ** 2 + (ys - ry) ** 2)
    return d * params.distance_to_receptacle_map_scale


# ---------------------------------------------------------------------------
# State assembly (Mapper.get_state, envs.py:2067-2184)
# ---------------------------------------------------------------------------

def build_state(params: EnvParams, state: EnvState, robot_index, sp_recep_img, sp_self_img):
    """Observation stack for one robot. robot_index must be a static int.

    sp_recep_img / sp_self_img: precomputed shortest-path distance images in
    meters with BIG sentinels (pass None for disabled channels).
    """
    r = robot_index
    pos = state.robot_pos[r]
    heading = state.robot_heading[r]
    # Global (H, W) channel images, cropped together in ONE egocentric gather
    # (gathers are latency-bound per index on TPU; batching the channel dim
    # into contiguous trailing slices divides the index count by C).
    glob_channels = []
    subtract_min = []  # static per-channel: local crop gets `- min` applied

    # Overhead map: persistent seg + live robot stamps (envs.py:2243-2248)
    seg_overlay, robot_map_g = robot_seg_overlay(params, state)
    overhead = state.overhead_map[r]
    overhead_f = jnp.where(
        seg_overlay > 0, seg_overlay.astype(jnp.float32), overhead.astype(jnp.float32)
    ) / constants.SEG_DIVISOR
    glob_channels.append(overhead_f)
    subtract_min.append(False)

    if params.use_robot_map:
        glob_channels.append(robot_map_g)
        subtract_min.append(False)

    if params.use_distance_to_receptacle_map:
        glob_channels.append(euclidean_receptacle_map(params))
        subtract_min.append(True)

    if params.use_shortest_path_to_receptacle_map:
        img = wavefront.finite_or(sp_recep_img) * params.shortest_path_map_scale
        glob_channels.append(img)
        subtract_min.append(True)

    if params.use_shortest_path_map:
        img = wavefront.finite_or(sp_self_img) * params.shortest_path_map_scale
        glob_channels.append(img)
        subtract_min.append(True)

    if params.use_history_map:
        g = global_intention_or_history_map(params, state, r, "history")
        glob_channels.append(g)
        subtract_min.append(False)

    if params.use_intention_map:
        g = global_intention_or_history_map(params, state, r, params.intention_map_encoding)
        glob_channels.append(g)
        subtract_min.append(False)

    local_channels = []
    if params.use_intention_channels:
        ic_glob, ic_local = intention_channels(params, state, r)
        glob_channels.extend(ic_glob)
        subtract_min.extend([False] * len(ic_glob))
        local_channels = ic_local

    stacked = jnp.stack(
        [g.astype(jnp.float32) for g in glob_channels], axis=-1
    )
    # Fused Pallas crop on TPU (identical cells + bf16 rounding, see
    # ops/pallas_crop.py); the one-hot-matmul XLA path is the fallback and
    # the CPU-mesh test path.  SIM_TPU_PALLAS_CROP=0 is the kill switch
    # (same contract as SIM_TPU_PALLAS_SUBSTEP).
    env_pc = os.environ.get("SIM_TPU_PALLAS_CROP")
    use_pallas = (
        jax.default_backend() == "tpu" if env_pc is None else bool(int(env_pc))
    )
    if use_pallas and pallas_crop.supports(stacked.shape):
        local = pallas_crop.extract_local_maps_pallas(stacked, pos, heading)
    else:
        local = raster_ops.extract_local_maps_mxu(stacked, pos, heading)  # (96, 96, C)
    if any(subtract_min):
        mins = jnp.min(local, axis=(0, 1), keepdims=True)
        mask = np.asarray(subtract_min)[None, None, :]
        local = local - jnp.where(mask, mins, 0.0)
    if local_channels:
        local = jnp.concatenate(
            [local] + [c[..., None] for c in local_channels], axis=-1
        )
    return local.astype(jnp.float32)
