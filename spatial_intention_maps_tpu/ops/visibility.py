"""Analytic visibility — the TPU-native replacement for the PyBullet camera
renders (SURVEY N3).

The reference renders depth+segmentation and splats the unprojected point
cloud into per-robot overhead/occupancy maps (envs.py:1918-1954, 2053-2065).
Since the consumed product is a top-down segmentation, we compute the visible
ground footprint analytically:

* forward-facing camera (partial observations, the default;
  envs.py:1979-2007): a 90 deg horizontal FOV wedge from the camera position,
  ground range [h*tan(30deg), sqrt(FAR^2-h^2)], occluded by obstacles via an
  analytic polar raycast against the layout rects / corner fillets.
  Obstacle cells are visible from range 0 (walls are taller than the
  camera).
* overhead camera (envs.py:1964-1977): a robot-heading-aligned square of
  half-width HEIGHT*tan(FOV/2) centered on the robot, no occlusion.

Divergence from the reference (documented): tall objects are not smeared
outward by perspective, and cubes/robots do not occlude (only walls do).
"""

import math

import jax
import jax.numpy as jnp

from .. import constants


def _safe_inv(v):
    return 1.0 / jnp.where(jnp.abs(v) < 1e-9, jnp.where(v >= 0, 1e-9, -1e-9), v)


def _slab_entry(t1, t2, t3, t4):
    """Ray-AABB slab entry distance, inf on miss. Args: (..., N) per-axis
    boundary parameters."""
    tmin = jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(t3, t4))
    tmax = jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(t3, t4))
    hit = tmax >= jnp.maximum(tmin, 0.0)
    return jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)


def ray_first_hit(rects, corners, ox, oy, angles, max_d):
    """(K,) distance to the first wall rect / corner fillet along each ray.

    Pure analytic slab tests against the layout geometry — replaces the
    raster ray march, whose per-sample map gathers (rays x steps x robots x
    envs, ~14 ns each) dominated the map-refresh cost.  Corner fillets are
    approximated by their bounding rotated square (the rounded notch is a
    sub-pixel-scale visibility difference).
    """
    dx, dy = jnp.cos(angles), jnp.sin(angles)          # (K,)
    ix, iy = _safe_inv(dx)[:, None], _safe_inv(dy)[:, None]
    entry = _slab_entry(
        (rects[:, 0] - rects[:, 2] - ox) * ix,
        (rects[:, 0] + rects[:, 2] - ox) * ix,
        (rects[:, 1] - rects[:, 3] - oy) * iy,
        (rects[:, 1] + rects[:, 3] - oy) * iy,
    )                                                   # (K, NR)
    first = jnp.min(entry, axis=1)
    if corners.shape[0]:
        # Stored corner = adjusted mesh origin; apex per _point_fillet_sd.
        w = constants.ROUNDED_CORNER_WIDTH
        off = w / math.sqrt(2)
        ch, sh = jnp.cos(corners[:, 2]), jnp.sin(corners[:, 2])
        ax = corners[:, 0] - off * jnp.cos(corners[:, 2] - math.radians(45))
        ay = corners[:, 1] - off * jnp.sin(corners[:, 2] - math.radians(45))
        # Ray in each corner's local frame; square spans lx in [0,w],
        # ly in [-w,0].
        oxl = ch * (ox - ax) + sh * (oy - ay)           # (NC,)
        oyl = -sh * (ox - ax) + ch * (oy - ay)
        dxl = ch[None] * dx[:, None] + sh[None] * dy[:, None]   # (K, NC)
        dyl = -sh[None] * dx[:, None] + ch[None] * dy[:, None]
        ixl, iyl = _safe_inv(dxl), _safe_inv(dyl)
        entry_c = _slab_entry(
            (0.0 - oxl) * ixl, (w - oxl) * ixl,
            (-w - oyl) * iyl, (0.0 - oyl) * iyl,
        )
        first = jnp.minimum(first, jnp.min(entry_c, axis=1))
    return jnp.minimum(first, max_d)


def forward_visible_mask(rects, corners, wall_map, position, heading):
    """Bool (H, W): cells visible to the forward-facing camera.

    Analytic, scatter- and gather-free: per-ray first-blocker distances come
    from slab tests against the layout rects/corners, then every map pixel
    tests densely against its ray bin — wedge membership, ground range, and
    first-blocker occlusion.  Wall pixels are visible from range 0 (walls
    are taller than the camera); floor/cube/receptacle pixels only beyond
    the near-ground limit (envs.py:1979-2007 geometry).
    """
    h, w = wall_map.shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    n_rays = constants.NUM_VIS_RAYS

    cam_x = position[0] + constants.FORWARD_CAMERA_OFFSET * jnp.cos(heading)
    cam_y = position[1] + constants.FORWARD_CAMERA_OFFSET * jnp.sin(heading)

    half_fov = constants.FORWARD_CAMERA_HALF_FOV_H
    max_d = constants.FORWARD_VISIBLE_MAX_DIST
    min_d = constants.FORWARD_VISIBLE_MIN_DIST

    angles = heading + jnp.linspace(-half_fov, half_fov, n_rays)
    first_hit = ray_first_hit(rects, corners, cam_x, cam_y, angles, 1e9)

    # Dense per-pixel test.  The per-bin blocker lookup is a one-hot matmul
    # (MXU) — a plain table gather per pixel is ~14 ns/element on the VPU and
    # dominated the map-refresh cost.
    from ..envs.geometry import pixel_centers

    xs, ys = pixel_centers(h, w)
    rx = xs - cam_x
    ry = ys - cam_y
    dist = jnp.sqrt(rx * rx + ry * ry)
    ang = jnp.arctan2(ry, rx)
    rel = jnp.mod(ang - (heading - half_fov) + jnp.pi, 2 * jnp.pi) - jnp.pi
    in_wedge = (rel >= 0) & (rel <= 2 * half_fov)
    bin_idx = jnp.clip(
        jnp.round(rel / (2 * half_fov) * (n_rays - 1)).astype(jnp.int32), 0, n_rays - 1
    )
    onehot = (
        bin_idx[..., None] == jnp.arange(n_rays, dtype=jnp.int32)
    ).astype(jnp.float32)
    blocker = jnp.einsum(
        "hwk,k->hw", onehot, jnp.minimum(first_hit, 1e9).astype(jnp.float32),
        precision=jax.lax.Precision.DEFAULT,
    )
    px_m = 1.0 / ppm
    not_occluded = dist <= blocker + 1.5 * px_m
    in_range = dist <= max_d
    near_ok = (dist >= min_d) | wall_map
    return in_wedge & in_range & near_ok & not_occluded


def overhead_visible_mask(wall_map, position, heading):
    """Bool (H, W): the overhead camera's rotated-square ground footprint."""
    from ..envs.geometry import pixel_centers

    h, w = wall_map.shape
    xs, ys = pixel_centers(h, w)
    dx = xs - position[0]
    dy = ys - position[1]
    ch, sh = jnp.cos(heading), jnp.sin(heading)
    lx = dx * ch + dy * sh
    ly = -dx * sh + dy * ch
    half = constants.OVERHEAD_VISIBLE_HALF_WIDTH
    return (jnp.abs(lx) <= half) & (jnp.abs(ly) <= half)


def visible_mask(rects, corners, wall_map, position, heading,
                 partial_observations: bool):
    if partial_observations:
        return forward_visible_mask(rects, corners, wall_map, position, heading)
    return overhead_visible_mask(wall_map, position, heading)
