"""Analytic visibility — the TPU-native replacement for the PyBullet camera
renders (SURVEY N3).

The reference renders depth+segmentation and splats the unprojected point
cloud into per-robot overhead/occupancy maps (envs.py:1918-1954, 2053-2065).
Since the consumed product is a top-down segmentation, we compute the visible
ground footprint analytically:

* forward-facing camera (partial observations, the default;
  envs.py:1979-2007): a 90 deg horizontal FOV wedge from the camera position,
  ground range [h*tan(30deg), sqrt(FAR^2-h^2)], occluded by obstacles via a
  polar raycast against the wall map.  Obstacle cells are visible from range
  0 (walls are taller than the camera).
* overhead camera (envs.py:1964-1977): a robot-heading-aligned square of
  half-width HEIGHT*tan(FOV/2) centered on the robot, no occlusion.

Divergence from the reference (documented): tall objects are not smeared
outward by perspective, and cubes/robots do not occlude (only walls do).
"""

import math

import jax
import jax.numpy as jnp

from .. import constants


def forward_visible_mask(wall_map, position, heading):
    """Bool (H, W): cells visible to the forward-facing camera.

    Scatter-free formulation (scatters dominated the map-refresh cost): a
    polar ray march finds the first-blocker distance per ray (gathers only),
    then every map pixel tests densely against its ray bin — wedge membership,
    ground range, and first-blocker occlusion.  Wall pixels are visible from
    range 0 (walls are taller than the camera); floor/cube/receptacle pixels
    only beyond the near-ground limit (envs.py:1979-2007 geometry).
    """
    h, w = wall_map.shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    n_rays = constants.NUM_VIS_RAYS
    n_steps = constants.NUM_VIS_STEPS

    cam_x = position[0] + constants.FORWARD_CAMERA_OFFSET * jnp.cos(heading)
    cam_y = position[1] + constants.FORWARD_CAMERA_OFFSET * jnp.sin(heading)

    half_fov = constants.FORWARD_CAMERA_HALF_FOV_H
    max_d = constants.FORWARD_VISIBLE_MAX_DIST
    min_d = constants.FORWARD_VISIBLE_MIN_DIST

    # Ray march: first blocker distance per ray.
    angles = heading + jnp.linspace(-half_fov, half_fov, n_rays)
    dists = jnp.linspace(0.0, max_d, n_steps)
    px = cam_x + jnp.cos(angles)[:, None] * dists[None, :]
    py = cam_y + jnp.sin(angles)[:, None] * dists[None, :]
    gi = jnp.clip(jnp.floor(h / 2 - py * ppm).astype(jnp.int32), 0, h - 1)
    gj = jnp.clip(jnp.floor(w / 2 + px * ppm).astype(jnp.int32), 0, w - 1)
    hit = wall_map[gi, gj]
    first_hit = jnp.min(jnp.where(hit, dists[None, :], jnp.inf), axis=1)  # (n_rays,)

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


def visible_mask(wall_map, position, heading, partial_observations: bool):
    if partial_observations:
        return forward_visible_mask(wall_map, position, heading)
    return overhead_visible_mask(wall_map, position, heading)
