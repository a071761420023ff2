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

    Polar raycast: NUM_VIS_RAYS rays over the 90 deg wedge, NUM_VIS_STEPS
    samples (~1 px apart) along each.  A wall cell blocks everything beyond
    it but is itself visible; floor cells are visible only beyond the
    near-ground limit.
    """
    h, w = wall_map.shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    n_rays = constants.NUM_VIS_RAYS
    n_steps = constants.NUM_VIS_STEPS

    cam_x = position[0] + constants.FORWARD_CAMERA_OFFSET * jnp.cos(heading)
    cam_y = position[1] + constants.FORWARD_CAMERA_OFFSET * jnp.sin(heading)

    half_fov = constants.FORWARD_CAMERA_HALF_FOV_H
    angles = heading + jnp.linspace(-half_fov, half_fov, n_rays)
    max_d = constants.FORWARD_VISIBLE_MAX_DIST
    min_d = constants.FORWARD_VISIBLE_MIN_DIST
    dists = jnp.linspace(0.0, max_d, n_steps)

    # (n_rays, n_steps) sample points
    px = cam_x + jnp.cos(angles)[:, None] * dists[None, :]
    py = cam_y + jnp.sin(angles)[:, None] * dists[None, :]
    gi = jnp.clip(jnp.floor(h / 2 - py * ppm).astype(jnp.int32), 0, h - 1)
    gj = jnp.clip(jnp.floor(w / 2 + px * ppm).astype(jnp.int32), 0, w - 1)

    hit = wall_map[gi, gj]
    # blocked_before[k] = a wall was hit strictly before sample k on this ray
    blocked_before = jnp.cumsum(hit.astype(jnp.int32), axis=1) - hit.astype(jnp.int32) > 0
    is_floor_range = dists[None, :] >= min_d
    visible = (~blocked_before) & (hit | is_floor_range)

    mask = jnp.zeros((h, w), bool)
    mask = mask.at[gi.reshape(-1), gj.reshape(-1)].max(visible.reshape(-1))
    return mask


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
