"""Perception parity tests: crop-rotate vs scipy, seg composition,
intention rendering properties."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from spatial_intention_maps_tpu import constants
from spatial_intention_maps_tpu.envs import geometry
from spatial_intention_maps_tpu.ops import raster_ops

N = constants.LOCAL_MAP_PIXEL_WIDTH


def reference_local_map(global_map, position, heading):
    """The reference pipeline: integer crop -> scipy rotate(order=0) ->
    center crop (envs.py:2199-2210)."""
    from scipy.ndimage import rotate as rotate_image

    h, w = global_map.shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    crop_width = constants.round_up_to_even(math.sqrt(2) * N)
    rotation_angle = 90 - math.degrees(heading)
    pixel_i = int(np.clip(np.floor(h / 2 - position[1] * ppm), 0, h - 1))
    pixel_j = int(np.clip(np.floor(w / 2 + position[0] * ppm), 0, w - 1))
    crop = global_map[
        pixel_i - crop_width // 2 : pixel_i + crop_width // 2,
        pixel_j - crop_width // 2 : pixel_j + crop_width // 2,
    ]
    rotated = rotate_image(crop, rotation_angle, order=0)
    return rotated[
        rotated.shape[0] // 2 - N // 2 : rotated.shape[0] // 2 + N // 2,
        rotated.shape[1] // 2 - N // 2 : rotated.shape[1] // 2 + N // 2,
    ]


def test_crop_rotate_vs_scipy():
    # Blocky map (like real seg maps): nearest-neighbour resampling of the
    # two pipelines may differ by sub-pixel rounding at region boundaries,
    # but regions must agree.
    rng = np.random.RandomState(0)
    # Synthetic canvas big enough for scipy's sqrt(2)*96 crop window around
    # the test positions (the production canvas is compact and relies on
    # clamped gathers instead; this test checks the resampling math only).
    h, w = 224, 240
    blocks = (rng.rand(h // 16 + 1, w // 16 + 1) * 8).astype(np.int32)
    gmap = np.kron(blocks, np.ones((16, 16)))[:h, :w].astype(np.float32) / 8
    extract = jax.jit(raster_ops.extract_local_map)
    for heading in [math.pi / 2, -1.1, 2.6]:
        for pos in [(0.21, -0.13)]:
            ref = reference_local_map(gmap, pos, heading)
            got = np.asarray(
                extract(jnp.asarray(gmap), jnp.asarray(pos), jnp.asarray(heading))
            )
            agree = np.mean(ref == got)
            if abs(heading - math.pi / 2) < 1e-9:
                assert agree > 0.999, agree
            else:
                # Region interiors must agree; NN rounding differs along
                # region boundaries (sub-pixel grid offset).
                assert agree > 0.88, (heading, pos, agree)


def test_local_map_orientation():
    """The robot faces 'up' in the local map: content ahead of the robot
    appears in the top half."""
    h, w = constants.global_map_shape(1.0, 0.5)
    gmap = np.zeros((h, w), np.float32)
    # Put a blob 0.2 m to the +x of the origin.
    i, j = geometry.position_to_pixel(jnp.float32(0.2), jnp.float32(0.0), h, w)
    gmap[int(i) - 2 : int(i) + 3, int(j) - 2 : int(j) + 3] = 1.0
    # Robot at origin facing +x: blob should be ahead = top of local map.
    local = np.asarray(
        raster_ops.extract_local_map(jnp.asarray(gmap), jnp.zeros(2), jnp.float32(0.0))
    )
    ii, jj = np.argwhere(local > 0.5).mean(axis=0)
    assert ii < N / 2 - 10  # top half
    assert abs(jj - N / 2) < 3  # centered horizontally


def test_room_rasterization():
    h, w = constants.global_map_shape(1.0, 0.5)
    layout = geometry.sample_layout(
        jax.random.PRNGKey(0), "small_empty", 1.0, 0.5, True
    )
    wall, seg = geometry.rasterize_layout(layout, h, w, 1.0, 0.5, (0.425, 0.175))
    wall = np.asarray(wall)
    seg = np.asarray(seg)
    # Center of the room is free floor.
    assert not wall[h // 2, w // 2]
    assert seg[h // 2, w // 2] == constants.SEG_FLOOR
    # Receptacle corner is receptacle (not covered by the skipped fillet).
    i, j = geometry.position_to_pixel(jnp.float32(0.425), jnp.float32(0.175), h, w)
    assert seg[int(i), int(j)] == constants.SEG_RECEPTACLE
    # Outside the room is obstacle (thick walls).
    assert wall[2, 2] and seg[2, 2] == constants.SEG_OBSTACLE
    # Non-receptacle corners are filled by fillets: a point 2 cm diagonal
    # inside the bottom-left corner lies in the fillet.
    i, j = geometry.position_to_pixel(jnp.float32(-0.49), jnp.float32(-0.24), h, w)
    assert wall[int(i), int(j)]


def test_dilation_matches_disk():
    rng = np.random.RandomState(1)
    m = rng.rand(40, 50) > 0.97
    for r in [1, 3, 5, 6]:
        got = np.asarray(raster_ops.binary_dilate_disk(jnp.asarray(m), r))
        exp = np.zeros_like(m)
        idx = np.argwhere(m)
        for i, j in idx:
            for di, dj in raster_ops.disk_offsets(r):
                ii, jj = i + di, j + dj
                if 0 <= ii < 40 and 0 <= jj < 50:
                    exp[ii, jj] = True
        np.testing.assert_array_equal(got, exp)


def test_forward_visibility_wedge():
    """Dense FOV visibility: wedge membership, near/far limits, occlusion."""
    import math as m

    import jax.numpy as jnp

    from spatial_intention_maps_tpu.ops import visibility

    h, w = constants.global_map_shape(1.0, 1.0)
    # A divider-like wall segment 0.4 m ahead of the camera (robot at origin
    # facing +x): x in [0.4, 0.45], y in [-0.1, 0.1].  The analytic raycast
    # takes the layout rects; the raster only feeds the walls-visible-at-
    # range-0 term.
    rects = jnp.asarray([[0.425, 0.0, 0.025, 0.1]], jnp.float32)
    corners = jnp.zeros((0, 3), jnp.float32)
    wall = np.zeros((h, w), bool)
    i, j = geometry.position_to_pixel(jnp.float32(0.4), jnp.float32(0.0), h, w)
    wall[int(i) - 10 : int(i) + 10, int(j) : int(j) + 5] = True

    mask = np.asarray(
        visibility.forward_visible_mask(
            rects, corners, jnp.asarray(wall), jnp.zeros(2), jnp.float32(0.0)
        )
    )

    def vis_at(x, y):
        ii, jj = geometry.position_to_pixel(jnp.float32(x), jnp.float32(y), h, w)
        return bool(mask[int(ii), int(jj)])

    assert vis_at(0.3, 0.0)        # in front, before the wall
    assert vis_at(0.4, 0.0)        # the wall face itself
    assert not vis_at(0.6, 0.0)    # occluded behind the wall
    assert vis_at(0.6, 0.4)        # in the wedge, past the wall's extent
    assert not vis_at(-0.2, 0.0)   # behind the robot
    assert not vis_at(0.2, 0.3)    # outside the 90-degree wedge (atan2 > 45)
    assert not vis_at(0.01, 0.0)   # inside the near-ground blind zone
