"""Procedural room layouts as fixed-shape obstacle arrays.

Re-derives the reference's six layouts + ``_norand`` variants
(envs.py:515-649) as jittable functions of a PRNG key.  A layout is a fixed
number of axis-aligned rectangular obstacles (walls + dividers) plus a fixed
number of rounded-corner fillets, so shapes are static per ``env_name`` and a
fresh layout can be sampled inside a jitted auto-reset.

Obstacle representation:
  * ``rects``   — (N_RECT, 4) float32: cx, cy, half_x, half_y
  * ``corners`` — (N_CORNER, 3) float32: x, y, heading (radians).  A corner
    fillet occupies the square from its apex toward
    (cos(h-45deg), sin(h-45deg)) minus the quarter-disc of radius
    ROUNDED_CORNER_WIDTH centered at the far corner (assets/rounded_corner.obj
    footprint; placement math envs.py:598-647).
  * ``spawn bounds`` — (x_min, x_max, y_min, y_max) with +-inf for unset
    (envs.py:527-528, 539-540: divider layouts restrict robot / cube spawns).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from .. import constants

INF = jnp.inf

DIVIDER_WIDTH = 0.05
SMALL_DIVIDER_OPENING = 0.16
TUNNEL_WIDTH = 0.18
ROOMS_OPENING = 0.18

ENV_NAMES = (
    "small_empty",
    "small_divider",
    "small_divider_norand",
    "large_empty",
    "large_doors",
    "large_doors_norand",
    "large_tunnels",
    "large_tunnels_norand",
    "large_rooms",
    "large_rooms_norand",
)


def wall_rects(room_length, room_width):
    """The four boundary walls (envs.py:554-562), full thickness so the padded
    map margin is solid obstacle."""
    t = constants.WALL_THICKNESS
    l, w = room_length, room_width
    return [
        (-l / 2 - t / 2, 0.0, t / 2, w / 2),
        (l / 2 + t / 2, 0.0, t / 2, w / 2),
        (0.0, -w / 2 - t / 2, l / 2 + t, t / 2),
        (0.0, w / 2 + t / 2, l / 2 + t, t / 2),
    ]


def _corner(position, heading_deg):
    return (position[0], position[1], math.radians(heading_deg))


def _adjust_corner(x, y, heading_rad):
    """Corner apex -> mesh origin offset (envs.py:610-613)."""
    offset = constants.ROUNDED_CORNER_WIDTH / math.sqrt(2)
    return (
        x + offset * jnp.cos(heading_rad - math.radians(45)),
        y + offset * jnp.sin(heading_rad - math.radians(45)),
        heading_rad,
    )


def room_corner_list(room_length, room_width, has_receptacle):
    """Rounded corners at the 4 room corners; the receptacle corner (top
    right) is skipped when a receptacle exists (envs.py:603-613)."""
    l, w = room_length, room_width
    corners = []
    for i, (x, y) in enumerate([(-l / 2, w / 2), (l / 2, w / 2), (l / 2, -w / 2), (-l / 2, -w / 2)]):
        if has_receptacle and i == 1:
            continue
        heading = math.radians(-i * 90)
        corners.append(_adjust_corner(x, y, heading))
    return corners


def _num_obstacles(env_name):
    """(num divider rects, num junction corners) per layout."""
    base = env_name.replace("_norand", "")
    return {
        "small_empty": (0, 0),
        "small_divider": (1, 0),
        "large_empty": (0, 0),
        "large_doors": (3, 4),
        "large_tunnels": (3, 4),
        "large_rooms": (3, 4),
    }[base]


def layout_shapes(env_name, has_receptacle):
    """Static (N_RECT, N_CORNER) for the layout arrays."""
    n_div, n_jc = _num_obstacles(env_name)
    n_room_corners = 3 if has_receptacle else 4
    return 4 + n_div, n_room_corners + n_jc


def sample_layout(key, env_name, room_length, room_width, has_receptacle):
    """Sample a layout. Returns (rects, corners, robot_bounds, cube_bounds).

    jit-safe: all shapes depend only on the static arguments.
    """
    base = env_name.replace("_norand", "")
    rand = not env_name.endswith("_norand")

    rects = [jnp.asarray(r, jnp.float32) for r in wall_rects(room_length, room_width)]
    corners = [
        jnp.asarray(c, jnp.float32) for c in room_corner_list(room_length, room_width, has_receptacle)
    ]
    robot_bounds = [-INF, INF, -INF, INF]
    cube_bounds = [-INF, INF, -INF, INF]

    def u(key, lo, hi):
        return jax.random.uniform(key, (), jnp.float32, lo, hi)

    k1, k2 = jax.random.split(key)

    if base in ("small_empty", "large_empty"):
        pass

    elif base == "small_divider":
        # envs.py:523-528, 568-572
        x_offset = u(k1, -0.1, 0.1) if rand else jnp.float32(0.0)
        half_y = (room_width - 2 * SMALL_DIVIDER_OPENING) / 2
        rects.append(jnp.stack([x_offset, jnp.float32(0.0), jnp.float32(DIVIDER_WIDTH / 2), jnp.float32(half_y)]))
        robot_bounds[0] = x_offset + DIVIDER_WIDTH / 2
        cube_bounds[1] = x_offset - DIVIDER_WIDTH / 2

    elif base in ("large_doors", "large_tunnels"):
        # envs.py:530-540, 577-587
        tunnel_length = 0.05 if base == "large_doors" else 0.25
        if rand:
            x_offset = u(k1, -0.05, 0.05)
            y_offset = u(k2, -0.1, 0.1) if base == "large_doors" else u(k2, -0.05, 0.05)
        else:
            x_offset = jnp.float32(0.0)
            y_offset = jnp.float32(0.0)
        tunnel_x = (room_length + TUNNEL_WIDTH) / 6 + x_offset
        outer_len = room_length / 2 - tunnel_x - TUNNEL_WIDTH / 2
        divider_x = room_length / 2 - outer_len / 2
        middle_len = 2 * (tunnel_x - TUNNEL_WIDTH / 2)
        tl2 = jnp.float32(tunnel_length / 2)
        rects.append(jnp.stack([-divider_x, y_offset, outer_len / 2, tl2]))
        rects.append(jnp.stack([jnp.float32(0.0), y_offset, middle_len / 2, tl2]))
        rects.append(jnp.stack([divider_x, y_offset, outer_len / 2, tl2]))
        robot_bounds[2] = y_offset + tunnel_length / 2
        cube_bounds[3] = y_offset - tunnel_length / 2
        # Junction corners (envs.py:616-646): left divider touches -L/2,
        # right divider touches +L/2.
        l2 = room_length / 2
        for pos, hdeg in [
            ((-l2, y_offset - tl2), 0.0), ((-l2, y_offset + tl2), 90.0),
            ((l2, y_offset - tl2), -90.0), ((l2, y_offset + tl2), 180.0),
        ]:
            c = _adjust_corner(pos[0], pos[1], math.radians(hdeg))
            corners.append(jnp.stack([jnp.float32(c[0]), jnp.float32(c[1]), jnp.float32(c[2])]))

    elif base == "large_rooms":
        # envs.py:542-552, 589-593
        if rand:
            x_offset = u(k1, -0.05, 0.05)
            y_offset = u(k2, -0.05, 0.05)
        else:
            x_offset = jnp.float32(0.0)
            y_offset = jnp.float32(0.0)
        dw = DIVIDER_WIDTH
        divider_len = room_width / 2 - ROOMS_OPENING - dw / 2
        top_len = divider_len - y_offset
        bot_len = divider_len + y_offset
        top_y = room_width / 2 - ROOMS_OPENING - top_len / 2
        bot_y = -room_width / 2 + ROOMS_OPENING + bot_len / 2
        rects.append(jnp.stack([jnp.float32(0.0), y_offset,
                                jnp.float32((room_length - 2 * ROOMS_OPENING) / 2), jnp.float32(dw / 2)]))
        rects.append(jnp.stack([x_offset, top_y, jnp.float32(dw / 2), top_len / 2]))
        rects.append(jnp.stack([x_offset, bot_y, jnp.float32(dw / 2), bot_len / 2]))
        # snap_y junction corners (envs.py:634-637): the vertical dividers meet
        # the horizontal one at snap_y = y_offset +- dw/2.
        snap_top = y_offset + dw / 2  # below the top divider => headings [-90, 0]
        snap_bot = y_offset - dw / 2  # above the bottom divider => headings [180, 90]
        for pos, hdeg in [
            ((x_offset - dw / 2, snap_top), -90.0), ((x_offset + dw / 2, snap_top), 0.0),
            ((x_offset - dw / 2, snap_bot), 180.0), ((x_offset + dw / 2, snap_bot), 90.0),
        ]:
            c = _adjust_corner(pos[0], pos[1], math.radians(hdeg))
            corners.append(jnp.stack([jnp.float32(c[0]), jnp.float32(c[1]), jnp.float32(c[2])]))

    else:
        raise ValueError(env_name)

    rects = jnp.stack([jnp.asarray(r, jnp.float32) for r in rects])
    corners = (
        jnp.stack([jnp.asarray(c, jnp.float32) for c in corners])
        if corners else jnp.zeros((0, 3), jnp.float32)
    )
    return (
        rects,
        corners,
        jnp.asarray(robot_bounds, jnp.float32),
        jnp.asarray(cube_bounds, jnp.float32),
    )


# ---------------------------------------------------------------------------
# Rasterization
# ---------------------------------------------------------------------------

def pixel_centers(h, w):
    """World (x, y) of each pixel center for an (h, w) padded global map
    (pixel_indices_to_position, envs.py:2398-2402)."""
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    i = jnp.arange(h, dtype=jnp.float32)
    j = jnp.arange(w, dtype=jnp.float32)
    y = (h / 2 - (i + 0.5)) / ppm
    x = ((j + 0.5) - w / 2) / ppm
    return jnp.meshgrid(x, y)  # xs (h, w), ys (h, w)


def position_to_pixel(x, y, h, w):
    """position_to_pixel_indices (envs.py:2390-2396)."""
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    i = jnp.clip(jnp.floor(h / 2 - y * ppm).astype(jnp.int32), 0, h - 1)
    j = jnp.clip(jnp.floor(w / 2 + x * ppm).astype(jnp.int32), 0, w - 1)
    return i, j


def pixel_to_position(i, j, h, w):
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    x = ((j + 0.5) - w / 2) / ppm
    y = (h / 2 - (i + 0.5)) / ppm
    return x, y


def rects_mask(xs, ys, rects):
    """Union of axis-aligned rectangles; xs/ys (h, w), rects (N, 4)."""
    cx, cy, hx, hy = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    inside = (
        (jnp.abs(xs[..., None] - cx) <= hx) & (jnp.abs(ys[..., None] - cy) <= hy)
    )
    return jnp.any(inside, axis=-1)


def corners_mask(xs, ys, corners):
    """Union of rounded-corner fillets.

    In the corner frame (apex at the corner position, heading h): the solid
    fills the square extending toward direction (h - 45deg) of side
    ROUNDED_CORNER_WIDTH, minus the quarter-disc of that radius centered at
    the diagonally-opposite square corner (assets/rounded_corner.obj).
    """
    if corners.shape[0] == 0:
        return jnp.zeros(xs.shape, bool)
    w = constants.ROUNDED_CORNER_WIDTH
    cx, cy, h = corners[:, 0], corners[:, 1], corners[:, 2]
    # The stored position is the mesh origin = apex + (w/sqrt2)*dir(h-45deg);
    # recover the apex and the arc center (apex + 2*(origin-apex)).
    off = w / math.sqrt(2)
    ax = cx - off * jnp.cos(h - math.radians(45))
    ay = cy - off * jnp.sin(h - math.radians(45))
    ccx = 2 * cx - ax
    ccy = 2 * cy - ay
    # Rotate pixel into the corner's frame: square spans [0,w] along
    # u = dir(h) rotated axes. Use axis directions e1 = dir(h - 90deg)?  The
    # square is axis-aligned in the frame rotated by h: local point
    # p = R(-h) (q - apex); square occupies x' in [0, w], y' in [-w, 0]
    # (heading 0 fills to the right and downward of the apex).
    dx = xs[..., None] - ax
    dy = ys[..., None] - ay
    ch, sh = jnp.cos(h), jnp.sin(h)
    lx = ch * dx + sh * dy
    ly = -sh * dx + ch * dy
    in_square = (lx >= 0) & (lx <= w) & (ly >= -w) & (ly <= 0)
    out_disc = (xs[..., None] - ccx) ** 2 + (ys[..., None] - ccy) ** 2 >= w ** 2
    return jnp.any(in_square & out_disc, axis=-1)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def rasterize_layout(layout, h, w, room_length, room_width, receptacle_position=None):
    """Rasterize a sampled layout into (wall_map, seg_base).

    wall_map — bool (h, w): obstacle footprint (walls+dividers+corners).
    seg_base — uint8 (h, w): analytic top-down segmentation without cubes or
    robots: SEG_OBSTACLE on obstacles, SEG_RECEPTACLE in the receptacle
    square, SEG_FLOOR elsewhere (Camera seg construction, envs.py:1946-1952;
    anything beyond the room interior is solid wall so the padded margin reads
    as obstacle).
    """
    rects, corners, _, _ = layout
    xs, ys = pixel_centers(h, w)
    wall = rects_mask(xs, ys, rects) | corners_mask(xs, ys, corners)
    seg = jnp.full((h, w), constants.SEG_FLOOR, jnp.uint8)
    if receptacle_position is not None:
        rx, ry = receptacle_position
        half = constants.RECEPTACLE_WIDTH / 2
        in_recep = (jnp.abs(xs - rx) <= half) & (jnp.abs(ys - ry) <= half)
        seg = jnp.where(in_recep, jnp.uint8(constants.SEG_RECEPTACLE), seg)
    seg = jnp.where(wall, jnp.uint8(constants.SEG_OBSTACLE), seg)
    return wall, seg


def room_mask(h, w, room_length, room_width):
    """Interior mask shrunk by ROBOT_HALF_WIDTH (OccupancyMap._create_room_mask,
    envs.py:2467-2475)."""
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    rl_px = constants.round_up_to_even((room_length - 2 * constants.ROBOT_HALF_WIDTH) * ppm)
    rw_px = constants.round_up_to_even((room_width - 2 * constants.ROBOT_HALF_WIDTH) * ppm)
    start_i = int(h / 2 - rw_px / 2)
    start_j = int(w / 2 - rl_px / 2)
    m = jnp.zeros((h, w), bool)
    return m.at[start_i:start_i + rw_px, start_j:start_j + rl_px].set(True)
