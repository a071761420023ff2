"""Rasterization / morphology primitives (jnp, batched, fixed-shape).

TPU-native replacements for the scipy/skimage kernels the reference leans on
(SURVEY N5): disk dilation (skimage binary_dilation/dilation with disk selem,
envs.py:2344, 2453-2455), Bresenham-style line rasterization (skimage.draw
.line, envs.py:2327, 2483), and the egocentric crop+rotate
(scipy.ndimage.rotate order=0, envs.py:2199-2210) — all expressed as gathers,
scatters, and convolutions that XLA maps onto the VPU/MXU.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from .. import constants


def disk_offsets(radius: int):
    """skimage.morphology.disk(radius): offsets with di^2+dj^2 <= r^2."""
    offs = []
    for di in range(-radius, radius + 1):
        for dj in range(-radius, radius + 1):
            if di * di + dj * dj <= radius * radius:
                offs.append((di, dj))
    return offs


def disk_kernel(radius: int):
    k = 2 * radius + 1
    kern = jnp.zeros((k, k), jnp.float32)
    for di, dj in disk_offsets(radius):
        kern = kern.at[di + radius, dj + radius].set(1.0)
    return kern


def shift2d(x, di, dj, fill=False):
    """Shift along the last two axes with fill (no wraparound)."""
    h, w = x.shape[-2:]
    out = x
    if di:
        pad = jnp.full(x.shape[:-2] + (abs(di), w), fill, x.dtype)
        out = (
            jnp.concatenate([pad, out[..., :-di, :]], axis=-2)
            if di > 0
            else jnp.concatenate([out[..., -di:, :], pad], axis=-2)
        )
    if dj:
        pad = jnp.full(out.shape[:-1] + (abs(dj),), fill, x.dtype)
        out = (
            jnp.concatenate([pad, out[..., :, :-dj]], axis=-1)
            if dj > 0
            else jnp.concatenate([out[..., :, -dj:], pad], axis=-1)
        )
    return out


@partial(jax.jit, static_argnames=("radius",))
def binary_dilate_disk(mask, radius):
    """Binary dilation with a disk structuring element, decomposed into a
    vertical shift per row offset + horizontal run-dilation by OR-doubling.
    Pure elementwise/shift ops: cheap to compile and VPU-friendly (an 11x11
    conv pathologically slows XLA:CPU compilation).

    mask: bool (..., H, W).
    """
    if radius == 0:
        return mask
    # Pad so boundary clipping can't punch holes in the doubling windows.
    pad = [(0, 0)] * (mask.ndim - 2) + [(radius, radius), (radius, radius)]
    padded = jnp.pad(mask, pad)
    out = padded
    for di in range(-radius, radius + 1):
        wi = int(math.floor(math.sqrt(radius * radius - di * di)))
        row = shift2d(padded, di, 0)
        # Horizontal dilation to +-wi via doubling: coverage c -> c + s with
        # s <= 2c + 1 keeps the covered window contiguous.
        c = 0
        while c < wi:
            s = min(2 * c + 1, wi - c)
            row = row | shift2d(row, 0, s) | shift2d(row, 0, -s)
            c += s
        out = out | row
    return out[..., radius:-radius, radius:-radius]


@partial(jax.jit, static_argnames=("radius",))
def grey_dilate_disk(img, radius):
    """Grayscale dilation (max over disk offsets), used to thicken intention
    lines (envs.py:2343-2344). img: (..., H, W)."""
    if radius == 0:
        return img
    out = img
    h, w = img.shape[-2:]
    for di, dj in disk_offsets(radius):
        if di == 0 and dj == 0:
            continue
        shifted = jnp.roll(img, (di, dj), axis=(-2, -1))
        # Zero the wrapped-around region (maps here are zero-padded anyway,
        # but be safe at the borders).
        if di > 0:
            shifted = shifted.at[..., :di, :].set(0)
        elif di < 0:
            shifted = shifted.at[..., di:, :].set(0)
        if dj > 0:
            shifted = shifted.at[..., :, :dj].set(0)
        elif dj < 0:
            shifted = shifted.at[..., :, dj:].set(0)
        out = jnp.maximum(out, shifted)
    return out


# ---------------------------------------------------------------------------
# Egocentric crop + rotate (Mapper._get_local_map, envs.py:2199-2210)
# ---------------------------------------------------------------------------

def _local_grid():
    n = constants.LOCAL_MAP_PIXEL_WIDTH
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    i = jnp.arange(n, dtype=jnp.float32)
    j = jnp.arange(n, dtype=jnp.float32)
    # Ego coordinates of local-map pixel centers: +y forward (up in the map),
    # +x to the robot's right (pixel_indices_to_position on the local shape,
    # used by store_new_action at envs.py:865-867).
    dx = ((j + 0.5) - n / 2) / ppm
    dy = (n / 2 - (i + 0.5)) / ppm
    return jnp.meshgrid(dx, dy)  # each (n, n)


def local_pixel_world_offsets(heading):
    """World-frame (x, y) offsets of each local-map pixel center for a robot
    with the given heading. Returns (dx_world, dy_world), each (96, 96)."""
    ldx, ldy = _local_grid()
    ch, sh = jnp.cos(heading), jnp.sin(heading)
    # forward = dir(heading); right = dir(heading - 90deg)
    wx = ldy * ch + ldx * sh
    wy = ldy * sh - ldx * ch
    return wx, wy


def extract_local_map(global_map, position, heading):
    """Nearest-neighbor egocentric 96x96 crop of a global padded map, rotated
    so the robot faces up (envs.py:2199-2210).

    global_map: (H, W) any dtype; position: (2,) world meters; heading: scalar.
    """
    h, w = global_map.shape[-2:]
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    wx, wy = local_pixel_world_offsets(heading)
    px = position[0] + wx
    py = position[1] + wy
    gi = jnp.clip(jnp.floor(h / 2 - py * ppm).astype(jnp.int32), 0, h - 1)
    gj = jnp.clip(jnp.floor(w / 2 + px * ppm).astype(jnp.int32), 0, w - 1)
    return global_map[..., gi, gj]


def extract_local_maps(global_maps_hwc, position, heading):
    """Batched `extract_local_map` over a channel-stacked (H, W, C) image.

    One gather with trailing contiguous channel slices instead of C
    element-gathers: the gather descriptor count drops from 96*96*C to
    96*96, which is the dominant cost on TPU (random gathers are
    latency-bound per index, ~independent of the contiguous slice size).
    """
    h, w, _ = global_maps_hwc.shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    wx, wy = local_pixel_world_offsets(heading)
    px = position[0] + wx
    py = position[1] + wy
    gi = jnp.clip(jnp.floor(h / 2 - py * ppm).astype(jnp.int32), 0, h - 1)
    gj = jnp.clip(jnp.floor(w / 2 + px * ppm).astype(jnp.int32), 0, w - 1)
    return global_maps_hwc[gi, gj, :]


def extract_local_maps_mxu(global_maps_hwc, position, heading):
    """:func:`extract_local_maps` with the lookups as one-hot matmuls.

    The same nearest-neighbor cells are read, but instead of a 96*96-descriptor
    random gather (~14 ns per descriptor on TPU) the lookup rides the MXU:
    ``rows = onehot(gi) @ G`` then a row-wise one-hot(gj) contraction.
    One-hot weights are exact in bf16 and the matmul accumulates in f32, so
    the result equals the gather bit-for-bit for bf16-representable maps and
    to bf16 rounding otherwise (observations are stored bf16 anyway).
    """
    h, w, c = global_maps_hwc.shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    wx, wy = local_pixel_world_offsets(heading)
    px = position[0] + wx
    py = position[1] + wy
    gi = jnp.clip(jnp.floor(h / 2 - py * ppm).astype(jnp.int32), 0, h - 1)
    gj = jnp.clip(jnp.floor(w / 2 + px * ppm).astype(jnp.int32), 0, w - 1)
    n = gi.shape[0]
    p = n * n
    oh_i = (gi.reshape(p)[:, None] == jnp.arange(h)).astype(jnp.bfloat16)
    rows = oh_i @ global_maps_hwc.astype(jnp.bfloat16).reshape(h, w * c)
    rows = rows.reshape(p, w, c)
    oh_j = (gj.reshape(p)[:, None] == jnp.arange(w)).astype(rows.dtype)
    out = jnp.sum(rows * oh_j[..., None], axis=1)             # (P, C)
    return out.reshape(n, n, c).astype(jnp.float32)


def local_distance_map(global_map, position, heading):
    """_get_local_distance_map (envs.py:2212-2215): crop, then subtract min."""
    local = extract_local_map(global_map, position, heading)
    return local - jnp.min(local)


# ---------------------------------------------------------------------------
# Line rasterization (scatter-based)
# ---------------------------------------------------------------------------

def line_cells(p0_ij, p1_ij, num_samples):
    """Cells along the segment between two pixel coords (float i, j),
    parametric sampling at sub-pixel spacing (superset of skimage.draw.line's
    8-connected cells; downstream users dilate anyway)."""
    t = jnp.linspace(0.0, 1.0, num_samples)
    ii = p0_ij[0] + t * (p1_ij[0] - p0_ij[0])
    jj = p0_ij[1] + t * (p1_ij[1] - p0_ij[1])
    return jnp.round(ii).astype(jnp.int32), jnp.round(jj).astype(jnp.int32), t


def scatter_max(img, ii, jj, values, valid):
    """img.at[ii, jj].max(values) with masking."""
    values = jnp.where(valid, values, -jnp.inf)
    ii = jnp.clip(ii, 0, img.shape[0] - 1)
    jj = jnp.clip(jj, 0, img.shape[1] - 1)
    return img.at[ii, jj].max(values.astype(img.dtype))


def scatter_max_dedup(img, ii, jj, values, valid, budget=2048):
    """:func:`scatter_max` with exact per-cell pre-reduction.

    TPU scatters cost ~11-14 ns per DESCRIPTOR regardless of duplicates,
    and the intention-map rasterizer emits ~5k samples/env that land on
    only a few hundred unique cells.  Sort the descriptors by flat cell,
    reduce each run to its max with a segmented scan, compact the run
    tails, and scatter at most ``budget`` descriptors.  Bit-identical to
    :func:`scatter_max` — max is order-independent — with a lax.cond
    fallback to the plain scatter if unique cells ever exceed the budget
    (paths are bounded by BACKTRACE_MAX_STEPS cells/robot, so they don't).
    """
    h, w = img.shape
    p = ii.shape[0]
    budget = min(budget, p)
    vals = jnp.where(valid, values.astype(img.dtype), -jnp.inf)
    iic = jnp.clip(ii, 0, h - 1)
    jjc = jnp.clip(jj, 0, w - 1)
    trash = h * w
    key = jnp.where(valid, iic * w + jjc, trash)
    order = jnp.argsort(key)
    key_s = key[order]
    val_s = vals[order]

    # Segmented max over equal-key runs (keys are contiguous after sort).
    def comb(a, b):
        ka, va = a
        kb, vb = b
        return kb, jnp.where(ka == kb, jnp.maximum(va, vb), vb)

    _, run_max = jax.lax.associative_scan(comb, (key_s, val_s))
    is_tail = jnp.concatenate(
        [key_s[1:] != key_s[:-1], jnp.ones((1,), bool)]
    ) & (key_s < trash)
    n_unique = jnp.sum(is_tail.astype(jnp.int32))
    tail_order = jnp.argsort(~is_tail, stable=True)[:budget]
    ck = key_s[tail_order]
    cv = run_max[tail_order]
    cvalid = is_tail[tail_order]

    def compacted(_):
        civ = jnp.where(cvalid, ck // w, 0)
        cjv = jnp.where(cvalid, ck % w, 0)
        return img.at[civ, cjv].max(jnp.where(cvalid, cv, -jnp.inf))

    def full(_):
        return img.at[iic, jjc].max(vals)

    return jax.lax.cond(n_unique <= budget, compacted, full, None)


def line_free(free_grid, p0_ij, p1_ij, num_samples):
    """True iff every sampled cell along the segment is free — the straight
    line shortcut test (envs.py:2483-2485) and waypoint pruning LOS test
    (shortest_paths.pyx:140-148)."""
    ii, jj, _ = line_cells(p0_ij, p1_ij, num_samples)
    ii = jnp.clip(ii, 0, free_grid.shape[0] - 1)
    jj = jnp.clip(jj, 0, free_grid.shape[1] - 1)
    return jnp.all(free_grid[ii, jj])


# ---------------------------------------------------------------------------
# Analytic robot mask (Mapper._create_robot_mask, envs.py:2217-2241), tested
# directly in the global frame instead of rotate+paste.
# ---------------------------------------------------------------------------

def robot_body_mask(xs, ys, position, heading, base_length, with_cube=False):
    """Bool mask over pixel-center grids xs/ys for one robot footprint.

    in_base: |x_local| <= HALF_WIDTH and 0 <= y_fwd - BACKPACK_OFFSET <= base
    in_backpack: circle of HALF_WIDTH at BACKPACK_OFFSET along forward axis
    with_cube: lifted-cube footprint ahead of the end effector
    (envs.py:2229-2239; forward axis = mask's +y).
    """
    dx = xs - position[0]
    dy = ys - position[1]
    ch, sh = jnp.cos(heading), jnp.sin(heading)
    fwd = dx * ch + dy * sh          # along heading
    lat = -dx * sh + dy * ch         # to the robot's left
    hw = constants.ROBOT_HALF_WIDTH
    bo = constants.ROBOT_BACKPACK_OFFSET
    in_base = (jnp.abs(lat) <= hw) & (fwd - bo >= 0) & (fwd - bo <= base_length)
    in_backpack = lat ** 2 + (fwd - bo) ** 2 <= hw ** 2
    mask = in_base | in_backpack
    if with_cube:
        ee = bo + base_length + constants.LIFTED_CUBE_OFFSET
        cw = constants.CUBE_WIDTH
        in_cube = (jnp.abs(lat) <= cw / 2) & (fwd - ee >= 0) & (fwd - ee <= cw)
        mask = mask | in_cube
    return mask


def cube_mask(xs, ys, position, heading):
    """Rotated-square footprint of a cube."""
    dx = xs - position[0]
    dy = ys - position[1]
    ch, sh = jnp.cos(heading), jnp.sin(heading)
    lx = dx * ch + dy * sh
    ly = -dx * sh + dy * ch
    half = constants.CUBE_WIDTH / 2
    return (jnp.abs(lx) <= half) & (jnp.abs(ly) <= half)
