"""Fused egocentric crop-rotate kernel (Mapper._get_local_map,
reference envs.py:2199-2210).

The XLA formulation (:func:`raster_ops.extract_local_maps_mxu`) computes the
nearest-neighbour rotated crop as ``onehot(gi) @ G`` followed by a row-wise
``onehot(gj)`` contraction.  That is MXU-friendly but materializes the
intermediate ``rows`` tensor ``(P, W, C)`` — at P=96*96 output pixels this is
~12 MB *per served env*, and at a service batch of 256 the round pays ~6 GB
of HBM traffic for ~0.24 TFLOP of useful work: the crop is bandwidth-bound
(measured 22.3 ms of a 103 ms round at B=1024/M=256).

This kernel keeps the whole per-env global map resident in VMEM (≤ 160 KB
bf16 at the large-room 128x128x5 shape) and contracts each P-block's one-hot
rows immediately, so the ``(P, W, C)`` intermediate never exists in HBM:

  per grid step (env m, pixel block pb):
    oh_i  = (gi_block == iota_H)          (PB, H)  bf16   VPU
    for c in channels:                              (unrolled, C is static)
      rows_c = oh_i @ G[c]                (PB, W)  f32    MXU
      out[c] = sum(rows_c * oh_j, lanes)  (PB,)    f32    VPU

HBM traffic drops to G + indices + output (~0.4 MB/env), and the matmuls
(2*P*H*W*C FLOP/env) run from VMEM.

One-hot selection is exact (a single 1.0*value product per output pixel), so
the result is bit-identical to ``extract_local_maps_mxu``'s bf16-rounded
gather for any global-map dtype, and to the plain gather for
bf16-representable maps.

Layout notes (Mosaic):
  * channels lead (C, H, W) so each matmul operand is a full (H, W) tile —
    with C trailing the lane dim would be 5.
  * gi/gj ride in as (P, 1) so the pixel index lands on the sublane dim;
    comparing against a broadcasted lane iota builds the one-hot without
    any relayout.
  * output is (C, P) — P on lanes — transposed once outside (cheap in XLA).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants

# Pixel-block rows per kernel program.  2304 (4 programs per 96x96 crop)
# beats 1024 by ~4 ms at M=256 — per-program grid-iteration overhead
# amortizes over fatter blocks — while 4608 overflows scoped VMEM (the
# vmapped output staging).  Chain-timed: 19.2 / 15.1 ms at 1024 / 2304
# (tools_bench_crop.py); SIM_TPU_PALLAS_CROP_BLOCK overrides.
_BLOCK_P = 2304


def _crop_kernel(gi_ref, gj_ref, g_ref, out_ref):
    c, h, w = g_ref.shape
    pb = gi_ref.shape[0]
    oh_i = (
        gi_ref[:, 0:1] == jax.lax.broadcasted_iota(jnp.int32, (pb, h), 1)
    ).astype(jnp.bfloat16)
    oh_j = (
        gj_ref[:, 0:1] == jax.lax.broadcasted_iota(jnp.int32, (pb, w), 1)
    ).astype(jnp.float32)
    for ch in range(c):
        rows = jnp.dot(
            oh_i, g_ref[ch], preferred_element_type=jnp.float32
        )  # (PB, W) f32
        out_ref[ch, :] = jnp.sum(rows * oh_j, axis=1)


def _crop_kernel_matvec(gi_ref, gj_ref, g_ref, out_ref):
    """Variant: the j-contraction rides the MXU as (PB, W) @ (W, C-slots)
    instead of a cross-lane VPU reduce (Mosaic lowers ``sum(axis=1)`` to a
    log2(W) shuffle chain per block-channel, which profiling showed
    dominated the original kernel: 27.5 ms vs the 22.1 ms XLA path at
    B=1024/M=256).  Each channel's masked rows land in their own output
    column of one (PB, C) block, written once."""
    c, h, w = g_ref.shape
    pb = gi_ref.shape[0]
    oh_i = (
        gi_ref[:, 0:1] == jax.lax.broadcasted_iota(jnp.int32, (pb, h), 1)
    ).astype(jnp.bfloat16)
    oh_j = (
        gj_ref[:, 0:1] == jax.lax.broadcasted_iota(jnp.int32, (pb, w), 1)
    ).astype(jnp.float32)
    ones = jnp.ones((w, 1), jnp.bfloat16)
    cols = []
    for ch in range(c):
        # Mosaic requires a 32-bit matmul accumulator; the row value is a
        # single bf16 cell either way, so f32 accumulation stays exact.
        rows = jnp.dot(oh_i, g_ref[ch], preferred_element_type=jnp.float32)
        cols.append(
            jnp.dot(
                (rows * oh_j).astype(jnp.bfloat16), ones,
                preferred_element_type=jnp.float32,
            )
        )  # (PB, 1) f32
    out_ref[...] = jnp.concatenate(cols, axis=1)


def _crop_kernel_matvec_jfirst(gi_ref, gj_ref, gt_ref, out_ref):
    """Variant: contract the LANE dim first — ``oh_j @ G^T`` runs the MXU at
    K=W=128 (full systolic K; the i-first variant's K=H is 80 on the small
    canvas), then the i-contraction is the same masked matvec trick on an
    80-wide product.  Needs G transposed to (C, W, H)."""
    c, w, h = gt_ref.shape
    pb = gi_ref.shape[0]
    oh_i = (
        gi_ref[:, 0:1] == jax.lax.broadcasted_iota(jnp.int32, (pb, h), 1)
    ).astype(jnp.float32)
    oh_j = (
        gj_ref[:, 0:1] == jax.lax.broadcasted_iota(jnp.int32, (pb, w), 1)
    ).astype(jnp.bfloat16)
    ones = jnp.ones((h, 1), jnp.bfloat16)
    cols = []
    for ch in range(c):
        cols_h = jnp.dot(oh_j, gt_ref[ch], preferred_element_type=jnp.float32)
        cols.append(
            jnp.dot(
                (cols_h * oh_i).astype(jnp.bfloat16), ones,
                preferred_element_type=jnp.float32,
            )
        )  # (PB, 1) f32
    out_ref[...] = jnp.concatenate(cols, axis=1)


def _crop_kernel_wide(gi_ref, gj_ref, gw_ref, out_ref):
    """Variant: ALL channels in one (PB, H) @ (H, C*W) matmul — the
    per-channel (80x128) matmuls are K- and N-starved on the MXU, so fusing
    the channel dim into N amortizes the systolic load.  G rides in as
    (H, C*W) with channel-major 128-lane blocks, so each channel's rows are
    a clean lane-tile slice for the masked matvec."""
    h, cw = gw_ref.shape
    pb = gi_ref.shape[0]
    c = out_ref.shape[1]
    w = cw // c
    oh_i = (
        gi_ref[:, 0:1] == jax.lax.broadcasted_iota(jnp.int32, (pb, h), 1)
    ).astype(jnp.bfloat16)
    oh_j = (
        gj_ref[:, 0:1] == jax.lax.broadcasted_iota(jnp.int32, (pb, w), 1)
    ).astype(jnp.float32)
    ones = jnp.ones((w, 1), jnp.bfloat16)
    rows = jnp.dot(oh_i, gw_ref[...], preferred_element_type=jnp.float32)
    cols = []
    for ch in range(c):
        seg = rows[:, ch * w:(ch + 1) * w]
        cols.append(
            jnp.dot(
                (seg * oh_j).astype(jnp.bfloat16), ones,
                preferred_element_type=jnp.float32,
            )
        )
    out_ref[...] = jnp.concatenate(cols, axis=1)


@partial(jax.jit, static_argnames=("interpret", "block_p", "variant"))
def _crop_call(g_chw, gi, gj, interpret=False, block_p=_BLOCK_P,
               variant="matvec"):
    c, h, w = g_chw.shape
    p = gi.shape[0]
    grid = (p // block_p,)
    if variant == "wide":
        # (C, H, W) -> (H, C*W) channel-major lane blocks
        gw = jnp.transpose(g_chw, (1, 0, 2)).reshape(h, c * w)
        out = pl.pallas_call(
            _crop_kernel_wide,
            out_shape=jax.ShapeDtypeStruct((p, c), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_p, 1), lambda pb: (pb, 0)),
                pl.BlockSpec((block_p, 1), lambda pb: (pb, 0)),
                pl.BlockSpec((h, c * w), lambda pb: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_p, c), lambda pb: (pb, 0)),
            interpret=interpret,
        )(gi[:, None], gj[:, None], gw)
        return jnp.transpose(out, (1, 0))  # (C, P)
    if variant == "jfirst":
        out = pl.pallas_call(
            _crop_kernel_matvec_jfirst,
            out_shape=jax.ShapeDtypeStruct((p, c), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_p, 1), lambda pb: (pb, 0)),
                pl.BlockSpec((block_p, 1), lambda pb: (pb, 0)),
                pl.BlockSpec((c, w, h), lambda pb: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_p, c), lambda pb: (pb, 0)),
            interpret=interpret,
        )(gi[:, None], gj[:, None], jnp.transpose(g_chw, (0, 2, 1)))
        return jnp.transpose(out, (1, 0))  # (C, P)
    if variant == "matvec":
        out = pl.pallas_call(
            _crop_kernel_matvec,
            out_shape=jax.ShapeDtypeStruct((p, c), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_p, 1), lambda pb: (pb, 0)),
                pl.BlockSpec((block_p, 1), lambda pb: (pb, 0)),
                pl.BlockSpec((c, h, w), lambda pb: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_p, c), lambda pb: (pb, 0)),
            interpret=interpret,
        )(gi[:, None], gj[:, None], g_chw)
        return jnp.transpose(out, (1, 0))  # (C, P)
    out = pl.pallas_call(
        _crop_kernel,
        out_shape=jax.ShapeDtypeStruct((c, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_p, 1), lambda pb: (pb, 0)),
            pl.BlockSpec((block_p, 1), lambda pb: (pb, 0)),
            pl.BlockSpec((c, h, w), lambda pb: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c, block_p), lambda pb: (0, pb)),
        interpret=interpret,
    )(gi[:, None], gj[:, None], g_chw)
    return out


def extract_local_maps_pallas(global_maps_hwc, position, heading,
                              interpret=False, variant=None):
    """Drop-in for :func:`raster_ops.extract_local_maps_mxu` (same nearest-
    neighbour cells, same bf16 value rounding), vmap-compatible."""
    import os

    from . import raster_ops

    if variant is None:
        # Profiled on the chip at B=1024/M=256: matvec 14.09 ms vs
        # reduce 26.35 ms vs the XLA one-hot path 22.18 ms.
        variant = os.environ.get("SIM_TPU_PALLAS_CROP_VARIANT", "matvec")
    h, w, c = global_maps_hwc.shape
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    wx, wy = raster_ops.local_pixel_world_offsets(heading)
    px = position[0] + wx
    py = position[1] + wy
    gi = jnp.clip(jnp.floor(h / 2 - py * ppm).astype(jnp.int32), 0, h - 1)
    gj = jnp.clip(jnp.floor(w / 2 + px * ppm).astype(jnp.int32), 0, w - 1)
    n = gi.shape[0]
    p = n * n
    env_bp = os.environ.get("SIM_TPU_PALLAS_CROP_BLOCK")
    block_cap = int(env_bp) if env_bp else _BLOCK_P
    block_p = block_cap if p % block_cap == 0 else _pick_block(p)
    out = _crop_call(
        jnp.transpose(global_maps_hwc.astype(jnp.bfloat16), (2, 0, 1)),
        gi.reshape(p), gj.reshape(p),
        interpret=interpret, block_p=block_p, variant=variant,
    )  # (C, P)
    return jnp.transpose(out, (1, 0)).reshape(n, n, c)


def _pick_block(p):
    for cand in (512, 256, 128):
        if p % cand == 0:
            return cand
    return p


def supports(global_shape) -> bool:
    h, w, _ = global_shape
    return w % 128 == 0 and h % 8 == 0
