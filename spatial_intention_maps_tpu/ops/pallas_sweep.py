"""Pallas TPU kernel for the chamfer-sweep wavefront (the hot op).

The pure-XLA implementation in :mod:`wavefront` expresses each row update as
separate HLO ops, so one full sweep is ~30k tiny sequential ops — dispatch
overhead dominates on TPU.  This kernel runs ALL pass-pairs on-chip: distance
(+payload) arrays live in VMEM, rows are relaxed in a `fori_loop`, and the
horizontal segmented min-plus closure is a Hillis-Steele scan over
`pltpu.roll` shifts (log2(W) levels).  One kernel instance processes a block
of batch elements so every VPU op works on a (BLOCK_B, W) tile.

Semantics identical to :func:`wavefront.sweep` (validated in tests): the
fixpoint is the exact 8-connected grid metric with step costs {1, sqrt(2)}
(shortest_paths.pyx:26-67).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import wavefront

SQRT2 = 1.4142135623730951
BIG = 1e9
BLOCK_B = 8


def _seg_combine(am, ap, ar, bm, bp, br):
    """Segmented-min monoid: combine(left=a, right=b).  Reset flags are
    int32 0/1 (Mosaic can't rotate 1-bit vectors)."""
    br_b = br > 0
    m = jnp.where(br_b, bm, jnp.minimum(am, bm))
    take_b = br_b | (bm <= am)
    p = jnp.where(take_b, bp, ap)
    r = jnp.maximum(ar, br)
    return m, p, r


def _closure(d, p, free, iota, wp):
    """Horizontal segmented min-plus closure on a (BLOCK_B, Wp) row tile."""
    blocked = (~free).astype(jnp.int32)
    levels = int(math.ceil(math.log2(wp)))

    # Left-to-right: m0 = d - iota
    m, pp, r = jnp.where(free, d - iota, BIG), p, blocked
    # Right-to-left: m0 = d + iota
    m2, pp2, r2 = jnp.where(free, d + iota, BIG), p, blocked
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    for lv in range(levels):
        s = 1 << lv
        # LR: combine element j-s into j.
        lm = pltpu.roll(m, s, axis=1)
        lp = pltpu.roll(pp, s, axis=1)
        lr = pltpu.roll(r, s, axis=1)
        edge = col < s
        lm = jnp.where(edge, BIG, lm)
        lr = jnp.where(edge, 0, lr)
        m, pp, r = _seg_combine(lm, lp, lr, m, pp, r)
        # RL: combine element j+s into j.
        rm = pltpu.roll(m2, wp - s, axis=1)
        rp = pltpu.roll(pp2, wp - s, axis=1)
        rr = pltpu.roll(r2, wp - s, axis=1)
        edge2 = col >= wp - s
        rm = jnp.where(edge2, BIG, rm)
        rr = jnp.where(edge2, 0, rr)
        m2, pp2, r2 = _seg_combine(rm, rp, rr, m2, pp2, r2)

    d_lr = m + iota
    d_rl = m2 - iota
    best = jnp.minimum(d, jnp.minimum(d_lr, d_rl))
    out_p = jnp.where(
        d_lr <= jnp.minimum(d, d_rl), pp, jnp.where(d_rl <= d, pp2, p)
    )
    return jnp.where(free, best, BIG), out_p


def _sweep_kernel(dist_ref, payload_ref, free_ref, dist_out, payload_out,
                  *, h, wp, num_pass_pairs):
    """Refs are laid out (H, BLOCK_B, Wp): the row index is the LEADING
    (untiled) dim so each row slice is one natural (8, 128*k) f32 tile —
    dynamic sublane slicing is catastrophically slow on Mosaic."""
    # Mosaic iota must be integer; cast to float for the min-plus arithmetic.
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_B, wp), 1).astype(jnp.float32)

    dist_out[...] = jnp.where(free_ref[...] > 0, dist_ref[...], BIG)
    payload_out[...] = payload_ref[...]

    def row_step(i, prev_i):
        """Relax row i from row prev_i, then close horizontally."""
        d_prev = dist_out[prev_i]
        p_prev = payload_out[prev_i]
        d_cur = dist_out[i]
        p_cur = payload_out[i]
        f_cur = free_ref[i] > 0

        cands_d = (
            d_cur,
            d_prev + 1.0,
            jnp.where(iota < 1, BIG, pltpu.roll(d_prev, 1, axis=1) + SQRT2),
            jnp.where(iota >= wp - 1, BIG, pltpu.roll(d_prev, wp - 1, axis=1) + SQRT2),
        )
        cands_p = (
            p_cur,
            p_prev,
            pltpu.roll(p_prev, 1, axis=1),
            pltpu.roll(p_prev, wp - 1, axis=1),
        )
        d, p = cands_d[0], cands_p[0]
        for dd, pp in zip(cands_d[1:], cands_p[1:]):
            take = dd < d
            d = jnp.where(take, dd, d)
            p = jnp.where(take, pp, p)
        d = jnp.where(f_cur, d, BIG)
        d, p = _closure(d, p, f_cur, iota, wp)
        dist_out[i] = d
        payload_out[i] = p

    def one_pass_pair(_, carry):
        # Close row 0 / row h-1 first (no previous row), then march.
        def fwd(i, c):
            row_step(i, i - 1)
            return c

        def bwd(i, c):
            row_step(h - 1 - i, h - i)
            return c

        # Row 0 self-closure.
        d0, p0 = _closure(
            dist_out[0], payload_out[0], free_ref[0] > 0, iota, wp
        )
        dist_out[0] = d0
        payload_out[0] = p0
        jax.lax.fori_loop(1, h, fwd, 0)
        dh, ph = _closure(
            dist_out[h - 1], payload_out[h - 1], free_ref[h - 1] > 0, iota, wp
        )
        dist_out[h - 1] = dh
        payload_out[h - 1] = ph
        jax.lax.fori_loop(1, h, bwd, 0)
        return carry

    jax.lax.fori_loop(0, num_pass_pairs, one_pass_pair, 0)


@functools.partial(
    jax.jit, static_argnames=("num_pass_pairs", "interpret")
)
def sweep_pallas(dist, payload, free, num_pass_pairs=3, interpret=None):
    """Drop-in replacement for :func:`wavefront.sweep` on batched inputs.

    dist/payload/free: (B, H, W).  Returns (dist, payload).
    ``interpret=None`` auto-picks interpreter mode off-TPU (kernel logic
    runs anywhere; Mosaic lowering is TPU-only).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w = dist.shape
    wp = max(128, 1 << int(math.ceil(math.log2(w))))
    bp = ((b + BLOCK_B - 1) // BLOCK_B) * BLOCK_B

    def pad(x, fill):
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, wp - w)), constant_values=fill)
        return jnp.transpose(x, (1, 0, 2))  # (H, Bp, Wp): rows lead

    dist_p = pad(dist.astype(jnp.float32), BIG)
    payload_p = pad(payload.astype(jnp.int32), 0)
    free_p = pad(free, False).astype(jnp.int32)

    kernel = functools.partial(
        _sweep_kernel, h=h, wp=wp, num_pass_pairs=num_pass_pairs
    )
    grid = (bp // BLOCK_B,)
    spec = pl.BlockSpec((h, BLOCK_B, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    dist_o, payload_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((h, bp, wp), jnp.float32),
            jax.ShapeDtypeStruct((h, bp, wp), jnp.int32),
        ),
        interpret=interpret,
    )(dist_p, payload_p, free_p)
    dist_o = jnp.transpose(dist_o, (1, 0, 2))
    payload_o = jnp.transpose(payload_o, (1, 0, 2))
    return dist_o[:b, :, :w], payload_o[:b, :, :w]


# ---------------------------------------------------------------------------
# Streaming variant: the whole batch in one row tile
# ---------------------------------------------------------------------------
#
# The VMEM-resident kernel above is issue-latency bound: each row step works
# on a tiny (8, W) tile.  Production perception batches are ~1-3k grids, so
# we instead keep the arrays in HBM laid out (H, B, W), stream one ROW TILE
# (B, W) at a time with double-buffered DMA, and carry the previous relaxed
# row in VMEM.  Every VPU op then works on (B, W) elements and the kernel is
# bandwidth/compute bound instead of latency bound.

STREAM_MAX_B = 512  # VMEM budget cap per kernel instance


def _stream_kernel(dist_hbm, pay_hbm, free_hbm, dist_out, pay_out,
                   dbuf, pbuf, fbuf, ostage_d, ostage_p, prev_d, prev_p,
                   load_sems, store_sems,
                   *, h, bp, wp, num_pass_pairs):
    """In-place (aliased dist/pay) multi-pass sweep over HBM rows.

    Scratch: dbuf/pbuf/fbuf (2, B, W) double load buffers; ostage (2, B, W)
    store staging; prev_d/prev_p (B, W) carried row.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (bp, wp), 1).astype(jnp.float32)

    def load(slot, row):
        return [
            pltpu.make_async_copy(dist_out.at[row], dbuf.at[slot], load_sems.at[slot, 0]),
            pltpu.make_async_copy(pay_out.at[row], pbuf.at[slot], load_sems.at[slot, 1]),
            pltpu.make_async_copy(free_hbm.at[row], fbuf.at[slot], load_sems.at[slot, 2]),
        ]

    def store(slot, row):
        return [
            pltpu.make_async_copy(ostage_d.at[slot], dist_out.at[row], store_sems.at[slot, 0]),
            pltpu.make_async_copy(ostage_p.at[slot], pay_out.at[row], store_sems.at[slot, 1]),
        ]

    def one_direction(reverse):
        def row_of(i):
            return jax.lax.select(reverse, h - 1 - i, i)

        for dma in load(0, row_of(0)):
            dma.start()

        def body(i, carry):
            slot = jax.lax.rem(i, 2)
            nslot = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < h)
            def _():
                for dma in load(nslot, row_of(i + 1)):
                    dma.start()

            for dma in load(slot, row_of(i)):
                dma.wait()
            d_cur = dbuf[slot]
            p_cur = pbuf[slot]
            f_cur = fbuf[slot] > 0

            # Vertical + diagonal relax from the carried previous row.
            pd = prev_d[...]
            ppv = prev_p[...]
            first = i == 0
            pd = jnp.where(first, BIG, pd)
            cands_d = (
                d_cur,
                pd + 1.0,
                jnp.where(iota < 1, BIG, pltpu.roll(pd, 1, axis=1) + SQRT2),
                jnp.where(iota >= wp - 1, BIG, pltpu.roll(pd, wp - 1, axis=1) + SQRT2),
            )
            cands_p = (p_cur, ppv, pltpu.roll(ppv, 1, axis=1), pltpu.roll(ppv, wp - 1, axis=1))
            d, p = cands_d[0], cands_p[0]
            for dd, pp in zip(cands_d[1:], cands_p[1:]):
                take = dd < d
                d = jnp.where(take, dd, d)
                p = jnp.where(take, pp, p)
            d = jnp.where(f_cur, d, BIG)
            d, p = _closure(d, p, f_cur, iota, wp)
            prev_d[...] = d
            prev_p[...] = p

            # Store (wait for the slot's previous store to land first).
            @pl.when(i >= 2)
            def _():
                for dma in store(slot, row_of(i - 2)):
                    dma.wait()

            ostage_d[slot] = d
            ostage_p[slot] = p
            for dma in store(slot, row_of(i)):
                dma.start()
            return carry

        jax.lax.fori_loop(0, h, body, 0)
        # Drain the last two stores (h >= 2 always).
        for last in (h - 2, h - 1):
            for dma in store(last % 2, row_of(last)):
                dma.wait()

    def one_pass_pair(_, carry):
        one_direction(jnp.bool_(False))
        one_direction(jnp.bool_(True))
        return carry

    jax.lax.fori_loop(0, num_pass_pairs, one_pass_pair, 0)


@functools.partial(
    jax.jit, static_argnames=("num_pass_pairs", "interpret")
)
def sweep_pallas_stream(dist, payload, free, num_pass_pairs=3,
                        interpret=None):
    """Streaming sweep for large batches. dist/payload/free: (B, H, W).

    ``interpret``: run the kernel in Pallas interpreter mode — the default
    (None) picks it automatically off-TPU so the kernel LOGIC is exercised
    on the CPU mesh (Mosaic lowering is still TPU-only)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w = dist.shape
    wp = max(128, 1 << int(math.ceil(math.log2(w))))
    bp = min(STREAM_MAX_B, max(8, ((b + 7) // 8) * 8))
    # Split batches larger than the per-kernel cap.
    if b > bp:
        n_chunks = (b + bp - 1) // bp
        outs_d, outs_p = [], []
        for c in range(n_chunks):
            sl = slice(c * bp, min((c + 1) * bp, b))
            dd, pp = sweep_pallas_stream(
                dist[sl], payload[sl], free[sl], num_pass_pairs,
                interpret=interpret,
            )
            outs_d.append(dd)
            outs_p.append(pp)
        return jnp.concatenate(outs_d), jnp.concatenate(outs_p)

    def pad(x, fill):
        x = jnp.pad(
            x, ((0, bp - b), (0, 0), (0, wp - w)), constant_values=fill
        )
        return jnp.transpose(x, (1, 0, 2))  # (H, Bp, Wp)

    dist_p = pad(jnp.where(free, dist.astype(jnp.float32), BIG), BIG)
    payload_p = pad(payload.astype(jnp.int32), 0)
    free_p = pad(free, False).astype(jnp.int32)

    kernel = functools.partial(
        _stream_kernel, h=h, bp=bp, wp=wp, num_pass_pairs=num_pass_pairs
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    dist_o, payload_o = pl.pallas_call(
        kernel,
        in_specs=[any_spec, any_spec, any_spec],
        out_specs=(any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h, bp, wp), jnp.float32),
            jax.ShapeDtypeStruct((h, bp, wp), jnp.int32),
        ),
        input_output_aliases={0: 0, 1: 1},
        scratch_shapes=[
            pltpu.VMEM((2, bp, wp), jnp.float32),
            pltpu.VMEM((2, bp, wp), jnp.int32),
            pltpu.VMEM((2, bp, wp), jnp.int32),
            pltpu.VMEM((2, bp, wp), jnp.float32),
            pltpu.VMEM((2, bp, wp), jnp.int32),
            pltpu.VMEM((bp, wp), jnp.float32),
            pltpu.VMEM((bp, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dist_p, payload_p, free_p)
    dist_o = jnp.transpose(dist_o, (1, 0, 2))
    payload_o = jnp.transpose(payload_o, (1, 0, 2))
    return dist_o[:b, :, :w], payload_o[:b, :, :w]
