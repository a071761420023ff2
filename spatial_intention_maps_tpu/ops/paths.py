"""On-device shortest-path waypoint extraction.

Replaces GridGraph.shortest_path (shortest_paths.pyx:122-154) +
OccupancyMap.shortest_path (envs.py:2477-2504): a target-seeded wavefront
distance image, greedy steepest-descent backtrace from the source (yielding a
source->target shortest path directly), and line-of-sight string-pulling in
place of approximate_polygon + LOS waypoint pruning.  Fixed shapes throughout
so the whole planner runs inside the jitted env step.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .. import constants
from . import wavefront
from .raster_ops import line_cells

# 8-neighborhood (di, dj)
_NEIGH = jnp.array(
    [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)],
    jnp.int32,
)
_NEIGH_LIST = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
               (1, 1)]
# Row 8 = "stay" (no strictly-better neighbor).
_NEIGH9 = jnp.array(_NEIGH_LIST + [(0, 0)], jnp.int32)


# 32 steps per while-loop iteration: the walk is gather-latency bound, so
# deeper unrolling amortizes the loop's per-iteration overhead — measured
# 12.3 / 11.2 / 8.9 / 9.9 ms at unroll 8/16/32/64 (B=1024, M=256, synthetic
# long paths; tools_bench_planner.py).
_DESCENT_UNROLL = 32


def parent_dir_image(dist_img):
    """Per-cell steepest-descent direction (0-7 into ``_NEIGH``, 8 = stay).

    Computed with eight edge-padded shifts of the whole image — no gathers —
    so the per-step walk in :func:`backtrace` needs only ONE gather (the
    direction at the current cell) instead of eight neighbor-distance
    gathers plus an argmin.  Neighbor order and argmin first-wins
    tie-breaking match the original gather formulation exactly, as does the
    coordinate clipping (edge padding reads the clipped cell)."""
    h, w = dist_img.shape
    pad = jnp.pad(dist_img, 1, mode="edge")
    nd = jnp.stack(
        [pad[1 + di:1 + di + h, 1 + dj:1 + dj + w] for di, dj in _NEIGH_LIST]
    )  # (8, H, W)
    k = jnp.argmin(nd, axis=0)
    best = jnp.min(nd, axis=0)
    return jnp.where(best < dist_img, k, 8).astype(jnp.int32)


def backtrace(dist_img, start_ij, num_steps=constants.BACKTRACE_MAX_STEPS,
              unroll=_DESCENT_UNROLL):
    """Greedy steepest descent on a distance image from start to the seed.

    Returns (path (num_steps, 2) int32, path_len).  Once the seed (dist==0)
    is reached the position repeats, so path[path_len-1] is the seed cell.
    The descent directions are precomputed as a parent-direction image
    (:func:`parent_dir_image`); each walk step is a single 1-element gather.
    Several steps are unrolled per loop iteration to cut sequential depth."""
    h, w = dist_img.shape
    dirs = parent_dir_image(dist_img)
    hi = jnp.array([h - 1, w - 1], jnp.int32)

    def descend(cur):
        d = dirs[cur[0], cur[1]]
        # Decode (di, dj) arithmetically instead of a table gather: remap
        # the 8-neighbor index (center skipped) onto the 3x3 grid, with the
        # "stay" code 8 landing on the center cell.
        k2 = jnp.where(d == 8, 4, jnp.where(d < 4, d, d + 1))
        delta = jnp.stack([k2 // 3 - 1, k2 % 3 - 1])
        return jnp.clip(cur + delta, 0, hi)

    start = jnp.asarray(start_ij, jnp.int32)
    n_iters = (num_steps - 1 + unroll - 1) // unroll

    # Early-exit while loop: under vmap this runs until ALL batch lanes have
    # converged (reached the seed / a local min), so the sequential depth is
    # the longest actual path in the service batch, not the 512-step budget.
    # The loop counter `k` stays unbatched (uniform across lanes), keeping the
    # path write a dynamic_update_slice rather than a scatter.
    def descend_block(cur):
        outs = []
        for _u in range(unroll):
            cur = descend(cur)
            outs.append(cur)
        return jnp.stack(outs)  # (unroll, 2)

    def cond(carry):
        k, _cur, _path, _plen, done = carry
        return (k < n_iters) & ~done

    def body(carry):
        k, cur, path, plen, done = carry
        block = descend_block(cur)
        prev = jnp.concatenate([cur[None], block[:-1]], axis=0)
        moved = jnp.any(block != prev, axis=-1)
        path = jax.lax.dynamic_update_slice(
            path, block, (1 + k * unroll, jnp.int32(0))
        )
        plen = plen + jnp.sum(moved.astype(jnp.int32))
        done = ~jnp.any(moved)
        return k + 1, block[-1], path, plen, done

    path0 = jnp.zeros((1 + n_iters * unroll, 2), jnp.int32)
    path0 = path0.at[0].set(start)
    init = (jnp.int32(0), start, path0, jnp.int32(1), jnp.bool_(False))
    _, final, path, path_len, _ = jax.lax.while_loop(cond, body, init)
    # Tail rows past the last written block are never read downstream
    # (simplify_path clips every index to path_len - 1), but fill them with
    # the final cell anyway so the array is self-consistent.
    rows = jnp.arange(path.shape[0])
    written = rows <= jnp.maximum(path_len - 1, 0)
    path = jnp.where(written[:, None], path, final[None])
    path = path[:num_steps]
    path_len = jnp.minimum(path_len, num_steps)
    return path, path_len


@partial(jax.jit, static_argnames=("stride", "max_waypoints", "los_samples"))
def simplify_path(
    free,
    path,
    path_len,
    stride=constants.BACKTRACE_STRIDE,
    max_waypoints=constants.MAX_WAYPOINTS,
    los_samples=constants.LOS_SAMPLES,
):
    """Greedy farthest-visible string pulling over a (subsampled) dense path.

    Equivalent role to approximate_polygon + the LOS pruning loop
    (shortest_paths.pyx:138-151).  Returns (waypoints (max_waypoints, 2)
    float32 pixel coords, num_waypoints int32); waypoints[0] is the source.
    """
    n_sub = path.shape[0] // stride + 1
    last = path_len - 1
    sub_idx = jnp.minimum(jnp.arange(n_sub, dtype=jnp.int32) * stride, last)
    pts = path[sub_idx].astype(jnp.float32)  # (S, 2)

    def visible_from(anchor_pt):
        def vis_one(p):
            ii, jj, _ = line_cells(anchor_pt, p, los_samples)
            ii = jnp.clip(ii, 0, free.shape[0] - 1)
            jj = jnp.clip(jj, 0, free.shape[1] - 1)
            return jnp.all(free[ii, jj])

        return jax.vmap(vis_one)(pts)  # (S,)

    idxs = jnp.arange(n_sub, dtype=jnp.int32)

    def body(carry, _):
        a_idx, done = carry
        vis = visible_from(pts[a_idx])
        cand = jnp.where(vis & (idxs > a_idx), idxs, -1)
        t = jnp.max(cand)
        t = jnp.where(t < 0, jnp.minimum(a_idx + 1, n_sub - 1), t)
        t = jnp.where(done, a_idx, t)
        new_done = done | (sub_idx[t] >= last)
        return (t, new_done), (pts[t], ~done)

    init = (jnp.int32(0), jnp.bool_(False))
    (_, _), (wps, valid) = jax.lax.scan(body, init, None, length=max_waypoints - 1)
    waypoints = jnp.concatenate([pts[:1], wps], axis=0)  # (max_waypoints, 2)
    num_wp = 1 + jnp.sum(valid.astype(jnp.int32))
    # Force the final real waypoint to the path end even if the waypoint
    # budget ran out mid-path.
    end_pt = pts[n_sub - 1]
    waypoints = waypoints.at[num_wp - 1].set(end_pt)
    return waypoints, num_wp


def simplify_path_batched(
    free_b,
    path_b,
    path_len_b,
    stride=constants.BACKTRACE_STRIDE,
    max_waypoints=constants.MAX_WAYPOINTS,
    los_samples=constants.LOS_SAMPLES,
    env_chunk=64,
):
    """Batched :func:`simplify_path` with the LOS tests on the MXU.

    Semantics are identical to vmapping ``simplify_path`` (same stride-4
    candidate points, same greedy farthest-visible scan, same boolean cell
    reads) — but each scan iteration's ``M x S x los_samples`` line-of-sight
    cell lookups run as one-hot matmuls against the (M, H, W) free maps
    instead of random gathers.  TPU gathers cost ~14 ns per descriptor
    (~300 ms/round at M=256); the same lookups as
    ``onehot_rows @ free  *  onehot_cols`` ride the MXU in a few ms.
    ``env_chunk`` bounds the one-hot transient memory (chunks of envs are
    processed sequentially inside each scan iteration).

    free_b (M, H, W) bool; path_b (M, P, 2) int32; path_len_b (M,).
    Returns (waypoints (M, max_waypoints, 2) f32, num_wp (M,)).
    """
    m, h, w = free_b.shape
    n_sub = path_b.shape[1] // stride + 1
    last = path_len_b - 1                                     # (M,)
    sub_idx = jnp.minimum(
        jnp.arange(n_sub, dtype=jnp.int32)[None, :] * stride, last[:, None]
    )                                                         # (M, S)
    menv = jnp.arange(m)
    pts = path_b[menv[:, None], sub_idx].astype(jnp.float32)  # (M, S, 2)
    free_f = free_b.astype(jnp.bfloat16)
    t = jnp.linspace(0.0, 1.0, los_samples, dtype=jnp.float32)
    iota_h = jnp.arange(h, dtype=jnp.int32)
    iota_w = jnp.arange(w, dtype=jnp.int32)

    def visible(anchor_pts, pts_c, free_c):
        # anchor_pts (Mc, 2); pts_c (Mc, S, 2); free_c (Mc, H, W) bf16
        ii = anchor_pts[:, None, None, 0] + t[None, None, :] * (
            pts_c[..., 0:1] - anchor_pts[:, None, None, 0]
        )                                                     # (Mc, S, L)
        jj = anchor_pts[:, None, None, 1] + t[None, None, :] * (
            pts_c[..., 1:2] - anchor_pts[:, None, None, 1]
        )
        mc = ii.shape[0]
        ii = jnp.clip(jnp.round(ii).astype(jnp.int32), 0, h - 1)
        jj = jnp.clip(jnp.round(jj).astype(jnp.int32), 0, w - 1)
        p = n_sub * los_samples
        ii = ii.reshape(mc, p)
        jj = jj.reshape(mc, p)
        # Contract W first: the (Mc, P, H) intermediate is H/W (~60%) the
        # size of the rows-first (Mc, P, W) one, and these one-hot transients
        # dominate the HBM traffic — 13.9 -> 9.9 ms at B=1024/M=256
        # (tools_bench_planner.py; bit-identical, verified on TPU).
        oh_j = (jj[..., None] == iota_w).astype(jnp.bfloat16)  # (Mc, P, W)
        g = jnp.einsum("mhw,mpw->mph", free_c, oh_j)           # (Mc, P, H)
        oh_i = (ii[..., None] == iota_h).astype(jnp.bfloat16)
        vals = jnp.sum(g * oh_i, axis=-1)                      # (Mc, P)
        return jnp.all(
            vals.reshape(mc, n_sub, los_samples) > 0.5, axis=-1
        )                                                      # (Mc, S)

    idxs = jnp.arange(n_sub, dtype=jnp.int32)
    n_chunks = max(1, m // env_chunk) if m % env_chunk == 0 else 1
    n_its = max_waypoints - 1

    # Early-exit while loop: each iteration pays the full M x S x L one-hot
    # LOS matmul (~2 GFLOP/env at the flagship shapes), but most service
    # batches converge in 2-4 waypoints — the fixed-length scan burned all
    # max_waypoints-1 iterations regardless.  Iterations after a lane's
    # `done` would emit (pts[a_idx], False) forever; the post-loop fill
    # reproduces exactly that, so the output is bit-identical to the scan.
    def cond(carry):
        k, _a, done, _w, _v = carry
        return (k < n_its) & ~jnp.all(done)

    def body(carry):
        k, a_idx, done, wps, valid = carry
        anchor = pts[menv, a_idx]                             # (M, 2)
        if n_chunks > 1:
            vis = jax.lax.map(
                lambda args: visible(*args),
                (
                    anchor.reshape(n_chunks, -1, 2),
                    pts.reshape(n_chunks, -1, n_sub, 2),
                    free_f.reshape(n_chunks, -1, h, w),
                ),
            ).reshape(m, n_sub)
        else:
            vis = visible(anchor, pts, free_f)
        cand = jnp.where(vis & (idxs[None] > a_idx[:, None]), idxs[None], -1)
        nxt = jnp.max(cand, axis=1)                           # (M,)
        nxt = jnp.where(nxt < 0, jnp.minimum(a_idx + 1, n_sub - 1), nxt)
        nxt = jnp.where(done, a_idx, nxt)
        new_done = done | (sub_idx[menv, nxt] >= last)
        wps = jax.lax.dynamic_update_slice(
            wps, pts[menv, nxt][None], (k, 0, 0)
        )
        valid = jax.lax.dynamic_update_slice(
            valid, (~done)[None], (k, 0)
        )
        return k + 1, nxt, new_done, wps, valid

    init = (
        jnp.int32(0), jnp.zeros(m, jnp.int32), jnp.zeros(m, bool),
        jnp.zeros((n_its, m, 2), jnp.float32), jnp.zeros((n_its, m), bool),
    )
    k_end, a_end, _, wps, valid = jax.lax.while_loop(cond, body, init)
    # Fill iterations the early exit skipped with what the scan would have
    # emitted: every lane was done, so (pts[a_idx_frozen], valid=False).
    tail = jnp.arange(n_its)[:, None] >= k_end                # (K-1, M)
    frozen = pts[menv, a_end]                                 # (M, 2)
    wps = jnp.where(tail[..., None], frozen[None], wps)
    wps = jnp.moveaxis(wps, 0, 1)                             # (M, K-1, 2)
    valid = jnp.moveaxis(valid, 0, 1)                         # (M, K-1)
    waypoints = jnp.concatenate([pts[:, :1], wps], axis=1)    # (M, K, 2)
    num_wp = 1 + jnp.sum(valid.astype(jnp.int32), axis=1)
    end_pt = pts[:, n_sub - 1]
    waypoints = jnp.where(
        (jnp.arange(max_waypoints)[None] == (num_wp - 1)[:, None])[..., None],
        end_pt[:, None], waypoints,
    )
    return waypoints, num_wp


def plan_path_pixels(
    cspace,
    snap_payload,
    src_ij,
    tgt_ij,
    num_pass_pairs=3,
    dist_img=None,
):
    """Full pixel-space planner: snap endpoints to valid cspace cells
    (envs.py:2488-2489), target-seeded wavefront, backtrace from source,
    simplify.  ``dist_img`` may be precomputed (batched callers run the
    target-seeded sweep through the Pallas kernel).  Returns
    (waypoints_px (K,2) f32, num_wp, dist_img)."""
    si, sj = wavefront.snap_to_valid(snap_payload, src_ij[0], src_ij[1])
    if dist_img is None:
        ti, tj = wavefront.snap_to_valid(snap_payload, tgt_ij[0], tgt_ij[1])
        dist_img = wavefront.distance_image(cspace, ti, tj, num_pass_pairs)
    path, path_len = backtrace(dist_img, jnp.stack([si, sj]))
    waypoints, num_wp = simplify_path(cspace, path, path_len)
    return waypoints, num_wp, dist_img
