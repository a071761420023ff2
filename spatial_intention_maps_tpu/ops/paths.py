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


_DESCENT_UNROLL = 4


def backtrace(dist_img, start_ij, num_steps=constants.BACKTRACE_MAX_STEPS):
    """Greedy steepest descent on a distance image from start to the seed.

    Returns (path (num_steps, 2) int32, path_len).  Once the seed (dist==0) is
    reached the position repeats, so path[path_len-1] is the seed cell.
    Several descent steps are unrolled per scan iteration to cut the
    sequential scan depth.
    """
    h, w = dist_img.shape

    def descend(cur):
        ni = jnp.clip(cur[0] + _NEIGH[:, 0], 0, h - 1)
        nj = jnp.clip(cur[1] + _NEIGH[:, 1], 0, w - 1)
        nd = dist_img[ni, nj]
        k = jnp.argmin(nd)
        better = nd[k] < dist_img[cur[0], cur[1]]
        return jnp.where(better, jnp.stack([ni[k], nj[k]]), cur)

    start = jnp.asarray(start_ij, jnp.int32)
    n_iters = (num_steps - 1 + _DESCENT_UNROLL - 1) // _DESCENT_UNROLL

    # Early-exit while loop: under vmap this runs until ALL batch lanes have
    # converged (reached the seed / a local min), so the sequential depth is
    # the longest actual path in the service batch, not the 512-step budget.
    # The loop counter `k` stays unbatched (uniform across lanes), keeping the
    # path write a dynamic_update_slice rather than a scatter.
    def descend_block(cur):
        outs = []
        for _u in range(_DESCENT_UNROLL):
            cur = descend(cur)
            outs.append(cur)
        return jnp.stack(outs)  # (_DESCENT_UNROLL, 2)

    def cond(carry):
        k, _cur, _path, _plen, done = carry
        return (k < n_iters) & ~done

    def body(carry):
        k, cur, path, plen, done = carry
        block = descend_block(cur)
        prev = jnp.concatenate([cur[None], block[:-1]], axis=0)
        moved = jnp.any(block != prev, axis=-1)
        path = jax.lax.dynamic_update_slice(
            path, block, (1 + k * _DESCENT_UNROLL, jnp.int32(0))
        )
        plen = plen + jnp.sum(moved.astype(jnp.int32))
        done = ~jnp.any(moved)
        return k + 1, block[-1], path, plen, done

    path0 = jnp.zeros((1 + n_iters * _DESCENT_UNROLL, 2), jnp.int32)
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
