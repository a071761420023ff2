"""Micro-benchmarks for the planner hot ops (backtrace + LOS string pull).

Builds realistic flagship inputs (real cspaces/distance images from a few
fused rounds, synthetic spread of long-path actions like the profiler), then
times implementation variants:

  backtrace: unroll 8 / 16 / 32 / 64
  string pull: bf16 rows-first (production), W-first contraction, int8 dots

Run on the real TPU:  python tools_bench_planner.py [B] [M]
"""

import sys
import time

import jax
import jax.numpy as jnp

from spatial_intention_maps_tpu.envs import env as env_core
from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.ops import paths, wavefront
from spatial_intention_maps_tpu.train.fused import FusedLoop


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1000
    print(f"{name:40s} {ms:8.2f} ms", flush=True)
    return out, ms


def los_variant(free_b, path_b, path_len_b, impl,
                stride=4, max_waypoints=8, los_samples=96, env_chunk=64):
    """simplify_path_batched with a configurable LOS lookup implementation.

    impl: 'rows_bf16' (production), 'cols_bf16' (contract W first),
    'rows_int8', 'cols_int8'.  Semantics identical across variants (one-hot
    exact lookups; int8 dots accumulate 0/1 values, no overflow)."""
    m, h, w = free_b.shape
    n_sub = path_b.shape[1] // stride + 1
    last = path_len_b - 1
    sub_idx = jnp.minimum(
        jnp.arange(n_sub, dtype=jnp.int32)[None, :] * stride, last[:, None]
    )
    menv = jnp.arange(m)
    pts = path_b[menv[:, None], sub_idx].astype(jnp.float32)
    dt = jnp.int8 if impl.endswith("int8") else jnp.bfloat16
    free_f = free_b.astype(dt)
    t = jnp.linspace(0.0, 1.0, los_samples, dtype=jnp.float32)
    iota_h = jnp.arange(h, dtype=jnp.int32)
    iota_w = jnp.arange(w, dtype=jnp.int32)

    def visible(anchor_pts, pts_c, free_c):
        ii = anchor_pts[:, None, None, 0] + t[None, None, :] * (
            pts_c[..., 0:1] - anchor_pts[:, None, None, 0]
        )
        jj = anchor_pts[:, None, None, 1] + t[None, None, :] * (
            pts_c[..., 1:2] - anchor_pts[:, None, None, 1]
        )
        mc = ii.shape[0]
        ii = jnp.clip(jnp.round(ii).astype(jnp.int32), 0, h - 1)
        jj = jnp.clip(jnp.round(jj).astype(jnp.int32), 0, w - 1)
        p = n_sub * los_samples
        ii = ii.reshape(mc, p)
        jj = jj.reshape(mc, p)
        oh_i = (ii[..., None] == iota_h).astype(dt)
        oh_j = (jj[..., None] == iota_w).astype(dt)
        if impl.startswith("rows"):
            if impl.endswith("int8"):
                rows = jnp.einsum("mph,mhw->mpw", oh_i, free_c,
                                  preferred_element_type=jnp.int32)
                vals = jnp.sum(rows * oh_j.astype(jnp.int32), axis=-1)
                ok = vals > 0
            else:
                rows = jnp.einsum("mph,mhw->mpw", oh_i, free_c)
                vals = jnp.sum(rows * oh_j, axis=-1)
                ok = vals > 0.5
        else:
            if impl.endswith("int8"):
                g = jnp.einsum("mhw,mpw->mph", free_c, oh_j,
                               preferred_element_type=jnp.int32)
                vals = jnp.sum(g * oh_i.astype(jnp.int32), axis=-1)
                ok = vals > 0
            else:
                g = jnp.einsum("mhw,mpw->mph", free_c, oh_j)
                vals = jnp.sum(g * oh_i, axis=-1)
                ok = vals > 0.5
        return jnp.all(ok.reshape(mc, n_sub, los_samples), axis=-1)

    idxs = jnp.arange(n_sub, dtype=jnp.int32)
    n_chunks = max(1, m // env_chunk) if m % env_chunk == 0 else 1
    n_its = max_waypoints - 1

    def cond(carry):
        k, _a, done, _w, _v = carry
        return (k < n_its) & ~jnp.all(done)

    def body(carry):
        k, a_idx, done, wps, valid = carry
        anchor = pts[menv, a_idx]
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
        nxt = jnp.max(cand, axis=1)
        nxt = jnp.where(nxt < 0, jnp.minimum(a_idx + 1, n_sub - 1), nxt)
        nxt = jnp.where(done, a_idx, nxt)
        new_done = done | (sub_idx[menv, nxt] >= last)
        wps = jax.lax.dynamic_update_slice(wps, pts[menv, nxt][None], (k, 0, 0))
        valid = jax.lax.dynamic_update_slice(valid, (~done)[None], (k, 0))
        return k + 1, nxt, new_done, wps, valid

    init = (
        jnp.int32(0), jnp.zeros(m, jnp.int32), jnp.zeros(m, bool),
        jnp.zeros((n_its, m, 2), jnp.float32), jnp.zeros((n_its, m), bool),
    )
    k_end, a_end, _, wps, valid = jax.lax.while_loop(cond, body, init)
    tail = jnp.arange(n_its)[:, None] >= k_end
    frozen = pts[menv, a_end]
    wps = jnp.where(tail[..., None], frozen[None], wps)
    wps = jnp.moveaxis(wps, 0, 1)
    valid = jnp.moveaxis(valid, 0, 1)
    waypoints = jnp.concatenate([pts[:, :1], wps], axis=1)
    num_wp = 1 + jnp.sum(valid.astype(jnp.int32), axis=1)
    end_pt = pts[:, n_sub - 1]
    waypoints = jnp.where(
        (jnp.arange(max_waypoints)[None] == (num_wp - 1)[:, None])[..., None],
        end_pt[:, None], waypoints,
    )
    return waypoints, num_wp


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    params = EnvParams.from_robot_config(
        [{"lifting_robot": 4}],
        env_name="small_divider",
        room_length=1.0,
        room_width=0.5,
        num_cubes=10,
        use_intention_map=True,
        intention_map_encoding="ramp",
    )
    h_px, w_px = params.map_shape
    print(f"B={b} M={m} map={h_px}x{w_px}", flush=True)
    # use_percep_cache=False: the setup rounds only produce realistic state;
    # the uncached round graph is already in the XLA compile cache.
    loop = FusedLoop(params, num_envs=b, num_channels=params.num_state_channels,
                     substeps_per_round=64, service_capacity=m,
                     use_percep_cache=False)
    ls = loop.init(jax.random.PRNGKey(0))
    for _ in range(4):
        ls, _, _ = loop.round(ls, None, 1.0)
    jax.block_until_ready(ls.env.robot_pos)

    sub = jax.tree.map(lambda x: x[:m], ls.env)
    (fin_pre, _ctx) = jax.jit(jax.vmap(
        lambda s: env_core.step_end_pre(params, s)))(sub)
    percep = jax.jit(
        lambda s: env_core.perception_pass_batched(params, s))(fin_pre)

    # Long-path synthetic actions (profiler convention): spread across map.
    actions = jnp.zeros((m, params.num_robots), jnp.int32) - 1
    actions = actions.at[:, 0].set(jnp.arange(m) % 9216)
    _, _, _, _, _, tee = jax.jit(jax.vmap(
        lambda s, a: env_core.compute_action_target(params, s, a)
    ))(fin_pre, actions)
    menv = jnp.arange(m)
    robot = jnp.argmax(fin_pre.awaiting, axis=1)
    cs_act = percep["cspaces"][menv, robot]
    snap_act = percep["snaps"][menv, robot]
    ti, tj = env_core.geometry.position_to_pixel(tee[:, 0], tee[:, 1], h_px, w_px)
    flat = snap_act[menv, ti, tj]
    ti, tj = flat // w_px, flat % w_px
    free_b = cs_act.at[menv, ti, tj].set(True)
    dist0 = jnp.full((m, h_px, w_px), 1e9, jnp.float32)
    dist0 = dist0.at[menv, ti, tj].set(0.0)
    pay0 = jnp.zeros((m, h_px, w_px), jnp.int32)
    plan_dist, _ = jax.jit(lambda d, p, f: wavefront.sweep_batched(
        d, p, f, params.num_pass_pairs))(dist0, pay0, free_b)
    rpos = fin_pre.robot_pos[menv, robot]
    si, sj = env_core.geometry.position_to_pixel(rpos[:, 0], rpos[:, 1], h_px, w_px)
    sflat = snap_act[menv, si, sj]
    src = jnp.stack([sflat // w_px, sflat % w_px], axis=-1)

    # --- backtrace variants ---
    ref = None
    for unroll in (8, 16, 32, 64):
        fn = jax.jit(jax.vmap(
            lambda d, s, u=unroll: paths.backtrace(d, s, unroll=u)))
        (path_b, plen_b), _ = timeit(f"backtrace unroll={unroll}", fn,
                                     plan_dist, src)
        if ref is None:
            ref = (path_b, plen_b)
        else:
            same = bool(jnp.all(ref[0] == path_b) and jnp.all(ref[1] == plen_b))
            print(f"  match unroll=8: {same}", flush=True)
    path_b, plen_b = ref

    # parent_dir_image alone (the non-sequential part of backtrace)
    timeit("  parent_dir_image only", jax.jit(jax.vmap(paths.parent_dir_image)),
           plan_dist)

    # --- string pull variants ---
    (wp_ref, n_ref), _ = timeit(
        "string pull production", jax.jit(paths.simplify_path_batched),
        cs_act, path_b, plen_b)
    for impl in ("rows_bf16", "cols_bf16", "rows_int8", "cols_int8"):
        fn = jax.jit(lambda f, p, l, i=impl: los_variant(f, p, l, i))
        (wp, n_wp), _ = timeit(f"string pull {impl}", fn, cs_act, path_b, plen_b)
        same = bool(jnp.all(wp == wp_ref) and jnp.all(n_wp == n_ref))
        print(f"  match production: {same}", flush=True)


if __name__ == "__main__":
    import os

    main()
    os._exit(0)
