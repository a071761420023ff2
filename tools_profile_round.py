"""Per-phase timing of the fused round (PERF.md phase table).

Times each stage of FusedLoop.round separately at a given env batch B and
service batch M, on the flagship config.  Run on the real TPU.

Usage: python tools_profile_round.py [B] [M] [substeps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

from spatial_intention_maps_tpu.envs import env as env_core
from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.train.fused import FusedLoop


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1000
    print(f"{name:24s} {ms:8.2f} ms", flush=True)
    return out, ms


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    m = int(sys.argv[2]) if len(sys.argv) > 2 else max(8, b // 4)
    substeps = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    params = EnvParams.from_robot_config(
        [{"lifting_robot": 4}],
        env_name="small_divider",
        room_length=1.0,
        room_width=0.5,
        num_cubes=10,
        use_intention_map=True,
        intention_map_encoding="ramp",
    )
    print(f"B={b} M={m} substeps={substeps}", flush=True)
    ps = os.environ.get("BENCH_PALLAS_SUBSTEP")
    loop = FusedLoop(params, num_envs=b, num_channels=params.num_state_channels,
                     substeps_per_round=substeps, service_capacity=m,
                     use_pallas_substep=None if ps is None else bool(int(ps)))
    ls = loop.init(jax.random.PRNGKey(0))

    # Mix phases: run some rounds first.
    for _ in range(4):
        ls, _, _ = loop.round(ls, None, 1.0)
    jax.block_until_ready(ls.env.robot_pos)

    total_ms = timeit("full round", lambda s: loop.round(s, None, 1.0)[0], ls)[1]

    env = ls.env
    sub = jax.tree.map(lambda x: x[:m], env)

    if loop.use_pallas_substep:
        from spatial_intention_maps_tpu.ops import pallas_substep
        substep_fn = jax.jit(lambda s: pallas_substep.run_substeps_pallas(
            params, s, substeps, block_b=loop._substep_block))
        timeit(f"substeps x{substeps} (B, pallas)", substep_fn, env)
    else:
        substep_fn = jax.jit(jax.vmap(
            lambda s: env_core.run_substeps(params, s, substeps, refresh=False)
        ))
        timeit(f"substeps x{substeps} (B)", substep_fn, env)

    refresh_fn = jax.jit(jax.vmap(
        lambda s: env_core.mid_action_map_refresh(params, s)
    ))
    timeit("map refresh (B)", refresh_fn, env)

    pre_fn = jax.jit(jax.vmap(lambda s: env_core.step_end_pre(params, s)))
    (fin_pre, ctx), _ = timeit("step_end_pre (M)", pre_fn, sub)

    percep_fn = jax.jit(lambda s: env_core.perception_pass_batched(params, s))
    percep, _ = timeit("perception (M)", percep_fn, fin_pre)

    # Cached perception: all-clean cache (steady state) vs all-dirty.
    budget = max(8, m // 2)
    cache_clean = {
        "cspaces": percep["cspaces"], "snaps": percep["snaps"],
        "valid": jnp.ones((m, params.num_robots), bool),
    }
    if params.has_receptacle:
        cache_clean["recep_imgs"] = percep["recep_imgs"]
    cached_fn = jax.jit(
        lambda s, c: env_core.perception_pass_batched_cached(params, s, c, budget)
    )
    timeit("perception cached/clean (M)", cached_fn, fin_pre, cache_clean)
    cache_dirty = dict(cache_clean, valid=jnp.zeros((m, params.num_robots), bool))
    timeit("perception cached/dirty (M)", cached_fn, fin_pre, cache_dirty)

    post_fn = jax.jit(jax.vmap(
        lambda s, c, p: env_core.step_end_post(params, s, c, p)
    ))
    fin, _ = timeit("step_end_post (M)", post_fn, fin_pre, ctx, percep)

    obs_fn = jax.jit(jax.vmap(lambda s, p: env_core.observe(params, s, p)))
    timeit("observe (M)", obs_fn, fin, percep)

    if params.use_intention_map:
        from spatial_intention_maps_tpu.envs import mapper as mapper_mod
        imap_fn = jax.jit(jax.vmap(
            lambda s: mapper_mod.global_intention_or_history_map(
                params, s, jnp.argmax(s.awaiting), params.intention_map_encoding
            )
        ))
        timeit("  observe: intention map (M)", imap_fn, fin)

    # observe sub-phase: the egocentric MXU crop alone (synthetic stacks of
    # the same shape), to split channel assembly vs crop cost
    from spatial_intention_maps_tpu.ops import raster_ops
    h_px, w_px = params.map_shape
    n_glob = params.num_state_channels
    stacks = jnp.ones((m, h_px, w_px, n_glob), jnp.float32)
    pos_m = fin.robot_pos[:, 0]
    head_m = fin.robot_heading[:, 0]
    crop_fn = jax.jit(jax.vmap(raster_ops.extract_local_maps_mxu))
    timeit("  observe: crop (M)", crop_fn, stacks, pos_m, head_m)
    if jax.default_backend() == "tpu":
        from spatial_intention_maps_tpu.ops import pallas_crop
        for variant in ("reduce", "matvec", "jfirst", "wide"):
            pcrop_fn = jax.jit(jax.vmap(
                lambda g, p, h, v=variant:
                pallas_crop.extract_local_maps_pallas(g, p, h, variant=v)
            ))
            timeit(f"  observe: crop pallas/{variant} (M)",
                   pcrop_fn, stacks, pos_m, head_m)

    # The planner exactly as the fused round runs it (fused.py:283-326):
    # batched target-seeded Pallas sweep + backtrace + MXU string pulling,
    # then inject with the plan supplied.  (Timing inject WITHOUT the plan
    # measures the standalone per-env planner the round never executes.)
    actions = jnp.zeros((m, params.num_robots), jnp.int32) - 1
    actions = actions.at[:, 0].set(jnp.arange(m) % 9216)

    def plan(sub, actions, percep):
        _, _, _, _, _, tee = jax.vmap(
            lambda s, a: env_core.compute_action_target(params, s, a)
        )(sub, actions)
        menv = jnp.arange(m)
        robot = jnp.argmax(sub.awaiting, axis=1)
        cs_act = percep["cspaces"][menv, robot]
        snap_act = percep["snaps"][menv, robot]
        ti, tj = env_core.geometry.position_to_pixel(tee[:, 0], tee[:, 1], h_px, w_px)
        flat = snap_act[menv, ti, tj]
        ti, tj = flat // w_px, flat % w_px
        free_b = cs_act.at[menv, ti, tj].set(True)
        dist0 = jnp.full((m, h_px, w_px), 1e9, jnp.float32)
        dist0 = dist0.at[menv, ti, tj].set(0.0)
        pay0 = jnp.zeros((m, h_px, w_px), jnp.int32)
        plan_dist, _ = env_core.wavefront.sweep_batched(
            dist0, pay0, free_b, params.num_pass_pairs
        )
        rpos = sub.robot_pos[menv, robot]
        si, sj = env_core.geometry.position_to_pixel(rpos[:, 0], rpos[:, 1], h_px, w_px)
        sflat = snap_act[menv, si, sj]
        src = jnp.stack([sflat // w_px, sflat % w_px], axis=-1)
        path_b, plen_b = jax.vmap(env_core.paths.backtrace)(plan_dist, src)
        plan_wps = env_core.paths.simplify_path_batched(cs_act, path_b, plen_b)
        return plan_dist, plan_wps

    plan_fn = jax.jit(plan)
    (plan_dist, plan_wps), _ = timeit("plan sweep+trace (M)", plan_fn, fin, actions, percep)

    # plan sub-phases: seeded sweep / greedy backtrace / LOS string pulling
    def plan_seed(sub, actions, percep):
        _, _, _, _, _, tee = jax.vmap(
            lambda s, a: env_core.compute_action_target(params, s, a)
        )(sub, actions)
        menv = jnp.arange(m)
        robot = jnp.argmax(sub.awaiting, axis=1)
        cs_act = percep["cspaces"][menv, robot]
        snap_act = percep["snaps"][menv, robot]
        ti, tj = env_core.geometry.position_to_pixel(tee[:, 0], tee[:, 1], h_px, w_px)
        flat = snap_act[menv, ti, tj]
        ti, tj = flat // w_px, flat % w_px
        free_b = cs_act.at[menv, ti, tj].set(True)
        dist0 = jnp.full((m, h_px, w_px), 1e9, jnp.float32)
        dist0 = dist0.at[menv, ti, tj].set(0.0)
        pay0 = jnp.zeros((m, h_px, w_px), jnp.int32)
        rpos = sub.robot_pos[menv, robot]
        si, sj = env_core.geometry.position_to_pixel(rpos[:, 0], rpos[:, 1], h_px, w_px)
        sflat = snap_act[menv, si, sj]
        src = jnp.stack([sflat // w_px, sflat % w_px], axis=-1)
        return dist0, pay0, free_b, cs_act, src

    seed_fn = jax.jit(plan_seed)
    (dist0, pay0, free_b, cs_act, src), _ = timeit(
        "  plan: seed (M)", seed_fn, fin, actions, percep)
    sweep_fn = jax.jit(lambda d, p, f: env_core.wavefront.sweep_batched(
        d, p, f, params.num_pass_pairs))
    (plan_dist2, _pay), _ = timeit("  plan: sweep (M)", sweep_fn, dist0, pay0, free_b)
    bt_fn = jax.jit(jax.vmap(env_core.paths.backtrace))
    (path_b, plen_b), _ = timeit("  plan: backtrace (M)", bt_fn, plan_dist2, src)
    sp_fn = jax.jit(env_core.paths.simplify_path_batched)
    timeit("  plan: string-pull (M)", sp_fn, cs_act, path_b, plen_b)

    inj_fn = jax.jit(jax.vmap(
        lambda s, a, p, pd, w_, n_: env_core.inject_action(
            params, s, a, p, pd, plan_waypoints=(w_, n_)
        )
    ))
    timeit("inject w/ plan (M)", inj_fn, fin, actions, percep,
           plan_dist, plan_wps[0], plan_wps[1])

    print(f"round total {total_ms:.2f} ms", flush=True)


if __name__ == "__main__":
    import os

    main()
    os._exit(0)
