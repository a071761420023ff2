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

    post_fn = jax.jit(jax.vmap(
        lambda s, c, p: env_core.step_end_post(params, s, c, p)
    ))
    fin, _ = timeit("step_end_post (M)", post_fn, fin_pre, ctx, percep)

    obs_fn = jax.jit(jax.vmap(lambda s, p: env_core.observe(params, s, p)))
    timeit("observe (M)", obs_fn, fin, percep)

    actions = jnp.zeros((m, params.num_robots), jnp.int32) - 1
    actions = actions.at[:, 0].set(jnp.arange(m) % 9216)
    inj_fn = jax.jit(jax.vmap(
        lambda s, a, p: env_core.inject_action(params, s, a, p)
    ))
    timeit("inject incl. sweep (M)", inj_fn, fin, actions, percep)

    print(f"round total {total_ms:.2f} ms", flush=True)


if __name__ == "__main__":
    import os

    main()
    os._exit(0)
