"""Probe the perception distance-field cache: dirt decay + round time.

Runs the flagship fused loop with random actions and prints, every
``window`` rounds: invalid cache rows (of B*R), wall ms/round over the
window, and served steps/s.  Shows when the occupancy maps saturate
(dirt -> 0) and what the cache is worth across an episode-reset cycle.

Usage: python tools_probe_cache.py [B] [M] [rounds] [window]
"""

import sys
import time

import jax
import jax.numpy as jnp

from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.train.fused import FusedLoop


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2400
    window = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    params = EnvParams.from_robot_config(
        [{"lifting_robot": 4}],
        env_name="small_divider",
        room_length=1.0,
        room_width=0.5,
        num_cubes=10,
        use_intention_map=True,
        intention_map_encoding="ramp",
    )
    loop = FusedLoop(params, num_envs=b, num_channels=params.num_state_channels,
                     substeps_per_round=64, service_capacity=m)
    print(f"B={b} M={m} budget={loop.percep_cache_budget} "
          f"cache={loop.use_percep_cache}", flush=True)
    ls = loop.init(jax.random.PRNGKey(0))

    @jax.jit
    def drive(ls):
        def body(ls, _):
            ls, _, mm = loop.round(ls, None, 1.0)
            return ls, mm["served"]
        ls, served = jax.lax.scan(body, ls, None, length=window)
        return ls, jnp.sum(served)

    ls, _ = drive(ls)  # compile + first window
    jax.block_until_ready(ls.env.robot_pos)
    for i in range(window, rounds, window):
        t0 = time.time()
        ls, served = drive(ls)
        served = int(served)
        dt = time.time() - t0
        dirty = (
            int(jnp.sum(~ls.percep_cache["valid"]))
            if loop.use_percep_cache else -1
        )
        print(
            f"round {i + window:5d}  dirty {dirty:5d}/{b * params.num_robots}"
            f"  {dt / window * 1000:7.2f} ms/round  "
            f"{served / dt:8.1f} steps/s",
            flush=True,
        )


if __name__ == "__main__":
    import os

    main()
    os._exit(0)
