"""Benchmark: aggregate environment steps/sec, batched on one chip.

Prints ONE JSON line:
  {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N}

Config: lifting_4-small_divider with the intention map (the paper's flagship
"ours" configuration).  The baseline denominator is the BASELINE.json north
star scaled to one chip: 100k aggregate env steps/sec on v5e-8 => 12.5k per
chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.envs.vector_env import BatchedEnv
from spatial_intention_maps_tpu.policies import action_space_size

BASELINE_PER_CHIP = 12_500.0


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "64"))
    num_steps = int(os.environ.get("BENCH_NUM_STEPS", "6"))

    params = EnvParams.from_robot_config(
        [{"lifting_robot": 4}],
        env_name="small_divider",
        room_length=1.0,
        room_width=0.5,
        num_cubes=10,
        use_intention_map=True,
        intention_map_encoding="ramp",
    )
    env = BatchedEnv(params, num_envs)

    key = jax.random.PRNGKey(0)
    state, obs, obs_robot, obs_group = env.reset(key)
    jax.block_until_ready(obs)

    space = action_space_size(2)
    benv = jnp.arange(num_envs)

    def random_actions(key, obs_robot):
        a = jax.random.randint(key, (num_envs,), 0, space)
        out = jnp.full((num_envs, params.num_robots), -1, jnp.int32)
        return out.at[benv, obs_robot].set(a)

    # Warmup / compile.
    key, k = jax.random.split(key)
    out = env.step(state, random_actions(k, obs_robot))
    jax.block_until_ready(out[1])
    state, obs_robot = out[0], out[2]

    t0 = time.time()
    for _ in range(num_steps):
        key, k = jax.random.split(key)
        out = env.step(state, random_actions(k, obs_robot))
        state, obs_robot = out[0], out[2]
    jax.block_until_ready(out[1])
    elapsed = time.time() - t0

    steps_per_sec = num_envs * num_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
    os._exit(0)
