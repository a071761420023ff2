"""Benchmark: aggregate environment steps/sec (batched, fused loop, one chip).

Prints ONE JSON line:
  {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N}

Config: lifting_4-small_divider with the intention map (the paper's flagship
"ours" configuration), driven by the fused substep-budget loop with random
actions.  One "env step" = one robot action served (the reference's timestep
unit).  The baseline denominator is the BASELINE.json north star scaled to
one chip: 100k aggregate env steps/sec on v5e-8 => 12.5k per chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.train.fused import FusedLoop

BASELINE_PER_CHIP = 12_500.0


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "512"))
    num_rounds = int(os.environ.get("BENCH_NUM_ROUNDS", "40"))
    substeps = int(os.environ.get("BENCH_SUBSTEPS", "64"))

    params = EnvParams.from_robot_config(
        [{"lifting_robot": 4}],
        env_name="small_divider",
        room_length=1.0,
        room_width=0.5,
        num_cubes=10,
        use_intention_map=True,
        intention_map_encoding="ramp",
    )
    loop = FusedLoop(
        params,
        num_envs=num_envs,
        num_channels=params.num_state_channels,
        substeps_per_round=substeps,
    )
    ls = loop.init(jax.random.PRNGKey(0))
    jax.block_until_ready(ls.env.robot_pos)

    # Warmup / compile + let the env mix of action phases reach steady state.
    for _ in range(3):
        ls, _, m = loop.round(ls)
    jax.block_until_ready(ls.env.robot_pos)

    served = 0
    t0 = time.time()
    for _ in range(num_rounds):
        ls, _, m = loop.round(ls)
        served += int(m["served"])
    jax.block_until_ready(ls.env.robot_pos)
    elapsed = time.time() - t0

    steps_per_sec = served / elapsed
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
