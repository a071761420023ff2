"""Probe what the trained throwing group actually does.

The eval npy only records total cubes (reference record format); per-robot
credit showed the lifting pair scoring everything in
lifting_2_throwing_2-large_empty.  This probe drives the trained policy
through the fused loop and counts, per robot group:

* throw attempts (cube-status rising edges into CUBE_THROWN),
* direct throw scores (per-robot cube credit on throwing rows),
* lifting scores,

to distinguish "throwers relay cubes closer while lifters finish"
(the partial-reward strategy the reference rewards via dist_closer,
envs.py:1331-1336) from "throwers learned nothing".

Usage: python tools_probe_throwing.py --config-path /tmp/eval_throwing.yml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import factory
from spatial_intention_maps_tpu.envs.types import CUBE_THROWN
from spatial_intention_maps_tpu.eval_policy import EvalPolicy
from spatial_intention_maps_tpu.train.fused import FusedLoop
from spatial_intention_maps_tpu import constants


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-path", required=True)
    ap.add_argument("--num-envs", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=1500)
    args = ap.parse_args()

    cfg = config_mod.load_config(args.config_path)
    params = factory.env_params_from_cfg(cfg)
    helper = EvalPolicy(cfg)
    loop = FusedLoop(
        params, num_envs=args.num_envs,
        num_channels=params.num_state_channels,
        substeps_per_round=64, service_capacity=args.num_envs,
        policy=helper.policy,
    )
    names = [constants.ROBOT_TYPES[t] for t in params.robot_types]
    throwing_rows = np.asarray([n == "throwing_robot" for n in names])

    ls = loop.init(jax.random.PRNGKey(0))
    prev_thrown = np.zeros((args.num_envs, params.num_cubes), bool)
    prev_cubes = np.zeros((args.num_envs, params.num_robots), np.int64)
    throws = 0
    scored = np.zeros(params.num_robots, np.int64)
    episodes = 0
    for r in range(args.rounds):
        ls, _, m = loop.round(ls, helper.variables, cfg.final_exploration, False)
        status = np.asarray(ls.env.cube_status)
        thrown = status == CUBE_THROWN
        throws += int((thrown & ~prev_thrown).sum())
        prev_thrown = thrown
        cubes = np.asarray(ls.env.cubes, np.int64)
        d = cubes - prev_cubes
        scored += np.where(d > 0, d, 0).sum(axis=0)
        prev_cubes = cubes
        episodes += int(m["episodes"])
        if r and r % 250 == 0:
            print(f"round {r}: episodes={episodes} throws={throws} "
                  f"scored_by_robot={scored.tolist()}", flush=True)
    print("FINAL:")
    print("  episodes:", episodes)
    print("  throw attempts:", throws)
    print("  scored by robot:", scored.tolist())
    print("  throwing-group direct scores:", int(scored[throwing_rows].sum()))
    print("  lifting-group scores:", int(scored[~throwing_rows].sum()))


if __name__ == "__main__":
    main()
    os._exit(0)
