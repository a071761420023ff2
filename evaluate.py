"""Evaluation protocol (evaluate.py:10-58 parity): 20 episodes at fixed seed
0, recording per-step {simulation_steps, cubes, robot_collisions}, saved to
eval/<run_name>.npy for eval_summary analysis."""

import argparse
import sys
from pathlib import Path

import numpy as np

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import factory
from spatial_intention_maps_tpu.eval_policy import EvalPolicy


EVAL_SEED = 0  # fixed-seed protocol (evaluate.py:11)
RECORD_KEYS = ("simulation_steps", "cubes", "robot_collisions")


def _rollout_episode(env, policy):
    """One greedy episode; returns the per-step record list.

    Records carry the reference's metric keys (the parity spec consumed by
    eval_summary): simulation_steps / cubes / robot_collisions.
    """
    state = env.reset()
    records = []
    done = False
    while not done:
        state, _, done, info = env.step(policy.step(state))
        records.append(
            dict(
                simulation_steps=int(info["simulation_steps"]),
                cubes=int(info["total_cubes"]),
                robot_collisions=int(info["total_robot_collisions"]),
            )
        )
    return records


def run_eval(cfg, num_episodes=20, policy=None):
    env = factory.get_env_from_cfg(cfg, random_seed=EVAL_SEED)
    policy = EvalPolicy(cfg) if policy is None else policy
    episodes = []
    for _ in range(num_episodes):
        records = _rollout_episode(env, policy)
        episodes.append(records)
        last = records[-1] if records else {}
        print(
            f"episode {len(episodes)}/{num_episodes}: "
            f"cubes={last.get('cubes', 0)} "
            f"sim_steps={last.get('simulation_steps', 0)}",
            flush=True,
        )
    return episodes


def main(cfg, num_episodes):
    eval_dir = config_mod.get_eval_dir()
    data = run_eval(cfg, num_episodes)
    eval_dir.mkdir(parents=True, exist_ok=True)
    eval_path = eval_dir / "{}.npy".format(cfg.run_name)
    np.save(eval_path, np.array(data, dtype=object), allow_pickle=True)
    print(eval_path)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-path")
    parser.add_argument("--num-episodes", type=int, default=20)
    args = parser.parse_args()
    config_path = args.config_path or config_mod.select_run()
    if config_path is None:
        print("no run found")
        sys.exit(1)
    main(config_mod.load_config(config_path), args.num_episodes)
