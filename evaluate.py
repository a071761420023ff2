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


def run_eval(cfg, num_episodes=20, policy=None):
    random_seed = 0  # evaluate.py:11
    env = factory.get_env_from_cfg(cfg, random_seed=random_seed)
    if policy is None:
        policy = EvalPolicy(cfg)

    data = [[] for _ in range(num_episodes)]
    episode_count = 0
    state = env.reset()
    while True:
        action = policy.step(state)
        state, _, done, info = env.step(action)
        data[episode_count].append(
            {
                "simulation_steps": int(info["simulation_steps"]),
                "cubes": int(info["total_cubes"]),
                "robot_collisions": int(info["total_robot_collisions"]),
            }
        )
        if done:
            episode_count += 1
            print("Completed {}/{} episodes".format(episode_count, num_episodes))
            if episode_count >= num_episodes:
                break
            state = env.reset()
    return data


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
