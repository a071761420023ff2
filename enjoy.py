"""Run a trained policy in the simulator (enjoy.py:4-40 parity).

With --show-gui, renders the overhead view with matplotlib; otherwise prints
episode stats.
"""

import argparse
import sys

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import factory
from spatial_intention_maps_tpu.eval_policy import EvalPolicy


def main(cfg, show_gui=False, episodes=None):
    env = factory.get_env_from_cfg(cfg, random_seed=cfg.get("random_seed"))
    policy = EvalPolicy(cfg)
    viewer = None
    if show_gui:
        from spatial_intention_maps_tpu.utils.visualization import EnvViewer

        viewer = EnvViewer(env)

    state = env.reset()
    ep = 0
    while True:
        action = policy.step(state)
        state, _, done, info = env.step(action)
        if viewer is not None:
            viewer.update()
        if done:
            ep += 1
            print(
                "episode {} done: steps={} cubes={}".format(
                    ep, int(info["steps"]), int(info["total_cubes"])
                )
            )
            if episodes is not None and ep >= episodes:
                break
            state = env.reset()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-path")
    parser.add_argument("--show-gui", action="store_true")
    parser.add_argument("--episodes", type=int, default=None)
    args = parser.parse_args()
    config_path = args.config_path or config_mod.select_run()
    if config_path is None:
        print("no run found")
        sys.exit(1)
    main(config_mod.load_config(config_path), args.show_gui, args.episodes)
