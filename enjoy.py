"""Run a trained policy in the simulator or on physical robots
(enjoy.py:4-40 parity).

Sim: with --show-gui, renders the overhead view with matplotlib; otherwise
prints episode stats.  Real (--real): serves the policy against RealEnv —
ArUco pose servers must be running (python -m
spatial_intention_maps_tpu.real.aruco_server) and the Vector robots
reachable through the SDK (reference enjoy.py:13-17).
"""

import argparse
import sys

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import factory
from spatial_intention_maps_tpu.eval_policy import EvalPolicy


def main(cfg, show_gui=False, episodes=None, real=False,
         real_robot_indices=None, real_cube_indices=None):
    if real:
        env = factory.get_env_from_cfg(
            cfg, real=True,
            real_robot_indices=real_robot_indices,
            real_cube_indices=real_cube_indices,
        )
    else:
        env = factory.get_env_from_cfg(cfg, random_seed=cfg.get("random_seed"))
    policy = EvalPolicy(cfg)
    viewer = None
    if show_gui and not real:
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
    parser.add_argument("--real", action="store_true")
    parser.add_argument("--real-robot-indices", default="0,1,2,3")
    parser.add_argument("--real-cube-indices",
                        default="0,1,3,5,6,7,8,9,10,11")
    args = parser.parse_args()
    config_path = args.config_path or config_mod.select_run()
    if config_path is None:
        print("no run found")
        sys.exit(1)
    cfg = config_mod.load_config(config_path)
    rri = rci = None
    if args.real:
        num_robots = sum(n for g in cfg.robot_config for n in g.values())
        rri = list(map(int, args.real_robot_indices.split(",")))[:num_robots]
        rci = list(map(int, args.real_cube_indices.split(",")))[: cfg.num_cubes]
    main(cfg, args.show_gui, args.episodes, args.real, rri, rci)
