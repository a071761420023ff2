"""Greedy-policy behavior inspector (learning-dynamics audit).

Rolls a trained policy through SimEnv with eps=0 and prints, per action:
carrying state, chosen channel, decoded world target, distance from the
click to the nearest available cube / whether it lands in the receptacle,
and the step reward.  Optionally saves state|Q visualization panels.

Usage: python tools_inspect_policy.py <policy_path> [config] [n_steps]
"""

import math
import sys

import numpy as np

from spatial_intention_maps_tpu import config as config_mod, constants
from spatial_intention_maps_tpu.envs.vector_env import SimEnv
from spatial_intention_maps_tpu.eval_policy import EvalPolicy
from spatial_intention_maps_tpu.factory import env_params_from_cfg

N = constants.LOCAL_MAP_PIXEL_WIDTH


def decode(action, pos, heading):
    ch = action // (N * N)
    pi = (action // N) % N
    pj = action % N
    ppm = constants.LOCAL_MAP_PIXELS_PER_METER
    dx = ((pj + 0.5) - N / 2) / ppm
    dy = (N / 2 - (pi + 0.5)) / ppm
    dist = math.hypot(dx, dy)
    theta = heading + math.atan2(-dx, dy)
    return ch, (pos[0] + dist * math.cos(theta), pos[1] + dist * math.sin(theta))


def main():
    policy_path = sys.argv[1]
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else (
        "configs/experiments/base/lifting_1-small_empty-base.yml"
    )
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    cfg = config_mod.load_config(cfg_path)
    cfg.policy_path = policy_path
    params = env_params_from_cfg(cfg)
    policy = EvalPolicy(cfg)
    env = SimEnv(params, seed=0)
    nested = env.reset()

    rx_ry = params.receptacle_position
    for t in range(n_steps):
        action, dbg = policy.step(nested, exploration_eps=0.0, debug=True)
        st = env.state
        r = int(np.argmax(np.asarray(st.awaiting)))
        pos = np.asarray(st.robot_pos[r])
        heading = float(st.robot_heading[r])
        carrying = bool(st.lifting[r])
        flat = next(a for g in action for a in g if a is not None)
        ch, tgt = decode(flat, pos, heading)
        cube_xy = np.asarray(st.cube_pos[:, :2])
        avail = np.asarray(st.cube_status) == 0
        d = np.linalg.norm(cube_xy - np.asarray(tgt)[None], axis=-1)
        d_cube = float(d[avail].min()) if avail.any() else float("nan")
        in_recep = (
            tgt[0] > rx_ry[0] - 0.053 and tgt[1] > rx_ry[1] - 0.053
            if rx_ry else False
        )
        q = next(x for g in dbg["output"] for x in g if x is not None)
        nested, reward, done, info = env.step(action)
        rew = next((x for g in reward for x in g if x is not None), None)
        print(
            f"t={t:3d} carry={int(carrying)} ch={ch} tgt=({tgt[0]:+.2f},{tgt[1]:+.2f}) "
            f"d_cube={d_cube:.3f} in_recep={int(in_recep)} "
            f"q=[{np.min(q):+.3f},{np.max(q):+.3f}] r={rew} "
            f"cubes={int(np.asarray(st.cum_cubes).sum())}",
            flush=True,
        )
        if done:
            print(f"episode done at t={t}, total cubes="
                  f"{int(info['total_cubes'])}")
            nested = env.reset()


if __name__ == "__main__":
    main()
    import os
    os._exit(0)
