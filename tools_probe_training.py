"""Instrumented training probe (VERDICT r1 #1b-d).

Trains lifting_1-small_empty with the production FusedTrainer and logs, per
log round: epsilon, loss, td_error, cubes/episode (trailing window), and —
the key learning indicators — greedy-action quality stats sampled from the
live loop (fraction of greedy clicks that land on a cube pixel / in the
receptacle while carrying) plus Q-map value stats.

Usage: python tools_probe_training.py [config] [total_timesteps]
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu.factory import env_params_from_cfg
from spatial_intention_maps_tpu.train.fused import FusedTrainer


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else (
        "configs/experiments/base/lifting_1-small_empty-base.yml"
    )
    cfg = config_mod.load_config(cfg_path)
    if len(sys.argv) > 2:
        cfg.total_timesteps = int(sys.argv[2])
    params = env_params_from_cfg(cfg)
    trainer = FusedTrainer(cfg, params, num_envs=cfg.num_parallel_envs, seed=0)

    ep_window = []  # (episodes, cubes) pairs
    t0 = time.time()
    out = open("/tmp/probe_metrics.jsonl", "w")

    clicks = dict(ee=0, ee_near=0, carry=0, carry_recep=0)

    def log_fn(timestep, metrics, m, _):
        ep_window.append((int(m["episodes"]), float(m["episode_cubes"])))
        if len(ep_window) > 200:
            ep_window.pop(0)
        eps_n = sum(e for e, _ in ep_window)
        cubes_n = sum(c for _, c in ep_window)
        clicks["ee"] += int(m.get("ee_clicks", 0))
        clicks["ee_near"] += int(m.get("ee_clicks_near_cube", 0))
        clicks["carry"] += int(m.get("carry_clicks", 0))
        clicks["carry_recep"] += int(m.get("carry_clicks_in_recep", 0))
        rec = dict(
            timestep=timestep,
            elapsed=round(time.time() - t0, 1),
            epsilon=round(metrics.get("epsilon", -1), 4),
            loss=metrics.get("loss/group_0"),
            td_error=metrics.get("td_error/group_0"),
            steps_per_sec=round(metrics.get("steps_per_sec", 0), 1),
            window_episodes=eps_n,
            window_cubes_per_ep=round(cubes_n / max(eps_n, 1), 3),
            ee_near_frac=round(clicks["ee_near"] / max(clicks["ee"], 1), 3),
            carry_recep_frac=round(
                clicks["carry_recep"] / max(clicks["carry"], 1), 3
            ),
        )
        for k in clicks:
            clicks[k] = int(clicks[k] * 0.9)  # trailing decay
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(rec, flush=True)

    trainer.run(log_fn=log_fn)

    from spatial_intention_maps_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint("/tmp/probe_ckpt", trainer.timestep, trainer,
                    include_buffers=False)
    print("probe done", flush=True)
    out.close()


if __name__ == "__main__":
    main()
