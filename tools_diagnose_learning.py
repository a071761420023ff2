"""Round-2 diagnostic: does the env produce a learnable reward signal?

Runs the fused loop with RANDOM actions on lifting_1-small_empty and reports
what actually lands in the transition stream: reward distribution, success
events, lift events, pointless drops, collisions, episode cube counts.
This is the instrumentation VERDICT.md round-1 asked for (weak #1, next #1b).
"""

import collections
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu.factory import env_params_from_cfg
from spatial_intention_maps_tpu.train.fused import FusedLoop


def main():
    cfg = config_mod.load_config("configs/experiments/base/lifting_1-small_empty-base.yml")
    params = env_params_from_cfg(cfg)
    B = 32
    loop = FusedLoop(params, num_envs=B, num_channels=cfg.num_input_channels,
                     substeps_per_round=64, policy=None)
    key = jax.random.PRNGKey(0)
    ls = loop.init(key)

    total_served = 0
    total_eps = 0
    total_ep_cubes = 0
    rewards = []
    lift_events = 0
    drop_success = 0
    pointless = 0
    coll_obs = 0
    coll_rob = 0
    prev_lifting = np.asarray(ls.env.lifting)
    prev_cum_cubes = np.asarray(ls.env.cum_cubes)

    n_rounds = 400
    for i in range(n_rounds):
        ls, trans, m = loop.round(ls, None, 1.0)
        mask = np.asarray(trans["mask"])
        rew = np.broadcast_to(np.asarray(trans["reward"]), mask.shape)
        rewards.append(rew[mask])
        total_served += int(m["served"])
        total_eps += int(m["episodes"])
        total_ep_cubes += int(m["episode_cubes"])
        lifting = np.asarray(ls.env.lifting)
        lift_events += int(np.sum(lifting & ~prev_lifting))
        prev_lifting = lifting
        cum = np.asarray(ls.env.cum_cubes)
        # cum_cubes resets on env auto-reset; count only increases
        drop_success += int(np.sum(np.maximum(cum - prev_cum_cubes, 0)))
        prev_cum_cubes = cum
        pointless += int(np.sum(np.asarray(ls.env.pointless_drop)))
        if i % 50 == 0:
            print(f"round {i}: served={total_served} eps={total_eps} "
                  f"ep_cubes={total_ep_cubes} lifts={lift_events} "
                  f"scored={drop_success}", flush=True)

    rewards = np.concatenate(rewards) if rewards else np.zeros(0)
    print("=" * 60)
    print(f"total transitions: {len(rewards)} (served={total_served})")
    print(f"episodes finished: {total_eps}, total episode cubes: {total_ep_cubes}")
    print(f"lift events (0->1): {lift_events}")
    print(f"cum_cubes increments observed: {drop_success}")
    nz = rewards[rewards != 0]
    print(f"reward nonzero frac: {len(nz)/max(len(rewards),1):.4f}")
    if len(nz):
        print(f"reward nonzero: mean={nz.mean():.4f} min={nz.min():.4f} "
              f"max={nz.max():.4f}")
        print("histogram:",
              collections.Counter(np.round(nz, 2)).most_common(20))
    n_success = int(np.sum(rewards >= 0.9))
    print(f"transitions with reward >= 0.9 (success-ish): {n_success}")
    # Dump a sample observation for channel inspection.
    obs = np.asarray(ls.stored_obs[0], np.float32)
    np.save("/tmp/diag_obs.npy", obs)
    print("obs stats per channel:",
          [(c, float(obs[..., c].min()), float(obs[..., c].max()),
            float(obs[..., c].mean())) for c in range(obs.shape[-1])])
    os._exit(0)


if __name__ == "__main__":
    main()
