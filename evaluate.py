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


def run_eval_batched(cfg, num_episodes=20, max_actions=2000, max_seconds=2700):
    """Protocol-equivalent batched eval: ``num_episodes`` envs (episode keys
    split from seed 0) each roll ONE greedy episode in parallel through the
    jitted BatchedEnv — same per-step records, ~num_episodes x faster on a
    remote-attached chip than the sequential reference protocol.

    Episodes that exceed ``max_actions`` / ``max_seconds`` are returned
    truncated (their cubes-vs-steps records up to the cap still feed the
    cutoff analysis; a run is never lost to one degenerate episode).
    """
    import time

    import jax
    import jax.numpy as jnp

    from spatial_intention_maps_tpu.envs.vector_env import BatchedEnv

    params = factory.env_params_from_cfg(cfg)
    helper = EvalPolicy(cfg)  # loads variables from cfg.policy_path
    policy, variables = helper.policy, helper.variables
    act = jax.jit(lambda v, obs, g, k: policy.act(
        v, obs, g, cfg.final_exploration, k
    )[0])

    b = num_episodes
    env = BatchedEnv(params, b)
    state, obs, robot, group = env.reset(jax.random.PRNGKey(EVAL_SEED))
    active = np.ones(b, bool)
    episodes = [[] for _ in range(b)]
    key = jax.random.PRNGKey(EVAL_SEED + 1)
    benv = jnp.arange(b)
    t0 = time.time()
    for t in range(max_actions):
        if time.time() - t0 > max_seconds:
            print(f"eval wall cap hit at action {t}; "
                  f"{int(active.sum())} episode(s) truncated", flush=True)
            break
        if t and t % 200 == 0:
            print(f"action {t}: {b - int(active.sum())}/{b} episodes done",
                  flush=True)
        key, k = jax.random.split(key)
        acts = act(variables, obs, group, k)
        actions_br = jnp.full((b, params.num_robots), -1, jnp.int32)
        actions_br = actions_br.at[benv, robot].set(acts)
        state, obs, robot, group, reward, done, info = env.step(state, actions_br)
        sim = np.asarray(info["simulation_steps"])
        cubes = np.asarray(info["total_cubes"])
        colls = np.asarray(info["total_robot_collisions"])
        done_np = np.asarray(done)
        for e in range(b):
            if not active[e]:
                continue
            episodes[e].append(
                dict(
                    simulation_steps=int(sim[e]),
                    cubes=int(cubes[e]),
                    robot_collisions=int(colls[e]),
                )
            )
        finished = active & done_np
        if finished.any():
            for e in np.nonzero(finished)[0]:
                rec = episodes[e][-1]
                print(
                    f"episode done (env {e}): cubes={rec['cubes']} "
                    f"sim_steps={rec['simulation_steps']}",
                    flush=True,
                )
        active &= ~done_np
        if not active.any():
            break
    # Episodes cut off by max_actions/max_seconds did NOT terminate by task
    # rules (all cubes / inactivity cutoff, envs.py:163, 294) — mark them so
    # eval_summary can surface the protocol divergence instead of silently
    # treating the capped record as a finished episode.
    for e in np.nonzero(active)[0]:
        if episodes[e]:
            episodes[e][-1]["truncated"] = True
    return episodes


def run_eval_fused(cfg, num_episodes=20, max_rounds=40000, max_seconds=2700):
    """Protocol-equivalent eval through the fused substep-budget loop.

    The lockstep BatchedEnv steps to the SLOWEST env every action (~1000
    on-device substeps per step at B=20), while the fused loop advances all
    envs 64 substeps per round and services action boundaries as they
    arrive — the same per-env trajectories (tests/test_fused_equivalence),
    ~10x the eval throughput.  Per-round episode records come back through
    small stacked arrays (one host read per K rounds — a remote-attached
    TPU pays ~50 ms RTT per transfer).

    Episodes that out-run ``max_rounds``/``max_seconds`` are flagged
    truncated, like run_eval_batched.
    """
    import time

    import jax
    import jax.numpy as jnp

    from spatial_intention_maps_tpu.train.fused import FusedLoop

    params = factory.env_params_from_cfg(cfg)
    helper = EvalPolicy(cfg)
    policy, variables = helper.policy, helper.variables
    eps = cfg.final_exploration

    b = num_episodes
    loop = FusedLoop(
        params, num_envs=b, num_channels=params.num_state_channels,
        substeps_per_round=64, service_capacity=b, policy=policy,
    )
    k_rounds = 32

    @jax.jit
    def drive(ls):
        def body(ls, _):
            ls, trans, _m = loop._round(ls, variables, eps, False)
            rec = {
                k: trans[k]
                for k in ("env", "fin", "done", "sim_steps", "cubes",
                          "cubes_by_robot", "collisions")
            }
            return ls, rec
        return jax.lax.scan(body, ls, None, length=k_rounds)

    ls = loop.init(jax.random.PRNGKey(EVAL_SEED))
    episodes = [[] for _ in range(b)]
    active = np.ones(b, bool)
    t0 = time.time()
    for block in range(max_rounds // k_rounds):
        ls, recs = drive(ls)
        recs = {k: np.asarray(v) for k, v in recs.items()}
        for k in range(k_rounds):
            for row in np.nonzero(recs["fin"][k])[0]:
                e = int(recs["env"][k][row])
                if e < 0 or not active[e]:
                    continue
                episodes[e].append(
                    dict(
                        simulation_steps=int(recs["sim_steps"][k][row]),
                        cubes=int(recs["cubes"][k][row]),
                        # extra key beyond the reference record format:
                        # per-robot credit, so heterogeneous-team evals can
                        # show every group scoring
                        cubes_by_robot=recs["cubes_by_robot"][k][row].tolist(),
                        robot_collisions=int(recs["collisions"][k][row]),
                    )
                )
                if bool(recs["done"][k][row]):
                    active[e] = False
                    rec = episodes[e][-1]
                    print(
                        f"episode done (env {e}): cubes={rec['cubes']} "
                        f"sim_steps={rec['simulation_steps']}",
                        flush=True,
                    )
        if not active.any():
            break
        if time.time() - t0 > max_seconds:
            print(f"eval wall cap hit; {int(active.sum())} episode(s) "
                  f"truncated", flush=True)
            break
        if block and block % 8 == 0:
            print(f"round {block * k_rounds}: "
                  f"{b - int(active.sum())}/{b} episodes done", flush=True)
    for e in np.nonzero(active)[0]:
        if episodes[e]:
            episodes[e][-1]["truncated"] = True
    return episodes


def main(cfg, num_episodes, batched=False, max_actions=2000, max_seconds=2700,
         fused=False):
    eval_dir = config_mod.get_eval_dir()
    if fused:
        data = run_eval_fused(cfg, num_episodes, max_seconds=max_seconds)
    elif batched:
        data = run_eval_batched(cfg, num_episodes, max_actions=max_actions,
                                max_seconds=max_seconds)
    else:
        data = run_eval(cfg, num_episodes)
    eval_dir.mkdir(parents=True, exist_ok=True)
    eval_path = eval_dir / "{}.npy".format(cfg.run_name)
    np.save(eval_path, np.array(data, dtype=object), allow_pickle=True)
    print(eval_path)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-path")
    parser.add_argument("--num-episodes", type=int, default=20)
    parser.add_argument(
        "--batched", action="store_true",
        help="run all episodes in parallel through the jitted BatchedEnv",
    )
    parser.add_argument(
        "--max-actions", type=int, default=2000,
        help="batched-eval action cap (truncated episodes are flagged)",
    )
    parser.add_argument(
        "--max-seconds", type=float, default=2700,
        help="batched-eval wall-clock cap (truncated episodes are flagged)",
    )
    parser.add_argument(
        "--fused", action="store_true",
        help="run all episodes through the fused substep-budget loop "
             "(fastest; same per-env trajectories)",
    )
    args = parser.parse_args()
    config_path = args.config_path or config_mod.select_run()
    if config_path is None:
        print("no run found")
        sys.exit(1)
    main(config_mod.load_config(config_path), args.num_episodes, args.batched,
         args.max_actions, args.max_seconds, args.fused)
