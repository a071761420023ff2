"""Fused substep-budget environment loop (the SURVEY §7 north-star design).

Instead of the lockstep ``env.step`` (which simulates until the SLOWEST env
in the batch finishes its action), every *round*:

1. selects up to ``service_capacity`` envs that need attention — either an
   action just finished (some robot idle -> finalize rewards/obs) or a fresh
   observation is waiting for an action,
2. gathers those envs into a compact sub-batch, runs the expensive
   step-boundary work (cube processing, wavefront distance images, the
   observation stack) only for them, gets actions (policy or random), injects
   them, scatters back,
3. advances ALL envs by exactly ``substeps_per_round`` simulation substeps
   (envs whose robots are idle / episodes done are frozen, which is exactly
   the reference's semantics of pausing simulation during action selection,
   envs.py:754-765).

Per-env trajectories match the sequential protocol — only the batching
geometry changes (tested: tests/test_fused_equivalence.py drives both paths
with the same keys and a deterministic observation-chaotic policy and
compares the per-env transition streams).  One stated divergence: the
mid-action map refresh runs on a global round cadence here vs. per-robot
substep counts in the reference (envs.py:1400-1402), which can shift WHAT a
robot saw mid-drive under partial observations; step-boundary observations
are refreshed identically in both paths.  Envs that are ready but beyond the
service capacity simply stay frozen one more round.
"""

import os
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import constants
from ..envs import env as env_core
from ..envs.types import CUBE_AVAILABLE, EnvParams, EnvState, IDLE
from ..ops import pallas_substep
from ..policies import action_space_size

N = constants.LOCAL_MAP_PIXEL_WIDTH


def _tree_where(mask, a, b):
    """Per-leaf select with a (M,) mask broadcast over trailing dims."""

    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


@struct.dataclass
class LoopState:
    env: EnvState                   # batched (B, ...)
    stored_obs: jnp.ndarray         # (B, N, N, C) bf16 — obs awaiting an action
    stored_robot: jnp.ndarray       # (B,) int32
    has_obs: jnp.ndarray            # (B,) bool
    pend_obs: jnp.ndarray           # (B, R, N, N, C) bf16
    pend_act: jnp.ndarray           # (B, R) int32
    pend_has: jnp.ndarray           # (B, R) bool
    key: jnp.ndarray
    round_idx: jnp.ndarray          # int32
    # Cross-round distance-field cache (env.make_percep_cache), or None when
    # disabled.  Mirrors the reference's rebuild-only-on-map-change GridGraph
    # (envs.py:2459) — see env.perception_pass_batched_cached.
    percep_cache: Any = None


class FusedLoop:
    """Builds the jitted round function; policy-driven or random-action."""

    def __init__(self, params: EnvParams, num_envs: int, num_channels: int,
                 substeps_per_round: int = 64, service_capacity: Optional[int] = None,
                 policy=None, use_pallas_substep: Optional[bool] = None,
                 use_percep_cache: Optional[bool] = None,
                 percep_cache_budget: Optional[int] = None):
        self.params = params
        self.num_envs = num_envs
        self.num_channels = num_channels
        self.substeps = substeps_per_round
        # Lane-major Pallas kernel for the substep loop (ops/pallas_substep):
        # auto on TPU when the team is supported and the batch tiles into
        # 128-lane blocks; the lax.scan path remains the fallback (and the
        # CPU-mesh test path).
        self._substep_block = min(pallas_substep._BLOCK_B, num_envs)
        if use_pallas_substep is None:
            env_ps = os.environ.get("SIM_TPU_PALLAS_SUBSTEP")
            if env_ps is not None:
                # global kill-switch/force: lets any driver (evaluate.py,
                # tools) rescue a run if Mosaic rejects the kernel on the
                # installed jaxlib without code edits.
                use_pallas_substep = bool(int(env_ps)) and pallas_substep.supports(
                    params
                ) and num_envs % self._substep_block == 0
            else:
                use_pallas_substep = (
                    jax.default_backend() == "tpu"
                    and pallas_substep.supports(params)
                    and num_envs % self._substep_block == 0
                )
        self.use_pallas_substep = use_pallas_substep
        # Expected fraction needing service per round ~ substeps / typical
        # action length (several hundred substeps); 2x slack.  Envs past the
        # capacity just wait a round.  Never exceed num_envs: the round body
        # sizes its sub-batch arrays (reset keys, scatter indices) by the
        # capacity, and idx=order[:capacity] silently clamps to num_envs.
        cap = service_capacity or max(
            8, min(num_envs, int(num_envs * substeps_per_round / 256))
        )
        self.capacity = min(num_envs, cap)
        # Distance-field caching across rounds (exact: rows re-swept whenever
        # their occupancy memory changed).  SIM_TPU_PERCEP_CACHE=0 disables.
        if use_percep_cache is None:
            env_pc = os.environ.get("SIM_TPU_PERCEP_CACHE")
            use_percep_cache = True if env_pc is None else bool(int(env_pc))
        self.use_percep_cache = use_percep_cache
        self.percep_cache_budget = percep_cache_budget or max(
            8, self.capacity // 2
        )
        self.policy = policy
        self._build()

    # ------------------------------------------------------------------
    def init(self, key) -> LoopState:
        b, r = self.num_envs, self.params.num_robots
        key, kr = jax.random.split(key)
        env, obs, robot, _ = self._reset_batch(jax.random.split(kr, b))
        return LoopState(
            env=env,
            stored_obs=obs.astype(jnp.bfloat16),
            stored_robot=robot,
            has_obs=jnp.ones(b, bool),
            pend_obs=jnp.zeros((b, r, N, N, self.num_channels), jnp.bfloat16),
            pend_act=jnp.zeros((b, r), jnp.int32),
            pend_has=jnp.zeros((b, r), bool),
            key=key,
            round_idx=jnp.int32(0),
            percep_cache=(
                env_core.make_percep_cache(self.params, b)
                if self.use_percep_cache else None
            ),
        )

    # ------------------------------------------------------------------
    def _build(self):
        params = self.params
        b, m, k_sub = self.num_envs, self.capacity, self.substeps
        r_n = params.num_robots
        groups_arr = jnp.asarray(params.robot_groups)
        spaces = jnp.asarray(
            [action_space_size(c) for c in params.num_output_channels], jnp.int32
        )
        policy = self.policy

        def reset_obs_one(key):
            s = env_core.reset(params, key)
            obs, robot, group = env_core.observe_standalone(params, s)
            return s, obs, robot, group

        # Chunked over envs: the MXU local-map crop materializes a
        # (chunk, 96*96, W*C) transient, so an unchunked vmap at B=1024+
        # would exceed HBM (24 GB at B=2048).  Reset is off the hot path;
        # 128-env chunks keep the transient under 1.5 GB.
        self._reset_batch = jax.jit(
            lambda keys: jax.lax.map(reset_obs_one, keys, batch_size=128)
        )

        # Same bound for the per-round observation stack when the service
        # capacity is large (bench/eval at B>=2048).
        obs_chunk = 256

        def observe_batch(states, perceps):
            f = lambda s, p: env_core.observe(params, s, p)
            if self.capacity > obs_chunk:
                return jax.lax.map(
                    lambda sp: f(*sp), (states, perceps), batch_size=obs_chunk
                )
            return jax.vmap(f)(states, perceps)

        def round_fn(ls: LoopState, variables, eps, use_gt_intention=False):
            env = ls.env
            key, k_reset, k_act = jax.random.split(ls.key, 3)

            any_idle = jnp.any(env.fsm == IDLE, axis=1)
            ready = any_idle | ls.has_obs
            order = jnp.argsort(~ready, stable=True)
            idx = order[:m]
            row_valid = ready[idx]
            safe_idx = jnp.where(row_valid, idx, b)

            sub = jax.tree.map(lambda x: x[idx], env)
            sub_obs = ls.stored_obs[idx].astype(jnp.float32)
            sub_robot = ls.stored_robot[idx]
            needs_fin = row_valid & ~ls.has_obs[idx]
            pend_obs = ls.pend_obs[idx]
            pend_act = ls.pend_act[idx]
            pend_has = ls.pend_has[idx]

            # ---- Finalize completed actions ----
            # step_end split in two halves around ONE flat batched perception
            # pass (the streaming Pallas wavefront kernel on TPU).
            fin_pre, ctx = jax.vmap(lambda s: env_core.step_end_pre(params, s))(sub)
            done = fin_pre.done & needs_fin
            # Fresh replacement envs, skipped entirely when nothing finished
            # (resets are rare; lax.cond keeps them off the steady-state path).
            fresh = jax.lax.cond(
                jnp.any(done),
                lambda: jax.vmap(lambda kk: env_core.reset(params, kk))(
                    jax.random.split(k_reset, m)
                ),
                lambda: fin_pre,
            )
            if self.use_percep_cache:
                cache_sub = jax.tree.map(lambda x: x[idx], ls.percep_cache)
                # step_end_pre fused a fresh observation into the awaiting
                # robots' occupancy: those rows' cached fields are stale.
                occ_changed = jnp.any(
                    fin_pre.occupancy != sub.occupancy, axis=(-2, -1)
                )  # (M, R)
                cache_sub["valid"] = cache_sub["valid"] & ~occ_changed
                percep, cache_sub = env_core.perception_pass_batched_cached(
                    params, fin_pre, cache_sub, self.percep_cache_budget
                )
                # Rows NOT being finalized revert to the pre-step_end_pre
                # occupancy below (`merged` takes `sub`), so cache rows
                # refreshed against the discarded update must not be trusted.
                cache_sub["valid"] = cache_sub["valid"] & ~(
                    occ_changed & ~needs_fin[:, None]
                )
            else:
                cache_sub = None
                percep = env_core.perception_pass_batched(params, fin_pre)
            fin = jax.vmap(
                lambda s, c, p: env_core.step_end_post(params, s, c, p)
            )(fin_pre, ctx, percep)
            obs_f, robot_f, _ = observe_batch(fin, percep)

            # Fresh-env perception + observation only when a reset happened
            # (off the steady-state path).
            def fresh_branch():
                fp = env_core.perception_pass_batched(params, fresh)
                fo, fr, _ = observe_batch(fresh, fp)
                return fp, fo, fr

            def zero_branch():
                shapes = jax.eval_shape(fresh_branch)
                return jax.tree.map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes
                )

            fresh_percep, fresh_obs, fresh_robot = jax.lax.cond(
                jnp.any(done), fresh_branch, zero_branch
            )

            merged = _tree_where(needs_fin, fin, sub)
            obs = jnp.where(needs_fin[:, None, None, None], obs_f, sub_obs)
            robot = jnp.where(needs_fin, robot_f, sub_robot)
            reward = fin.reward                    # (M, R)

            # ---- Transitions (TransitionTracker semantics) ----
            robot_onehot = jnp.arange(r_n)[None, :] == robot[:, None]
            arrived = robot_onehot & needs_fin[:, None] & ~done[:, None]
            complete = (arrived | done[:, None]) & pend_has & row_valid[:, None]
            trans = dict(
                state=pend_obs.astype(jnp.float32),
                action=pend_act,
                reward=reward,
                next_state=jnp.where(
                    arrived[:, :, None, None, None],
                    obs[:, None].astype(jnp.float32),
                    0.0,
                ),
                has_next=arrived,
                mask=complete,
                env=jnp.where(row_valid, idx, -1),  # source env per row
                # Per-row episode stats at the action boundary (pre-reset),
                # for the fused evaluation driver (evaluate.run_eval_fused):
                # fin marks rows whose action just completed; done marks rows
                # whose episode ended at this service.
                fin=needs_fin,
                done=done,
                sim_steps=fin.simulation_steps,
                cubes=jnp.sum(fin.cum_cubes, axis=1),
                cubes_by_robot=fin.cum_cubes,
                collisions=jnp.sum(fin.cum_robot_collisions, axis=1),
            )

            # Episode metrics from finished episodes.
            ep_cubes = jnp.where(done, jnp.sum(fin.cum_cubes, axis=1), 0)
            ep_steps = jnp.where(done, fin.steps, 0)
            n_done = jnp.sum(done.astype(jnp.int32))

            # ---- Auto-reset finished episodes ----
            merged = _tree_where(done, fresh, merged)
            percep = _tree_where(done, fresh_percep, percep)
            if self.use_percep_cache:
                # Seed cache rows for fresh envs from their reset perception.
                for k_c in ("cspaces", "snaps", "recep_imgs"):
                    if k_c in cache_sub:
                        cache_sub[k_c] = jnp.where(
                            done[:, None, None, None], fresh_percep[k_c],
                            cache_sub[k_c],
                        )
                cache_sub["valid"] = cache_sub["valid"] | done[:, None]
            obs = jnp.where(done[:, None, None, None], fresh_obs, obs)
            robot = jnp.where(done, fresh_robot, robot)
            group = groups_arr[robot]

            # ---- Actions ----
            if policy is None:
                acts = (
                    jax.random.uniform(k_act, (m,)) * spaces[group]
                ).astype(jnp.int32)
            else:
                acts, _ = policy.act(
                    variables, obs, group, eps, k_act,
                    use_predicted_intention=policy.use_predicted_intention
                    and not use_gt_intention,
                )

            actions_rb = jnp.full((m, r_n), -1, jnp.int32)
            actions_rb = actions_rb.at[jnp.arange(m), robot].set(
                jnp.where(row_valid, acts, -1)
            )

            # Decoded world end-effector targets (also powers the
            # click-quality metrics below).
            _, _, _, _, _, tee = jax.vmap(
                lambda s, a: env_core.compute_action_target(params, s, a)
            )(merged, actions_rb)

            # Target-seeded planning distance images for all served envs in
            # ONE batched (Pallas) sweep, then batched backtrace + MXU
            # string pulling — no per-env sweeps or LOS gathers inside the
            # vmapped inject.
            plan_dist = None
            plan_wps = None
            if params.use_shortest_path_movement:
                h_px, w_px = params.map_shape
                menv = jnp.arange(m)
                cs_act = percep["cspaces"][menv, robot]       # (M, H, W)
                snap_act = percep["snaps"][menv, robot]
                ti, tj = env_core.geometry.position_to_pixel(
                    tee[:, 0], tee[:, 1], h_px, w_px
                )
                flat = snap_act[menv, ti, tj]
                ti, tj = flat // w_px, flat % w_px
                free_b = cs_act.at[menv, ti, tj].set(True)
                dist0 = jnp.full((m, h_px, w_px), 1e9, jnp.float32)
                dist0 = dist0.at[menv, ti, tj].set(0.0)
                pay0 = jnp.zeros((m, h_px, w_px), jnp.int32)
                plan_dist, _ = env_core.wavefront.sweep_batched(
                    dist0, pay0, free_b, params.num_pass_pairs
                )
                # Source snap + greedy backtrace (per env), then one batched
                # MXU string-pull for all M paths (paths.simplify_path_batched).
                rpos = merged.robot_pos[menv, robot]          # (M, 2)
                si, sj = env_core.geometry.position_to_pixel(
                    rpos[:, 0], rpos[:, 1], h_px, w_px
                )
                sflat = snap_act[menv, si, sj]
                src = jnp.stack([sflat // w_px, sflat % w_px], axis=-1)
                path_b, plen_b = jax.vmap(env_core.paths.backtrace)(
                    plan_dist, src
                )
                plan_wps = env_core.paths.simplify_path_batched(
                    cs_act, path_b, plen_b
                )

            if plan_dist is None:
                injected = jax.vmap(
                    lambda s, a, p: env_core.inject_action(params, s, a, p)
                )(merged, actions_rb, percep)
            else:
                injected = jax.vmap(
                    lambda s, a, p, pd, w_, n_: env_core.inject_action(
                        params, s, a, p, pd, plan_waypoints=(w_, n_)
                    )
                )(merged, actions_rb, percep, plan_dist,
                  plan_wps[0], plan_wps[1])

            # ---- Pending-pair bookkeeping ----
            seed = (jnp.arange(r_n)[None, :] == robot[:, None]) & row_valid[:, None]
            pend_has = (pend_has & ~complete & ~done[:, None]) | seed
            pend_obs = jnp.where(
                seed[:, :, None, None, None],
                obs[:, None].astype(jnp.bfloat16),
                pend_obs,
            )
            pend_act = jnp.where(seed, acts[:, None], pend_act)

            # ---- Scatter sub-batch back ----
            env = jax.tree.map(
                lambda full, s: full.at[safe_idx].set(s, mode="drop"), env, injected
            )
            new_ls = ls.replace(
                env=env,
                has_obs=ls.has_obs.at[safe_idx].set(False, mode="drop"),
                pend_obs=ls.pend_obs.at[safe_idx].set(pend_obs, mode="drop"),
                pend_act=ls.pend_act.at[safe_idx].set(pend_act, mode="drop"),
                pend_has=ls.pend_has.at[safe_idx].set(pend_has, mode="drop"),
                key=key,
                percep_cache=(
                    jax.tree.map(
                        lambda full, s: full.at[safe_idx].set(s, mode="drop"),
                        ls.percep_cache, cache_sub,
                    )
                    if self.use_percep_cache else ls.percep_cache
                ),
            )

            # ---- Advance simulation ----
            if self.use_pallas_substep:
                env2 = pallas_substep.run_substeps_pallas(
                    params, new_ls.env, k_sub, block_b=self._substep_block
                )
            else:
                env2 = jax.vmap(
                    lambda s: env_core.run_substeps(params, s, k_sub, refresh=False)
                )(new_ls.env)
            # Mid-action map refresh on the reference's ~200-substep cadence
            # (envs.py:1400-1402), amortized over rounds.
            refresh_every = max(1, 200 // k_sub)

            def do_refresh(operand):
                e, cache = operand
                e2 = jax.vmap(
                    lambda s: env_core.mid_action_map_refresh(params, s)
                )(e)
                if self.use_percep_cache:
                    changed = jnp.any(
                        e2.occupancy != e.occupancy, axis=(-2, -1)
                    )  # (B, R)
                    cache = {**cache, "valid": cache["valid"] & ~changed}
                return e2, cache

            env2, cache_full = jax.lax.cond(
                ls.round_idx % refresh_every == refresh_every - 1,
                do_refresh,
                lambda operand: operand,
                (env2, new_ls.percep_cache),
            )
            new_ls = new_ls.replace(
                env=env2, round_idx=ls.round_idx + 1, percep_cache=cache_full
            )

            # Click-quality diagnostics: is the policy aiming the
            # end-effector channel at cubes (when free) and at the
            # receptacle (when carrying)?  Near-free learning-health signal.
            ch_sel = acts // (N * N)
            carry = merged.lifting[jnp.arange(m), robot]
            d_tc = jnp.linalg.norm(
                tee[:, None, :] - merged.cube_pos[:, :, :2], axis=-1
            )
            d_tc = jnp.where(merged.cube_status == CUBE_AVAILABLE, d_tc, jnp.inf)
            near_cube = jnp.min(d_tc, axis=1) < 0.07
            ee_clicks = row_valid & (ch_sel == 1) & ~carry
            carry_clicks = row_valid & carry
            in_recep = (
                env_core.dynamics.in_receptacle(params, tee)
                if params.has_receptacle
                else jnp.zeros(m, bool)
            )

            metrics = dict(
                served=jnp.sum(row_valid.astype(jnp.int32)),
                episodes=n_done,
                episode_cubes=jnp.sum(ep_cubes),
                episode_steps=jnp.sum(ep_steps),
                reward_sum=jnp.sum(jnp.where(complete, reward, 0.0)),
                ee_clicks=jnp.sum(ee_clicks.astype(jnp.int32)),
                ee_clicks_near_cube=jnp.sum((ee_clicks & near_cube).astype(jnp.int32)),
                carry_clicks=jnp.sum(carry_clicks.astype(jnp.int32)),
                carry_clicks_in_recep=jnp.sum(
                    (carry_clicks & (ch_sel == 1) & in_recep).astype(jnp.int32)
                ),
            )
            return new_ls, trans, metrics

        self._round = jax.jit(round_fn, static_argnames=("use_gt_intention",))

    # ------------------------------------------------------------------
    def round(self, ls: LoopState, variables=None, eps=0.0, use_gt_intention=False):
        return self._round(ls, variables, eps, use_gt_intention)


@struct.dataclass
class TrainCarry:
    """Device-resident training-loop state for the scanned segment driver.

    Everything the reference's host loop mutated per timestep
    (train.py:225-307) lives here as device arrays so whole *segments* of
    rounds run in one XLA dispatch: replay rings, per-group train states, the
    update-RNG stream, the global timestep, the fractional train_freq credit,
    the next target-sync threshold, and the per-group warm latch."""

    ls: Any                      # LoopState
    buffers: Any                 # tuple(G) of ReplayBuffer ((n_dev,...) sharded)
    train_states: Any            # tuple(G) of GroupTrainState
    key: jnp.ndarray             # update RNG: (2,) single-dev / (n_dev, 2) sharded
    timestep: jnp.ndarray        # int32 — global served actions
    train_credit: jnp.ndarray    # float32 — fractional updates owed
    next_sync: jnp.ndarray       # int32 — next target-network sync timestep
    warm: jnp.ndarray            # (G,) bool — per-group replay warm latch
    last_info: Any               # tuple(G) of {loss, td_error[, loss_intention]}


class FusedTrainer:
    """Full DQN training on the fused loop (replaces the lockstep Trainer for
    production runs): act -> step -> store -> learn with replay, per-group
    Double-DQN updates, epsilon schedule, target sync, and predicted-intention
    curriculum — all budget-compatible with the reference (timesteps are
    served robot actions)."""

    def __init__(self, cfg, env_params: EnvParams, num_envs=None, seed=0,
                 num_devices=None):
        from ..policies import DQNPolicy
        from ..replay import ReplayBuffer
        from . import dqn

        self.cfg = cfg
        self.params = env_params
        self.num_envs = num_envs or cfg.get("num_parallel_envs", 32)
        self.key = jax.random.PRNGKey(seed)
        self.dqn = dqn

        # Device mesh (data parallelism over the env batch, SURVEY §2.2):
        # envs + replay shard over `dp`; params replicate; gradients
        # pmean-reduce over ICI inside the sharded update.
        self.num_devices = int(num_devices or cfg.get("mesh_shape") or 1)
        if self.num_devices > 1:
            from ..parallel import mesh as mesh_utils_mod

            assert self.num_envs % self.num_devices == 0, (
                self.num_envs, self.num_devices
            )
            self.mesh = mesh_utils_mod.make_mesh(self.num_devices)
            self._dp = mesh_utils_mod.batch_spec(self.mesh)
            self._rep = mesh_utils_mod.replicated_spec(self.mesh)
        else:
            self.mesh = None

        self.policy = DQNPolicy(
            env_params,
            num_input_channels=cfg.num_input_channels,
            use_predicted_intention=cfg.get("use_predicted_intention", False),
            compute_dtype=jnp.bfloat16
            if cfg.get("compute_dtype", "bfloat16") == "bfloat16"
            else jnp.float32,
            layer_planes=cfg.get("fcn_layer_planes"),
            head_planes=cfg.get("fcn_head_planes"),
        )
        self.key, k = jax.random.split(self.key)
        variables = self.policy.init(k)
        self.optimizer = dqn.make_optimizer(
            cfg.learning_rate, cfg.weight_decay, cfg.get("grad_norm_clipping")
        )
        self.train_states = []
        for g in range(self.policy.num_groups):
            iv = variables["intention"][g] if self.policy.use_predicted_intention else None
            self.train_states.append(
                dqn.create_train_state(
                    self.policy.models[g], variables["policy"][g], self.optimizer,
                    intention_variables=iv,
                    intention_optimizer=self.optimizer if iv is not None else None,
                )
            )
        n_dev = self.num_devices
        buffer_cap = max(cfg.batch_size, cfg.replay_buffer_size // n_dev)
        self.loop = FusedLoop(
            env_params,
            num_envs=self.num_envs // n_dev,   # per-shard batch
            num_channels=cfg.num_input_channels,
            substeps_per_round=cfg.get("substeps_per_round", 64),
            policy=self.policy,
            use_pallas_substep=cfg.get("use_pallas_substep", None),
        )

        groups_arr = jnp.asarray(env_params.robot_groups)
        r_n = env_params.num_robots

        def push_group(buffer, trans, group_id):
            robot_groups = jnp.broadcast_to(
                groups_arr[None, :], trans["mask"].shape
            )
            mask = trans["mask"] & (robot_groups == group_id)
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            reward = jnp.broadcast_to(trans["reward"][:, None] if trans["reward"].ndim == 1
                                      else trans["reward"], trans["mask"].shape)
            return buffer.push(
                flat(trans["state"]), flat(trans["action"]),
                reward.reshape(-1), flat(trans["next_state"]),
                flat(trans["has_next"]), flat(mask),
            )

        def update_group(ts, buffer, key, discount, model_idx, batch_size,
                         axis_name=None):
            batch = buffer.sample(key, batch_size)
            ts, info = dqn.dqn_update(
                self.policy.models[model_idx], self.optimizer, ts, batch,
                discount, use_double_dqn=cfg.use_double_dqn, axis_name=axis_name,
            )
            if self.policy.use_predicted_intention:
                ts, info_i = dqn.intention_update(
                    self.policy.intention_models[model_idx], self.optimizer, ts,
                    batch, axis_name=axis_name,
                )
                info.update(info_i)
            return ts, info

        # Raw (unjitted) stage fns, reused by the scanned segment driver.
        self._push_group_fn = push_group
        self._update_group_fn = update_group
        self._segments = {}

        if self.mesh is None:
            self.buffers = [
                ReplayBuffer.create(buffer_cap, cfg.num_input_channels)
                for _ in range(self.policy.num_groups)
            ]
            self._push_group = jax.jit(push_group, static_argnames=("group_id",))
            self._update_group = jax.jit(
                partial(update_group, batch_size=cfg.batch_size),
                static_argnames=("model_idx",),
            )
        else:
            # Per-shard replay rings stacked on a sharded leading axis;
            # push/update run under shard_map (train_multiprocess.py:423-490's
            # learner/worker split collapsed onto the mesh).
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            mesh = self.mesh
            one = ReplayBuffer.create(buffer_cap, cfg.num_input_channels)
            stacked = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (n_dev,) + x.shape), one
            )
            self.buffers = [
                jax.device_put(stacked, self._dp)
                for _ in range(self.policy.num_groups)
            ]
            assert cfg.batch_size % n_dev == 0, (cfg.batch_size, n_dev)
            local_bs = cfg.batch_size // n_dev

            def make_sharded_push(group_id):
                def body(buf_n, trans):
                    buf = jax.tree.map(lambda x: x[0], buf_n)
                    new = push_group(buf, trans, group_id)
                    return jax.tree.map(lambda x: x[None], new)

                return jax.jit(shard_map(
                    body, mesh=mesh, in_specs=(P("dp"), P("dp")),
                    out_specs=P("dp"), check_vma=False,
                ))

            self._sharded_push = [
                make_sharded_push(g) for g in range(self.policy.num_groups)
            ]

            def make_sharded_update(model_idx, discount):
                def body(ts, buf_n, keys_n):
                    buf = jax.tree.map(lambda x: x[0], buf_n)
                    return update_group(
                        ts, buf, keys_n[0], discount, model_idx, local_bs,
                        axis_name="dp",
                    )

                return jax.jit(shard_map(
                    body, mesh=mesh, in_specs=(P(), P("dp"), P("dp")),
                    out_specs=(P(), P()), check_vma=False,
                ))

            self._sharded_update = [
                make_sharded_update(g, cfg.discount_factors[g])
                for g in range(self.policy.num_groups)
            ]
            self._sharded_round, self._global_init = make_sharded_round(
                self.loop, mesh
            )
            self.train_states = [
                jax.device_put(ts, self._rep) for ts in self.train_states
            ]

        self.timestep = 0
        self.episode = 0
        self._warm = [False] * self.policy.num_groups

    # ------------------------------------------------------------------
    def _push(self, g, trans):
        if self.mesh is None:
            self.buffers[g] = self._push_group(self.buffers[g], trans, g)
        else:
            self.buffers[g] = self._sharded_push[g](self.buffers[g], trans)

    def _update(self, g, key):
        if self.mesh is None:
            self.train_states[g], info = self._update_group(
                self.train_states[g], self.buffers[g], key,
                self.cfg.discount_factors[g], g,
            )
        else:
            keys = jax.random.split(key, self.num_devices)
            self.train_states[g], info = self._sharded_update[g](
                self.train_states[g], self.buffers[g], keys
            )
        return info

    @property
    def buffer_sizes(self):
        if self.mesh is None:
            return [int(b.size) for b in self.buffers]
        return [int(jnp.sum(b.size)) for b in self.buffers]

    @property
    def buffer_min_shard_sizes(self):
        """Smallest per-shard ring fill per group.  The warm gate must use
        this (not the summed fill): each shard samples its own ring, so an
        empty shard behind a full one would otherwise train on
        zero-initialized rows."""
        if self.mesh is None:
            return [int(b.size) for b in self.buffers]
        return [int(jnp.min(b.size)) for b in self.buffers]

    def _variables(self):
        v = {"policy": [ts.variables for ts in self.train_states]}
        if self.policy.use_predicted_intention:
            v["intention"] = [ts.intention_variables for ts in self.train_states]
        return v

    # ------------------------------------------------------------------
    # Scanned on-device training segments
    # ------------------------------------------------------------------
    def _info_nan(self):
        d = {"loss": jnp.float32(jnp.nan), "td_error": jnp.float32(jnp.nan)}
        if self.policy.use_predicted_intention:
            d["loss_intention"] = jnp.float32(jnp.nan)
        return tuple(dict(d) for _ in range(self.policy.num_groups))

    def _get_segment(self, use_gt: bool):
        """Jitted ``(carry, boundary) -> (carry, stacked_metrics)``: scans
        ``cfg.rounds_per_segment`` fused rounds with the WHOLE train.py
        scheduler (train.py:225-307) on device — replay pushes, the
        train_freq credit counter, the per-group warm gate, the epsilon
        schedule, Double-DQN (and intention) updates via a dynamic-trip-count
        while_loop, and target syncs.  Rounds whose start timestep is past
        ``boundary`` are no-ops (lax.cond), so ONE compile covers every
        segment of a run phase and budget overshoot stays below one round's
        service capacity — exactly the host loop's overshoot.  This removes
        the per-round host dispatch + blocking served-count sync the old
        loop paid (~50 ms RTT per ~100 ms round on remote-attached TPUs)."""
        cache_key = bool(use_gt)
        if cache_key in self._segments:
            return self._segments[cache_key]

        cfg = self.cfg
        G = self.policy.num_groups
        loop = self.loop
        push_group = self._push_group_fn
        update_group = self._update_group_fn
        sync_target = self.dqn.sync_target
        learning_starts = int(round(cfg.learning_starts_frac * cfg.total_timesteps))
        train_freq = float(cfg.train_freq)
        tgt_freq = int(cfg.target_update_freq)
        exp_denom = max(float(cfg.exploration_frac * cfg.total_timesteps), 1e-9)
        final_eps = float(cfg.final_exploration)
        discounts = [float(d) for d in cfg.discount_factors]
        n_rounds = int(cfg.get("rounds_per_segment", 16))
        sharded = self.mesh is not None
        local_bs = cfg.batch_size // self.num_devices
        axis = "dp" if sharded else None

        def active_round(carry):
            v = {"policy": [ts.variables for ts in carry.train_states]}
            if self.policy.use_predicted_intention:
                v["intention"] = [
                    ts.intention_variables for ts in carry.train_states
                ]
            # Linear epsilon schedule from the on-device timestep
            # (train.py:228 / loop.exploration_eps).
            frac = jnp.clip(
                (carry.timestep.astype(jnp.float32) - learning_starts)
                / exp_denom, 0.0, 1.0,
            )
            eps = 1.0 - (1.0 - final_eps) * frac
            if sharded:
                local = carry.ls.replace(
                    key=carry.ls.key[0], round_idx=carry.ls.round_idx[0]
                )
                new_ls, trans, m = loop._round(
                    local, v, eps, use_gt_intention=use_gt
                )
                served_min = jax.lax.pmin(m["served"], axis)
                m = {k2: jax.lax.psum(v2, axis) for k2, v2 in m.items()}
                m["served_shard_min"] = served_min
                new_ls = new_ls.replace(
                    key=new_ls.key[None], round_idx=new_ls.round_idx[None]
                )
            else:
                new_ls, trans, m = loop._round(
                    carry.ls, v, eps, use_gt_intention=use_gt
                )

            buffers = []
            fills = []
            for g in range(G):
                if sharded:
                    buf = jax.tree.map(lambda x: x[0], carry.buffers[g])
                    buf = push_group(buf, trans, g)
                    fills.append(jax.lax.pmin(buf.size, axis))
                    buffers.append(jax.tree.map(lambda x: x[None], buf))
                else:
                    buf = push_group(carry.buffers[g], trans, g)
                    fills.append(buf.size)
                    buffers.append(buf)
            buffers = tuple(buffers)

            served = m["served"]
            timestep = carry.timestep + served
            # Warm gate: min per-shard fill >= per-shard sample size
            # (train_multiprocess.py:365), latched like the host loop.
            warm = carry.warm | (jnp.stack(fills) >= local_bs)
            accrue = timestep >= learning_starts
            credit = carry.train_credit + jnp.where(
                accrue, served.astype(jnp.float32) / train_freq, 0.0
            )
            n_upd = jnp.floor(credit).astype(jnp.int32)
            credit = credit - n_upd.astype(jnp.float32)

            upd_key = carry.key[0] if sharded else carry.key

            def upd_cond(st):
                return st[0] < n_upd

            def upd_body(st):
                i, tss, k, infos = st
                k, ksub = jax.random.split(k)
                kg = jax.random.split(ksub, G)
                new_tss, new_infos = [], []
                for g in range(G):
                    def run_g(ts, kk, _prev, g=g):
                        if sharded:
                            buf = jax.tree.map(lambda x: x[0], buffers[g])
                        else:
                            buf = buffers[g]
                        return update_group(
                            ts, buf, kk, discounts[g], g, local_bs,
                            axis_name=axis,
                        )

                    def skip_g(ts, kk, prev):
                        return ts, prev

                    ts_g, info_g = jax.lax.cond(
                        warm[g], run_g, skip_g, tss[g], kg[g], infos[g]
                    )
                    new_tss.append(ts_g)
                    new_infos.append(info_g)
                return i + 1, tuple(new_tss), k, tuple(new_infos)

            _, tss, upd_key, last_info = jax.lax.while_loop(
                upd_cond, upd_body,
                (jnp.int32(0), tuple(carry.train_states), upd_key,
                 tuple(carry.last_info)),
            )

            # Target sync (train.py:266-269).  Sync is idempotent, so one
            # sync + a catch-up threshold bump covers any served jump.
            do_sync = accrue & (timestep >= carry.next_sync)
            tss = tuple(
                jax.lax.cond(do_sync, sync_target, lambda t: t, ts)
                for ts in tss
            )
            ticks = jnp.where(
                do_sync, (timestep - carry.next_sync) // tgt_freq + 1, 0
            )
            m["n_updates"] = n_upd
            new_carry = carry.replace(
                ls=new_ls, buffers=buffers, train_states=tss,
                key=upd_key[None] if sharded else upd_key,
                timestep=timestep, train_credit=credit,
                next_sync=carry.next_sync + ticks * tgt_freq,
                warm=warm, last_info=last_info,
            )
            return new_carry, m

        def round_body(carry, _, boundary):
            def idle(c):
                m_shapes = jax.eval_shape(lambda cc: active_round(cc)[1], c)
                return c, jax.tree.map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), m_shapes
                )

            return jax.lax.cond(
                carry.timestep < boundary, active_round, idle, carry
            )

        # The carry is split into a DONATED "hot" tuple (env LoopState +
        # replay rings + RNG key — the multi-GB part, never internally
        # aliased) and a non-donated "cold" tuple (train states + scalars):
        # GroupTrainState.target_variables aliases .variables at creation and
        # after every sync, and donating aliased buffers is a runtime error.
        def seg(hot, cold, boundary):
            ls, buffers, key = hot
            train_states, last_info, timestep, credit, next_sync, warm = cold
            carry0 = TrainCarry(
                ls=ls, buffers=buffers, train_states=train_states, key=key,
                timestep=timestep, train_credit=credit, next_sync=next_sync,
                warm=warm, last_info=last_info,
            )
            carry, ms = jax.lax.scan(
                partial(round_body, boundary=boundary), carry0, None,
                length=n_rounds,
            )
            hot_out = (carry.ls, carry.buffers, carry.key)
            cold_out = (
                carry.train_states, carry.last_info, carry.timestep,
                carry.train_credit, carry.next_sync, carry.warm,
            )
            return hot_out, cold_out, ms

        if sharded:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            spec = P("dp")
            ls_specs = LoopState(
                env=spec, stored_obs=spec, stored_robot=spec, has_obs=spec,
                pend_obs=spec, pend_act=spec, pend_has=spec,
                key=spec, round_idx=spec,
                percep_cache=spec if self.loop.use_percep_cache else None,
            )
            hot_specs = (ls_specs, tuple(spec for _ in range(G)), spec)
            cold_specs = (
                tuple(P() for _ in range(G)), tuple(P() for _ in range(G)),
                P(), P(), P(), P(),
            )
            seg = shard_map(
                seg, mesh=self.mesh, in_specs=(hot_specs, cold_specs, P()),
                out_specs=(hot_specs, cold_specs, P()), check_vma=False,
            )
        fn = jax.jit(seg, donate_argnums=0)
        self._segments[cache_key] = fn
        return fn

    def run(self, total_timesteps=None, log_fn=None):
        """Segment-scanned training driver: the whole act->store->learn
        scheduler runs on device; the host wakes once per
        ``cfg.rounds_per_segment`` (default 16) rounds to read metrics, log,
        and checkpoint.  Set ``cfg.host_scheduler_loop=True`` for the legacy
        per-round host loop."""
        if self.cfg.get("host_scheduler_loop", False):
            return self._run_host(total_timesteps, log_fn)

        import time as _time

        from .loop import exploration_eps, use_gt_intention

        cfg = self.cfg
        total = total_timesteps or cfg.total_timesteps
        learning_starts = int(round(cfg.learning_starts_frac * cfg.total_timesteps))
        total_with_warmup = total + learning_starts

        self.key, k, ku = jax.random.split(self.key, 3)
        if self.mesh is None:
            ls = self.loop.init(k)
            upd_key = ku
        else:
            ls = self._global_init(k)
            ls = jax.device_put(ls, jax.tree.map(lambda _: self._dp, ls))
            upd_key = jax.random.split(ku, self.num_devices)

        tgt = int(cfg.target_update_freq)
        hot = (ls, tuple(self.buffers), upd_key)
        cold = (
            tuple(self.train_states),
            self._info_nan(),
            jnp.int32(self.timestep),
            jnp.float32(0.0),
            jnp.int32((self.timestep // tgt + 1) * tgt),
            jnp.asarray(self._warm, bool),
        )

        switch_step = None
        if self.policy.use_predicted_intention:
            # First timestep at which train.py:230-232's gate goes False.
            switch_step = int(np.floor(
                learning_starts
                + float(cfg.use_predicted_intention_frac) * cfg.total_timesteps
            )) + 1

        t_start = _time.time()
        metrics = {}
        trace_dir = cfg.get("profile_trace_dir")
        seg_count = 0
        tracing = False
        while self.timestep < total_with_warmup:
            use_gt = use_gt_intention(cfg, self.timestep, learning_starts)
            boundary = total_with_warmup
            if switch_step is not None and use_gt:
                # Stop the segment at the curriculum switch so the static
                # use_gt flag flips exactly where the reference flips it.
                boundary = min(boundary, switch_step)
            seg_fn = self._get_segment(use_gt)
            if trace_dir and seg_count == 1 and not tracing:
                jax.profiler.start_trace(trace_dir)
                tracing = True
            hot, cold, ms = seg_fn(hot, cold, jnp.int32(boundary))
            train_states, last_info, t_dev, _, _, warm_dev = cold
            # Write back live references so log_fn (checkpointing, q-map
            # visualization) reads current device state.
            self.buffers = list(hot[1])
            self.train_states = list(train_states)
            ms_h, t_h, warm_h, info_h = jax.device_get(
                (ms, t_dev, warm_dev, last_info)
            )
            if tracing:
                jax.profiler.stop_trace()
                tracing = False
            self.timestep = int(t_h)
            self.episode += int(ms_h["episodes"].sum())
            self._warm = [bool(w) for w in warm_h]
            seg_count += 1

            if log_fn is not None:
                elapsed = _time.time() - t_start
                for g, info in enumerate(info_h):
                    if np.isfinite(info["loss"]):
                        metrics[f"loss/group_{g}"] = float(info["loss"])
                        metrics[f"td_error/group_{g}"] = float(info["td_error"])
                        if "loss_intention" in info:
                            metrics[f"loss_intention/group_{g}"] = float(
                                info["loss_intention"]
                            )
                metrics.update(
                    timestep=self.timestep,
                    episodes=self.episode,
                    epsilon=exploration_eps(cfg, self.timestep, learning_starts),
                    steps_per_sec=self.timestep / max(elapsed, 1e-9),
                    episode_cubes=float(ms_h["episode_cubes"].sum()),
                    episodes_this_round=int(ms_h["episodes"].sum()),
                    updates=int(ms_h["n_updates"].sum()),
                )
                if "served_shard_min" in ms_h:
                    act_rounds = ms_h["served"] > 0
                    if act_rounds.any():
                        metrics["served_shard_min"] = int(
                            ms_h["served_shard_min"][act_rounds].min()
                        )
                log_fn(self.timestep, metrics, ms_h, None)
        return metrics

    def _run_host(self, total_timesteps=None, log_fn=None):
        import time as _time

        from .loop import exploration_eps, use_gt_intention

        cfg = self.cfg
        total = total_timesteps or cfg.total_timesteps
        learning_starts = int(round(cfg.learning_starts_frac * cfg.total_timesteps))
        total_with_warmup = total + learning_starts

        self.key, k = jax.random.split(self.key)
        if self.mesh is None:
            ls = self.loop.init(k)
        else:
            ls = self._global_init(k)
            ls = jax.device_put(ls, jax.tree.map(lambda _: self._dp, ls))

        train_credit = 0.0
        next_target_sync = cfg.target_update_freq
        t_start = _time.time()
        metrics = {}
        last_tinfo = [None] * self.policy.num_groups
        log_every_rounds = 8
        round_count = 0
        # Optional jax.profiler capture: trace rounds [16, 24) after the
        # compile warm-up (cfg.profile_trace_dir; view with TensorBoard or
        # xprof).  Reference counterpart: wall-clock timing meters only
        # (train_multiprocess.py:244-246) — this exposes real device traces.
        trace_dir = cfg.get("profile_trace_dir")
        tracing = False

        while self.timestep < total_with_warmup:
            eps = exploration_eps(cfg, self.timestep, learning_starts)
            use_gt = use_gt_intention(cfg, self.timestep, learning_starts)
            if self.mesh is None:
                ls, trans, m = self.loop.round(ls, self._variables(), eps, use_gt)
            else:
                ls, trans, m = self._sharded_round(
                    ls, self._variables(), eps, use_gt
                )
            for g in range(self.policy.num_groups):
                self._push(g, trans)

            served = int(m["served"])
            self.timestep += served
            self.episode += int(m["episodes"])

            if self.timestep >= learning_starts:
                # The reference's replay-size precondition (buffer >= batch,
                # train_multiprocess.py:365).  Sharded runs gate on the
                # minimum per-shard fill vs the per-shard sample size: each
                # shard samples its own ring, so a lagging shard must not be
                # sampled while still empty.
                min_fill = cfg.batch_size // self.num_devices
                train_credit += served / cfg.train_freq
                while train_credit >= 1.0:
                    train_credit -= 1.0
                    # Buffer-fill check syncs device->host; latch once warm
                    # (50 ms RTT per sync on remote-attached TPUs).
                    if not all(self._warm):
                        sizes = self.buffer_min_shard_sizes
                        self._warm = [
                            w or sizes[g] >= min_fill
                            for g, w in enumerate(self._warm)
                        ]
                    for g in range(self.policy.num_groups):
                        if not self._warm[g]:
                            continue
                        self.key, ku = jax.random.split(self.key)
                        tinfo = self._update(g, ku)
                        # Keep device-side; converted only on log rounds (a
                        # float() here is a blocking tunnel round-trip per
                        # update on remote-attached TPUs).
                        last_tinfo[g] = tinfo
                if self.timestep >= next_target_sync:
                    for g in range(self.policy.num_groups):
                        self.train_states[g] = self.dqn.sync_target(self.train_states[g])
                    next_target_sync += cfg.target_update_freq

            round_count += 1
            if trace_dir and round_count == 16 and not tracing:
                jax.profiler.start_trace(trace_dir)
                tracing = True
            if tracing and round_count == 24:
                jax.block_until_ready(ls.env.robot_pos)
                jax.profiler.stop_trace()
                tracing = False
            if log_fn is not None and (
                round_count % log_every_rounds == 0
                or self.timestep >= total_with_warmup
            ):
                elapsed = _time.time() - t_start
                for g, tinfo in enumerate(last_tinfo):
                    if tinfo is not None:
                        metrics[f"loss/group_{g}"] = float(tinfo["loss"])
                        metrics[f"td_error/group_{g}"] = float(tinfo["td_error"])
                        if "loss_intention" in tinfo:
                            metrics[f"loss_intention/group_{g}"] = float(
                                tinfo["loss_intention"]
                            )
                        last_tinfo[g] = None
                metrics.update(
                    timestep=self.timestep,
                    episodes=self.episode,
                    epsilon=eps,
                    steps_per_sec=self.timestep / max(elapsed, 1e-9),
                    episode_cubes=float(m["episode_cubes"]),
                    episodes_this_round=int(m["episodes"]),
                )
                if "served_shard_min" in m:
                    metrics["served_shard_min"] = int(m["served_shard_min"])
                log_fn(self.timestep, metrics, m, None)
        return metrics


# ---------------------------------------------------------------------------
# Multi-chip fused round (env batch sharded over a device mesh)
# ---------------------------------------------------------------------------

def make_sharded_round(loop: FusedLoop, mesh, axis: str = "dp"):
    """shard_map the fused round over an env-sharded ``jax.sharding.Mesh``.

    The round is data-parallel per env except for service selection (the
    argsort that picks up to ``capacity`` envs needing an action); selection
    runs PER SHARD with the local capacity, which preserves semantics — envs
    past a shard's capacity simply wait a round, exactly as in the
    single-chip loop.  Episode metrics are ``psum``-reduced over the mesh so
    every shard returns the global sums; transitions come back sharded
    (leading dim ``n_shards * capacity``).

    ``loop`` must be built with PER-SHARD sizes (``num_envs`` = envs per
    device).  Returns ``(sharded_round, global_init)``:

    * ``global_init(key) -> LoopState`` — a LoopState over all
      ``n * num_envs`` envs with per-shard RNG keys (``key`` leaf shaped
      (n, 2), ``round_idx`` shaped (n,)), laid out for ``P(axis)`` sharding.
    * ``sharded_round(ls, variables, eps) -> (ls, trans, metrics)`` — jitted.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    spec = P(axis)
    # Pytree-prefix specs: the single P for ``env`` broadcasts over the whole
    # EnvState subtree (every env leaf is batched on its leading dim).
    ls_specs = LoopState(
        env=spec,
        stored_obs=spec, stored_robot=spec, has_obs=spec,
        pend_obs=spec, pend_act=spec, pend_has=spec,
        key=spec, round_idx=spec,
        percep_cache=spec if loop.use_percep_cache else None,
    )

    def make_body(use_gt):
        def body(ls, variables, eps):
            local = ls.replace(key=ls.key[0], round_idx=ls.round_idx[0])
            new_ls, trans, metrics = loop._round(local, variables, eps, use_gt)
            # Per-shard service floor: selection runs per shard, so a shard
            # whose envs all finish simultaneously can starve at small
            # per-shard batches — surface it instead of assuming it away.
            served_min = jax.lax.pmin(metrics["served"], axis)
            metrics = {k: jax.lax.psum(v, axis) for k, v in metrics.items()}
            metrics["served_shard_min"] = served_min
            new_ls = new_ls.replace(
                key=new_ls.key[None], round_idx=new_ls.round_idx[None]
            )
            return new_ls, trans, metrics

        return jax.jit(shard_map(
            body,
            mesh=mesh,
            in_specs=(ls_specs, P(), P()),
            out_specs=(ls_specs, spec, P()),
            check_vma=False,
        ))

    _cache = {}

    def sharded(ls, variables, eps, use_gt_intention=False):
        use_gt = bool(use_gt_intention)
        if use_gt not in _cache:
            _cache[use_gt] = make_body(use_gt)
        return _cache[use_gt](ls, variables, eps)

    def global_init(key):
        keys = jax.random.split(key, n)
        ls_n = jax.vmap(loop.init)(keys)  # env leaves (n, B_local, ...)

        def merge(x):
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        return LoopState(
            env=jax.tree.map(merge, ls_n.env),
            stored_obs=merge(ls_n.stored_obs),
            stored_robot=merge(ls_n.stored_robot),
            has_obs=merge(ls_n.has_obs),
            pend_obs=merge(ls_n.pend_obs),
            pend_act=merge(ls_n.pend_act),
            pend_has=merge(ls_n.pend_has),
            key=ls_n.key,            # (n, 2): per-shard RNG streams
            round_idx=ls_n.round_idx,  # (n,)
            percep_cache=jax.tree.map(merge, ls_n.percep_cache),
        )

    return sharded, global_init
