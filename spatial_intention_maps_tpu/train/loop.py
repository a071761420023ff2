"""Training loop: batched act -> step -> store -> learn.

The reference's single-GPU loop with 8 env worker processes
(train.py:160-348, train_multiprocess.py) becomes a host-side loop over
jitted batched stages: policy inference on the whole env batch, vmapped env
step, masked transition tracking (TransitionTracker, train.py:47-68), HBM
replay, and per-group Double-DQN updates.  Timesteps are counted per robot
action (one per env per batched step), so reference budgets / schedules
(epsilon, train_freq, target_update_freq) carry over unchanged.
"""

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import constants
from ..envs.types import EnvParams
from ..envs.vector_env import BatchedEnv
from ..policies import DQNPolicy
from ..replay import ReplayBuffer
from . import dqn

N = constants.LOCAL_MAP_PIXEL_WIDTH


@struct.dataclass
class TrackerState:
    """Per-(env, robot) pending (state, action) pairs (TransitionTracker)."""

    prev_obs: jnp.ndarray   # (B, R, N, N, C) bf16
    prev_act: jnp.ndarray   # (B, R) int32
    prev_has: jnp.ndarray   # (B, R) bool

    @classmethod
    def create(cls, num_envs, num_robots, num_channels):
        return cls(
            prev_obs=jnp.zeros((num_envs, num_robots, N, N, num_channels), jnp.bfloat16),
            prev_act=jnp.zeros((num_envs, num_robots), jnp.int32),
            prev_has=jnp.zeros((num_envs, num_robots), bool),
        )


def use_gt_intention(cfg, timestep, learning_starts):
    """Predicted-intention curriculum gate (reference train.py:230-232):
    train on the ground-truth intention channel while the fraction of the
    post-warm-up budget consumed is <= use_predicted_intention_frac, then
    switch to the intention net's own predictions for the remainder."""
    if not cfg.get("use_predicted_intention", False):
        return False
    frac = max(0, timestep - learning_starts) / cfg.total_timesteps
    return frac <= cfg.use_predicted_intention_frac


def exploration_eps(cfg, timestep, learning_starts):
    """Linear 1 -> final_exploration over exploration_frac of the budget
    after warm-up (train.py:228)."""
    frac = min(
        1.0,
        max(0.0, timestep - learning_starts) / (cfg.exploration_frac * cfg.total_timesteps),
    )
    return 1.0 - (1.0 - cfg.final_exploration) * frac


class Trainer:
    """Owns env batch, policy, buffers, and optimizer states."""

    def __init__(self, cfg, env_params: EnvParams, num_envs=None, seed=0):
        self.cfg = cfg
        self.params = env_params
        self.num_envs = num_envs or cfg.get("num_parallel_envs", 32)
        self.key = jax.random.PRNGKey(seed)

        self.env = BatchedEnv(env_params, self.num_envs)
        self.policy = DQNPolicy(
            env_params,
            num_input_channels=cfg.num_input_channels,
            use_predicted_intention=cfg.get("use_predicted_intention", False),
            compute_dtype=jnp.bfloat16
            if cfg.get("compute_dtype", "bfloat16") == "bfloat16"
            else jnp.float32,
        )
        self.key, k = jax.random.split(self.key)
        variables = self.policy.init(k)

        self.optimizer = dqn.make_optimizer(
            cfg.learning_rate, cfg.weight_decay, cfg.get("grad_norm_clipping")
        )
        self.train_states = []
        for g in range(self.policy.num_groups):
            iv = variables["intention"][g] if self.policy.use_predicted_intention else None
            ts = dqn.create_train_state(
                self.policy.models[g],
                variables["policy"][g],
                self.optimizer,
                intention_variables=iv,
                intention_optimizer=self.optimizer if iv is not None else None,
            )
            self.train_states.append(ts)

        self.buffers = [
            ReplayBuffer.create(cfg.replay_buffer_size, cfg.num_input_channels)
            for _ in range(self.policy.num_groups)
        ]
        self.tracker = TrackerState.create(
            self.num_envs, env_params.num_robots, cfg.num_input_channels
        )

        self.timestep = 0
        self.episode = 0
        self._build_jitted()

    # ------------------------------------------------------------------
    def _build_jitted(self):
        policy = self.policy
        params = self.params
        groups = jnp.asarray(params.robot_groups)

        def act(variables, obs, obs_group, eps, key, use_gt_intention):
            return policy.act(
                variables, obs, obs_group, eps, key,
                use_predicted_intention=policy.use_predicted_intention
                and not use_gt_intention,
            )[0]

        self._act = jax.jit(act, static_argnames=("use_gt_intention",))

        def track(tracker, obs_prev, robot_prev, actions_flat, reward, done,
                  obs_new, robot_new):
            """Update pending pairs after an env step; emit transitions.

            obs_prev/robot_prev: the obs batch the policy just acted on.
            Returns (tracker, transitions) where transitions cover (B, R)
            slots with validity masks.
            """
            b = reward.shape[0]
            benv = jnp.arange(b)
            # Record the action for the robot that acted (update_action).
            tracker = tracker.replace(
                prev_obs=tracker.prev_obs.at[benv, robot_prev].set(
                    obs_prev.astype(jnp.bfloat16)
                ),
                prev_act=tracker.prev_act.at[benv, robot_prev].set(actions_flat),
                prev_has=tracker.prev_has.at[benv, robot_prev].set(True),
            )
            # Completion slots: the robot whose obs just arrived, or all
            # robots when done (update_step_completed).
            arrived = (
                jax.nn.one_hot(robot_new, params.num_robots, dtype=jnp.bool_)
                & ~done[:, None]
            )
            complete = (arrived | done[:, None]) & tracker.prev_has
            trans = dict(
                state=tracker.prev_obs.astype(jnp.float32),
                action=tracker.prev_act,
                reward=reward,
                next_state=jnp.where(
                    arrived[..., None, None, None], obs_new[:, None], 0.0
                ),
                has_next=arrived,
                mask=complete,
            )
            # Reset pendings: completed slots clear; the arrived robot's slot
            # re-seeds with its new obs (prev_state[i][j] = s).
            new_has = (tracker.prev_has & ~complete) | arrived
            tracker = tracker.replace(
                prev_obs=jnp.where(
                    arrived[..., None, None, None],
                    obs_new[:, None].astype(jnp.bfloat16),
                    tracker.prev_obs,
                ),
                prev_has=new_has,
            )
            return tracker, trans

        self._track = jax.jit(track)

        def push_group(buffer, trans, group_id):
            mask = trans["mask"] & (groups[None, :] == group_id)
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            # reward from env.step is already per-(env, robot): (B, R).
            reward = jnp.broadcast_to(trans["reward"], trans["mask"].shape)
            return buffer.push(
                flat(trans["state"]),
                flat(trans["action"]),
                reward.reshape(-1),
                flat(trans["next_state"]),
                flat(trans["has_next"]),
                flat(mask),
            )

        self._push_group = jax.jit(push_group, static_argnames=("group_id",))

        def update_group(ts, buffer, key, discount, model_idx):
            batch = buffer.sample(key, self.cfg.batch_size)
            ts, info = dqn.dqn_update(
                policy.models[model_idx], self.optimizer, ts, batch, discount,
                use_double_dqn=self.cfg.use_double_dqn,
            )
            if policy.use_predicted_intention:
                ts, info_i = dqn.intention_update(
                    policy.intention_models[model_idx], self.optimizer, ts, batch
                )
                info.update(info_i)
            return ts, info

        self._update_group = jax.jit(update_group, static_argnames=("model_idx",))

    def _variables(self):
        v = {"policy": [ts.variables for ts in self.train_states]}
        if self.policy.use_predicted_intention:
            v["intention"] = [ts.intention_variables for ts in self.train_states]
        return v

    # ------------------------------------------------------------------
    def run(self, total_timesteps=None, log_fn=None):
        cfg = self.cfg
        total = total_timesteps or cfg.total_timesteps
        learning_starts = int(round(cfg.learning_starts_frac * cfg.total_timesteps))
        total_with_warmup = total + learning_starts

        self.key, k = jax.random.split(self.key)
        state, obs, obs_robot, obs_group = self.env.reset(k)

        # Seed trackers with the initial awaiting robots' observations.
        benv = jnp.arange(self.num_envs)
        self.tracker = self.tracker.replace(
            prev_obs=self.tracker.prev_obs.at[benv, obs_robot].set(
                obs.astype(jnp.bfloat16)
            ),
            prev_has=self.tracker.prev_has.at[benv, obs_robot].set(True),
        )

        reward_since = np.zeros(self.num_envs)
        metrics = {}
        t_start = time.time()
        next_target_sync = cfg.target_update_freq
        updates_per_step = max(1, round(self.num_envs / cfg.train_freq))

        while self.timestep < total_with_warmup:
            eps = exploration_eps(cfg, self.timestep, learning_starts)
            use_gt = False
            if self.policy.use_predicted_intention:
                use_gt = (
                    max(0, self.timestep - learning_starts) / cfg.total_timesteps
                    <= cfg.use_predicted_intention_frac
                )
            self.key, k1, k2 = jax.random.split(self.key, 3)
            actions_flat = self._act(
                self._variables(), obs, obs_group, eps, k1, use_gt
            )
            # Scatter to (B, R): only the awaiting robot acts.
            actions_br = jnp.full((self.num_envs, self.params.num_robots), -1, jnp.int32)
            actions_br = actions_br.at[benv, obs_robot].set(actions_flat)

            prev_obs, prev_robot = obs, obs_robot
            state, obs, obs_robot, obs_group, reward, done, info = self.env.step(
                state, actions_br
            )
            self.tracker, trans = self._track(
                self.tracker, prev_obs, prev_robot, actions_flat, reward, done,
                obs, obs_robot,
            )
            for g in range(self.policy.num_groups):
                self.buffers[g] = self._push_group(self.buffers[g], trans, g)

            self.timestep += self.num_envs
            self.episode += int(np.sum(np.asarray(done)))

            # Train
            if self.timestep >= learning_starts:
                for _ in range(updates_per_step):
                    for g in range(self.policy.num_groups):
                        if int(self.buffers[g].size) < cfg.batch_size:
                            continue
                        self.key, ku = jax.random.split(self.key)
                        self.train_states[g], tinfo = self._update_group(
                            self.train_states[g], self.buffers[g], ku,
                            cfg.discount_factors[g], g,
                        )
                        metrics[f"loss/group_{g}"] = float(tinfo["loss"])
                        metrics[f"td_error/group_{g}"] = float(tinfo["td_error"])

                if self.timestep >= next_target_sync:
                    for g in range(self.policy.num_groups):
                        self.train_states[g] = dqn.sync_target(self.train_states[g])
                    next_target_sync += cfg.target_update_freq

            if log_fn is not None:
                elapsed = time.time() - t_start
                metrics["steps_per_sec"] = self.timestep / max(elapsed, 1e-9)
                metrics["timestep"] = self.timestep
                metrics["episodes"] = self.episode
                metrics["epsilon"] = eps
                log_fn(self.timestep, metrics, info, done)
        return metrics
