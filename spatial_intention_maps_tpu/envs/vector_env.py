"""Batched environment front-ends.

``BatchedEnv`` — jitted, vmapped reset/step over a leading env axis with
auto-reset, the TPU-native replacement for the 8-process CollectWorker pool
(train_multiprocess.py:147-276): the worker pool collapses into a batch
dimension (SURVEY §2.2).

``SimEnv`` — a single-env convenience wrapper with a reference-shaped API
(reset() -> obs; step(action) -> (obs, reward, done, info)) used by the
evaluation / interactive tools.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from . import env as env_core
from .types import EnvParams, EnvState


class BatchedEnv:
    """vmapped reset/step with auto-reset on episode end."""

    def __init__(self, params: EnvParams, num_envs: int):
        self.params = params
        self.num_envs = num_envs

        p = params

        def _reset(key):
            state = env_core.reset(p, key)
            obs, r, g = env_core.observe_standalone(p, state)
            return state, obs, r, g

        def _step(state, actions):
            new_state, obs, obs_robot, obs_group, reward, done, info = env_core.step(
                p, state, actions
            )
            # Auto-reset: fresh episode state, observation from the fresh
            # state; reward/done/info refer to the finished step.
            key_next, key_reset = jax.random.split(new_state.key)
            new_state = new_state.replace(key=key_next)
            fresh = env_core.reset(p, key_reset)
            fresh_obs, fresh_r, fresh_g = env_core.observe_standalone(p, fresh)
            # done is a scalar here (this function is per-env, vmapped below).
            merged_state = jax.tree.map(
                lambda a, b: jnp.where(done, a, b), fresh, new_state
            )
            obs = jnp.where(done, fresh_obs, obs)
            obs_robot = jnp.where(done, fresh_r, obs_robot)
            obs_group = jnp.where(done, fresh_g, obs_group)
            return merged_state, obs, obs_robot, obs_group, reward, done, info

        self._reset = jax.jit(jax.vmap(_reset))
        self._step = jax.jit(jax.vmap(_step))

    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        return self._reset(keys)

    def step(self, state, actions):
        """actions: (B, R) int32, -1 for robots not acting."""
        return self._step(state, actions)


class SimEnv:
    """Single-environment, host-friendly wrapper mirroring VectorEnv's
    sequential protocol (envs.py:187-320) for tools and evaluation."""

    def __init__(self, params: EnvParams, seed=None):
        self.params = params
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        p = params

        @jax.jit
        def _reset(key):
            state = env_core.reset(p, key)
            obs, r, g = env_core.observe_standalone(p, state)
            return state, obs, r, g

        @jax.jit
        def _step(state, actions):
            return env_core.step(p, state, actions)

        self._reset_fn = _reset
        self._step_fn = _step
        self.state = None
        self._obs = None
        self._obs_robot = None
        self._obs_group = None

    # -- reference-shaped API -------------------------------------------------
    def reset(self):
        self._key, sub = jax.random.split(self._key)
        self.state, self._obs, self._obs_robot, self._obs_group = self._reset_fn(sub)
        return self.get_state()

    def get_state(self):
        """Nested [group][robot] list with the awaiting robot's obs, rest
        None (envs.py:322-323)."""
        out = [
            [None] * sum(1 for g in self.params.robot_groups if g == gi)
            for gi in range(self.params.num_groups)
        ]
        r = int(self._obs_robot)
        gi = self.params.robot_groups[r]
        # index within group
        j = sum(1 for rr in range(r) if self.params.robot_groups[rr] == gi)
        if not bool(self.state.done):
            out[gi][j] = np.asarray(self._obs)
        return out

    def step(self, action):
        """action: nested [group][robot] flat indices (or None), like the
        reference's policy output."""
        r_actions = np.full((self.params.num_robots,), -1, np.int32)
        flat_idx = 0
        for gi, group in enumerate(action):
            for j, a in enumerate(group):
                if a is not None:
                    # map (group, in-group index) -> flat robot index
                    count = -1
                    for rr in range(self.params.num_robots):
                        if self.params.robot_groups[rr] == gi:
                            count += 1
                            if count == j:
                                r_actions[rr] = int(a)
        (
            self.state, self._obs, self._obs_robot, self._obs_group,
            reward, done, info,
        ) = self._step_fn(self.state, jnp.asarray(r_actions))

        mask = np.asarray(info["reward_mask"])
        rew = np.asarray(reward)
        reward_nested = []
        for gi in range(self.params.num_groups):
            row = []
            for rr in range(self.params.num_robots):
                if self.params.robot_groups[rr] == gi:
                    row.append(float(rew[rr]) if mask[rr] else None)
            reward_nested.append(row)

        info_py = {k: np.asarray(v) for k, v in info.items()}
        state = self.get_state() if not bool(done) else [
            [None] * len(g) for g in reward_nested
        ]
        return state, reward_nested, bool(done), info_py

    def set_poses(self, robot_pos=None, robot_heading=None, cube_pos=None):
        """Pose-editor hook (the reference GUI's drag/rotate of PyBullet
        bodies, tools_interactive_gui.py).  Teleports robots (body + servo
        target, so the controller doesn't drag them back) and/or cubes, then
        re-observes so the awaiting robot's state reflects the edit.

        robot_pos: (R, 2) | None; robot_heading: (R,) | None;
        cube_pos: (C, 2 or 3) | None.  Returns the nested state list.
        """
        import jax.numpy as jnp

        st = self.state
        if robot_pos is not None:
            rp = jnp.asarray(robot_pos, jnp.float32)
            st = st.replace(robot_pos=rp, target_pos=rp)
        if robot_heading is not None:
            rh = jnp.asarray(robot_heading, jnp.float32)
            st = st.replace(robot_heading=rh, target_heading=rh)
        if cube_pos is not None:
            cp = jnp.asarray(cube_pos, jnp.float32)
            if cp.shape[-1] == 2:
                cp = jnp.concatenate(
                    [cp, self.state.cube_pos[:, 2:]], axis=-1
                )
            st = st.replace(cube_pos=cp)
        self.state = st
        obs, r, g = env_core.observe_standalone(self.params, st)
        self._obs, self._obs_robot, self._obs_group = obs, r, g
        return self.get_state()

    def close(self):
        pass
