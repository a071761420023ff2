"""Fused-loop equivalence to the sequential protocol (VERDICT r1 #6).

``train/fused.py`` claims per-env trajectories match the lockstep
``env.step`` protocol — only the batching geometry changes.  This test
drives BOTH paths with the same initial reset keys and a deterministic,
observation-chaotic scripted policy (any observation divergence flips the
action and the trajectories explode apart), then compares each env's ordered
transition stream (action, reward, obs checksum) through its first episode.

Full observations are used so the mid-action map-refresh cadence (which the
fused loop amortizes over rounds rather than per-env substep counts) cannot
leak into observations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu import constants
from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.envs.vector_env import BatchedEnv
from spatial_intention_maps_tpu.policies import action_space_size
from spatial_intention_maps_tpu.train.fused import FusedLoop

pytestmark = pytest.mark.slow  # end-to-end loop: minutes on the CPU mesh

B = 2
SPACE = action_space_size(2)
_W = None


def _weights(shape):
    global _W
    if _W is None or _W.shape != shape:
        i, j, c = np.meshgrid(
            np.arange(shape[0]), np.arange(shape[1]), np.arange(shape[2]),
            indexing="ij",
        )
        _W = ((i * 7 + j * 13 + c * 29) % 97).astype(np.int32)
    return _W


def scripted_actions(obs):
    """Deterministic chaotic function of the (quantized) observation.

    Quantizes through bfloat16 first (the fused loop stores pending
    observations in bf16, so both paths see identical bits), then hashes in
    EXACT integer arithmetic — a float32 sum over 36k terms is
    reduction-order dependent across differently-fused jit graphs.
    """
    obs = jnp.asarray(obs).astype(jnp.bfloat16).astype(jnp.float32)
    q = jnp.round(obs * 64.0).astype(jnp.int32)
    w = jnp.asarray(_weights(obs.shape[1:]))
    s = jnp.sum(q * w, axis=(1, 2, 3)).astype(jnp.uint32)
    h = s * jnp.uint32(2654435761)  # Knuth multiplicative hash, wraps mod 2^32
    return (h % jnp.uint32(SPACE)).astype(jnp.int32)


def checksum(obs):
    """Deterministic integer fingerprint of a (96, 96, C) observation."""
    import ml_dtypes

    obs = np.asarray(obs, np.float32).astype(ml_dtypes.bfloat16).astype(np.float32)
    q = np.round(obs * 64.0).astype(np.int64)
    return int(np.sum(q * _weights(obs.shape).astype(np.int64)))


class ScriptedPolicy:
    """FusedLoop-compatible wrapper around scripted_actions."""

    use_predicted_intention = False

    def act(self, variables, obs, group_ids, eps, key, use_predicted_intention=False):
        return scripted_actions(obs), None


@pytest.fixture(scope="module")
def params():
    return EnvParams.from_robot_config(
        [{"lifting_robot": 1}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=2,
        use_partial_observations=False,
        inactivity_cutoff_per_robot=20,
        num_pass_pairs=2,
    )


def _reset_keys(seed):
    # Mirror FusedLoop.init's internal key split so both paths start from
    # bit-identical episodes.
    key = jax.random.PRNGKey(seed)
    key, kr = jax.random.split(key)
    return jax.random.split(kr, B)


def collect_lockstep(params, seed, max_steps=40):
    env = BatchedEnv(params, B)
    state, obs, robot, group = env._reset(_reset_keys(seed))
    streams = [[] for _ in range(B)]
    finished = [False] * B
    for _ in range(max_steps):
        acts = scripted_actions(obs)
        actions_br = jnp.full((B, params.num_robots), -1, jnp.int32)
        actions_br = actions_br.at[jnp.arange(B), robot].set(acts)
        obs_prev = np.asarray(obs)
        state, obs, robot, group, reward, done, info = env.step(state, actions_br)
        for e in range(B):
            if finished[e]:
                continue
            streams[e].append(
                (int(acts[e]), round(float(reward[e, 0]), 4), checksum(obs_prev[e]))
            )
            if bool(done[e]):
                finished[e] = True
        if all(finished):
            break
    return streams, finished


def collect_fused(params, seed, max_rounds=400):
    loop = FusedLoop(
        params, num_envs=B, num_channels=params.num_state_channels,
        substeps_per_round=64, policy=ScriptedPolicy(),
    )
    ls = loop.init(jax.random.PRNGKey(seed))
    streams = [[] for _ in range(B)]
    finished = [False] * B
    for _ in range(max_rounds):
        ls, trans, m = loop.round(ls, None, 0.0)
        mask = np.asarray(trans["mask"])
        env_idx = np.asarray(trans["env"])
        acts = np.asarray(trans["action"])
        rew = np.asarray(trans["reward"])
        has_next = np.asarray(trans["has_next"])
        states = np.asarray(trans["state"])
        for row in range(mask.shape[0]):
            e = int(env_idx[row])
            if e < 0 or finished[e]:
                continue
            for r in range(mask.shape[1]):
                if not mask[row, r]:
                    continue
                streams[e].append(
                    (int(acts[row, r]), round(float(rew[row, r]), 4),
                     checksum(states[row, r]))
                )
                if not has_next[row, r]:
                    finished[e] = True
        if all(finished):
            break
    return streams, finished


def test_fused_round_equals_lockstep_trajectories(params):
    lock, lock_done = collect_lockstep(params, seed=7)
    fuse, fuse_done = collect_fused(params, seed=7)
    for e in range(B):
        assert lock_done[e] and fuse_done[e], (
            e, len(lock[e]), len(fuse[e]), lock_done, fuse_done
        )
        assert len(lock[e]) >= 3
        assert len(lock[e]) == len(fuse[e]), (e, len(lock[e]), len(fuse[e]))
        for t, (a, b) in enumerate(zip(lock[e], fuse[e])):
            # Same action, same reward, same observation fingerprint.
            assert a[0] == b[0], (e, t, a, b)
            assert a[1] == pytest.approx(b[1], abs=2e-3), (e, t, a, b)
            assert a[2] == b[2], (e, t, a, b)

    # Aggregate agreement: reward sums and episode lengths.
    for e in range(B):
        assert sum(x[1] for x in lock[e]) == pytest.approx(
            sum(x[1] for x in fuse[e]), abs=5e-3
        )
