"""Multi-device tests for the sharded fused round (VERDICT r1 next-step #3).

Run on the 8-virtual-device CPU mesh the conftest forces.  These tests fail
if the shard_map specs in ``make_sharded_round`` break:

* per-shard semantics: every shard's slice of the sharded round equals an
  independent single-device ``FusedLoop._round`` on that shard's LoopState,
* metrics are psum-reduced to GLOBAL sums,
* transitions come back shard-concatenated with per-shard local env indices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.train import fused as fused_mod

pytestmark = pytest.mark.slow  # end-to-end loop: minutes on the CPU mesh

N_DEV = 8
B_LOCAL = 2


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices, have {jax.device_count()}")
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    return Mesh(mesh_utils.create_device_mesh((N_DEV,)), ("dp",))


@pytest.fixture(scope="module")
def loop():
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 1}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=2,
        num_pass_pairs=1,
        substep_chunk=8,
        max_substeps=16,
    )
    return fused_mod.FusedLoop(
        params, num_envs=B_LOCAL, num_channels=params.num_state_channels,
        substeps_per_round=8, service_capacity=B_LOCAL,
    )


def _shard_slice(gls, s):
    """Shard s's local LoopState out of a global_init LoopState."""
    sl = lambda x: x[s * B_LOCAL:(s + 1) * B_LOCAL]
    return fused_mod.LoopState(
        env=jax.tree.map(sl, gls.env),
        stored_obs=sl(gls.stored_obs),
        stored_robot=sl(gls.stored_robot),
        has_obs=sl(gls.has_obs),
        pend_obs=sl(gls.pend_obs),
        pend_act=sl(gls.pend_act),
        pend_has=sl(gls.pend_has),
        key=gls.key[s],
        round_idx=gls.round_idx[s],
        percep_cache=jax.tree.map(sl, gls.percep_cache),
    )


def test_sharded_round_matches_per_shard_single_device(mesh, loop):
    sharded_round, global_init = fused_mod.make_sharded_round(loop, mesh)
    gls = global_init(jax.random.PRNGKey(0))
    new_gls, trans, metrics = sharded_round(gls, None, 1.0)

    served_sum = 0
    for s in range(N_DEV):
        local = _shard_slice(gls, s)
        ref_ls, ref_trans, ref_m = loop._round(local, None, 1.0, False)
        served_sum += int(ref_m["served"])

        # Per-shard env state equality (same program, same inputs).
        got_env = jax.tree.map(
            lambda x: x[s * B_LOCAL:(s + 1) * B_LOCAL], new_gls.env
        )
        for got, ref in zip(jax.tree.leaves(got_env), jax.tree.leaves(ref_ls.env)):
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=0, atol=1e-6,
            )

        # Per-shard transition equality.
        cap = loop.capacity
        for k in ("action", "reward", "mask", "has_next", "env"):
            got = np.asarray(trans[k][s * cap:(s + 1) * cap], np.float32)
            ref = np.asarray(ref_trans[k], np.float32)
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6, err_msg=k)

    # Metrics are psum-reduced global sums.
    assert int(metrics["served"]) == served_sum
    assert served_sum == N_DEV * B_LOCAL  # every env served on round 0


def test_sharded_round_runs_multiple_rounds_and_counts_globally(mesh, loop):
    sharded_round, global_init = fused_mod.make_sharded_round(loop, mesh)
    gls = global_init(jax.random.PRNGKey(1))
    total_served = 0
    for _ in range(6):
        gls, trans, metrics = sharded_round(gls, None, 1.0)
        served = int(metrics["served"])
        # served is globally reduced: bounded by the GLOBAL env count.
        assert 0 <= served <= N_DEV * B_LOCAL
        total_served += served
        mask = np.asarray(trans["mask"])
        env_idx = np.asarray(trans["env"])
        # Rows with any completed transition carry a valid local env index.
        assert env_idx.shape[0] == N_DEV * loop.capacity
        assert np.all(env_idx[mask.any(axis=1)] >= 0)
        assert np.all(env_idx < B_LOCAL)
    assert total_served > N_DEV * B_LOCAL  # simulation advances across rounds


def test_sharded_round_distinct_shard_rng(mesh, loop):
    """Per-shard RNG streams: shard episodes must differ (the global_init
    splits the key per shard; identical streams would make every shard's
    random spawn identical)."""
    sharded_round, global_init = fused_mod.make_sharded_round(loop, mesh)
    gls = global_init(jax.random.PRNGKey(2))
    pos = np.asarray(gls.env.robot_pos)  # (N_DEV*B_LOCAL, R, 2)
    shard0 = pos[:B_LOCAL]
    shard1 = pos[B_LOCAL:2 * B_LOCAL]
    assert not np.allclose(shard0, shard1)


def test_warm_gate_shard_floor_reaches_per_shard_batch(mesh):
    """VERDICT r3 weak #4: the warm gate keys on the MIN per-shard replay
    fill (`served_shard_min` floor).  At the production batch ratio
    (batch_size 32 over 8 shards => 4 transitions/shard before updates can
    run) every shard's ring must reach the per-shard batch within a bounded
    number of rounds — a silently starving shard would stall the gate
    forever while the global timestep count kept growing."""
    from spatial_intention_maps_tpu.envs.types import EnvParams
    from spatial_intention_maps_tpu.train.fused import FusedTrainer
    from spatial_intention_maps_tpu.utils.config_dict import ConfigDict

    n = N_DEV
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 1}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=2,
        num_pass_pairs=1,
    )
    cfg = ConfigDict(
        batch_size=32,                      # -> 4 per shard, production ratio
        learning_rate=0.01,
        weight_decay=1e-4,
        grad_norm_clipping=100,
        num_input_channels=params.num_state_channels,
        use_predicted_intention=False,
        total_timesteps=64,
        exploration_frac=1.0,
        replay_buffer_size=64 * n,
        use_double_dqn=True,
        discount_factors=[0.75],
        final_exploration=1.0,
        learning_starts_frac=0.1,
        train_freq=4,
        target_update_freq=1000,
        num_parallel_envs=2 * n,
        substeps_per_round=256,
        compute_dtype="float32",
        fcn_layer_planes=[8, 8, 8, 8],
        fcn_head_planes=[8, 8],
    )
    tr = FusedTrainer(cfg, params, num_envs=2 * n, num_devices=n)
    ls = tr._global_init(jax.random.PRNGKey(3))
    per_shard_batch = cfg.batch_size // n
    for rounds in range(1, 65):
        ls, trans, m = tr._sharded_round(ls, tr._variables(), 1.0)
        tr._push(0, trans)
        floor = int(jnp.min(tr.buffers[0].size))
        if floor >= per_shard_batch:
            break
    else:
        raise AssertionError(
            "warm-gate floor never reached per-shard batch: sizes="
            f"{np.asarray(tr.buffers[0].size)}"
        )
    sizes = np.asarray(tr.buffers[0].size)
    assert sizes.min() >= per_shard_batch, sizes
    assert rounds < 64, rounds
