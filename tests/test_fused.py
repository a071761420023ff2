"""Fused substep-budget loop: liveness + bookkeeping invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu import constants
from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.train.fused import FusedLoop


@pytest.fixture(scope="module")
def loop():
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 1}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=3,
        use_partial_observations=False,
    )
    return FusedLoop(
        params, num_envs=4, num_channels=params.num_state_channels,
        substeps_per_round=64, service_capacity=4,
    )


def test_fused_loop_serves_and_tracks(loop):
    ls = loop.init(jax.random.PRNGKey(0))
    served_total = 0
    completed = 0
    rewards = []
    for _ in range(30):
        ls, trans, m = loop.round(ls)
        served_total += int(m["served"])
        mask = np.asarray(trans["mask"])
        completed += int(mask.sum())
        if mask.any():
            rewards.extend(np.asarray(trans["reward"])[mask].tolist())
            # Completed transitions carry finite rewards and valid actions.
            acts = np.asarray(trans["action"])[mask]
            assert np.isfinite(np.asarray(trans["reward"])[mask]).all()
            assert (acts >= 0).all()
            assert (acts < 2 * 96 * 96).all()

    # The initial batch was served and actions keep completing.
    assert served_total >= 8, served_total
    assert completed >= 1, completed

    env = ls.env
    # Simulation advanced and invariants hold.
    assert int(jnp.max(env.simulation_steps)) > 500
    z = np.asarray(env.cube_pos[..., 2])
    status = np.asarray(env.cube_status)
    live = status != 3  # not removed
    assert (z[live] > -0.01).all()
    # Pending bookkeeping: any env frozen awaiting service has an idle robot.
    idle_any = np.asarray(jnp.any(env.fsm == 0, axis=1))
    assert idle_any.shape == (4,)


@pytest.mark.slow
def test_run_eval_fused_completes_episodes(tmp_path):
    """The fused eval driver (evaluate.run_eval_fused) rolls per-env
    episodes to task-rule termination and records monotone
    (simulation_steps, cubes) streams in the reference's npy schema."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import evaluate as evaluate_mod
    from spatial_intention_maps_tpu import config as config_mod

    cfg = config_mod.default_config()
    cfg.experiment_name = "lifting_1-small_empty-test"
    cfg.robot_config = [{"lifting_robot": 1}]
    cfg.env_name = "small_empty"
    cfg.room_length, cfg.room_width = 1.0, 0.5
    cfg.num_cubes = 2
    cfg.num_input_channels = 4
    cfg.inactivity_cutoff_per_robot = 20
    cfg.fcn_layer_planes = [8, 8, 8, 8]
    cfg.fcn_head_planes = [8, 8]
    cfg.policy_path = None

    episodes = evaluate_mod.run_eval_fused(cfg, num_episodes=2,
                                           max_rounds=12000, max_seconds=600)
    assert len(episodes) == 2
    for ep in episodes:
        assert len(ep) >= 1
        sims = [r["simulation_steps"] for r in ep]
        cubes = [r["cubes"] for r in ep]
        assert sims == sorted(sims)
        assert cubes == sorted(cubes)
        assert all(set(r) <= {"simulation_steps", "cubes", "cubes_by_robot",
                              "robot_collisions", "truncated"} for r in ep)
        # per-robot credit sums to the episode total (heterogeneous-team
        # evals use this to show every group scoring)
        assert all(sum(r["cubes_by_robot"]) == r["cubes"] for r in ep)


def test_use_gt_intention_curriculum_schedule():
    """Curriculum gate parity with the reference (train.py:230-232): GT
    intention while (timestep - warmup)/total <= use_predicted_intention_frac,
    predictions afterwards; always False when the flag is off."""
    from spatial_intention_maps_tpu.train.loop import use_gt_intention
    from spatial_intention_maps_tpu.utils.config_dict import ConfigDict

    cfg = ConfigDict(
        use_predicted_intention=True,
        use_predicted_intention_frac=0.9,
        total_timesteps=1000,
    )
    warm = 25
    # Warm-up and the whole GT phase.
    assert use_gt_intention(cfg, 0, warm)
    assert use_gt_intention(cfg, warm, warm)
    assert use_gt_intention(cfg, warm + 900, warm)  # frac == 0.9 inclusive
    # Past the curriculum fraction: use the net's own predictions.
    assert not use_gt_intention(cfg, warm + 901, warm)
    assert not use_gt_intention(cfg, warm + 1000, warm)
    # Flag off => never GT-gated.
    off = ConfigDict(use_predicted_intention=False, total_timesteps=1000)
    assert not use_gt_intention(off, 0, warm)


def test_percep_cache_bit_exact():
    """The distance-field cache must be invisible: a cached loop and an
    uncached loop driven with the same keys produce identical transition
    streams and identical env states across rounds spanning map updates,
    refresh rounds, and budget-exceeded fallbacks."""
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 2}],
        env_name="small_divider",
        room_length=1.0,
        room_width=0.5,
        num_cubes=3,
        num_pass_pairs=2,
        use_partial_observations=True,
        use_intention_map=True,
        intention_map_encoding="ramp",
    )
    kw = dict(num_envs=4, num_channels=params.num_state_channels,
              substeps_per_round=32, service_capacity=4)
    loop_c = FusedLoop(params, use_percep_cache=True, percep_cache_budget=3,
                       **kw)
    loop_u = FusedLoop(params, use_percep_cache=False, **kw)
    ls_c = loop_c.init(jax.random.PRNGKey(7))
    ls_u = loop_u.init(jax.random.PRNGKey(7))
    assert ls_c.percep_cache is not None and ls_u.percep_cache is None

    for i in range(12):
        ls_c, tr_c, m_c = loop_c.round(ls_c, None, 1.0)
        ls_u, tr_u, m_u = loop_u.round(ls_u, None, 1.0)
        for k in tr_c:
            np.testing.assert_array_equal(
                np.asarray(tr_c[k]), np.asarray(tr_u[k]),
                err_msg=f"round {i} transition field {k}",
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            ls_c.env, ls_u.env,
        )
        np.testing.assert_array_equal(
            np.asarray(ls_c.stored_obs), np.asarray(ls_u.stored_obs)
        )
