"""Mixed action-channel team through the EVAL stack: checkpoint save ->
EvalPolicy restore -> fused eval driver.

test_mixed_channels.py covers lifting (2-ch) + pushing (1-ch) through the
TRAINER; what is new here is the orbax policy round-trip with per-group
heads of DIFFERENT widths and the greedy eval rollout
(evaluate.run_eval_fused) serving both groups from one restored tree —
exactly the path the lifting_2_pushing_2 20-episode eval uses.
"""

import pytest
import sys
from pathlib import Path

import jax
import numpy as np

pytestmark = pytest.mark.slow  # end-to-end loop: minutes on the CPU mesh

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_mixed_channel_checkpoint_eval_roundtrip(tmp_path):
    import evaluate as evaluate_mod
    from spatial_intention_maps_tpu import config as config_mod
    from spatial_intention_maps_tpu import factory
    from spatial_intention_maps_tpu.eval_policy import EvalPolicy
    from spatial_intention_maps_tpu.train.fused import FusedTrainer
    from spatial_intention_maps_tpu.utils.checkpoint import save_checkpoint

    cfg = config_mod.default_config()
    cfg.experiment_name = "lifting_1_pushing_1-small_empty-test"
    cfg.robot_config = [{"lifting_robot": 1}, {"pushing_robot": 1}]
    cfg.env_name = "small_empty"
    cfg.room_length, cfg.room_width = 1.0, 0.5
    cfg.num_cubes = 2
    cfg.inactivity_cutoff_per_robot = 20
    cfg.fcn_layer_planes = [8, 8, 8, 8]
    cfg.fcn_head_planes = [8, 8]
    cfg.discount_factors = [0.85, 0.85]
    cfg.policy_path = None

    params = factory.env_params_from_cfg(cfg)
    cfg.num_input_channels = params.num_state_channels
    assert tuple(params.num_output_channels) == (2, 1)

    trainer = FusedTrainer(cfg, params, num_envs=2, seed=0)
    save_checkpoint(tmp_path, 7, trainer, include_buffers=False)
    cfg.policy_path = str(tmp_path / "policy_00000007")

    # Restore must keep the per-group head widths (2 vs 1 output channels).
    helper = EvalPolicy(cfg)
    heads = [
        jax.tree.leaves(v["params"])  # any leaf check below
        for v in helper.variables["policy"]
    ]
    assert len(helper.variables["policy"]) == 2
    shapes0 = {l.shape for l in jax.tree.leaves(helper.variables["policy"][0]["params"])}
    shapes1 = {l.shape for l in jax.tree.leaves(helper.variables["policy"][1]["params"])}
    assert any(s[-1] == 2 for s in shapes0 if len(s) == 4), shapes0
    assert any(s[-1] == 1 for s in shapes1 if len(s) == 4), shapes1

    episodes = evaluate_mod.run_eval_fused(
        cfg, num_episodes=2, max_rounds=12000, max_seconds=600
    )
    assert len(episodes) == 2
    for ep in episodes:
        assert len(ep) >= 1
        sims = [r["simulation_steps"] for r in ep]
        assert sims == sorted(sims)
        # Per-robot credit rows carry both robots (heterogeneous teams).
        assert len(ep[-1]["cubes_by_robot"]) == 2
