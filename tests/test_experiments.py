"""Experiment-generator spec tests (reference
tools_generate_experiments.py:22-47 discount table; :77-82 scaling rules)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools_generate_experiments import get_discount_factors


def test_discount_table_matches_reference_spec():
    assert get_discount_factors([{"lifting_robot": 1}]) == [0.75]
    assert get_discount_factors([{"pushing_robot": 1}]) == [0.75]
    assert get_discount_factors([{"throwing_robot": 1}]) == [0.75]
    assert get_discount_factors([{"rescue_robot": 1}]) == [0.2]
    assert get_discount_factors([{"lifting_robot": 4}]) == [0.85]
    assert get_discount_factors([{"pushing_robot": 4}]) == [0.85]
    assert get_discount_factors([{"rescue_robot": 4}]) == [0.35]


def test_discount_team_size_counts_whole_team():
    # Heterogeneous teams: every group uses the TEAM discount because the
    # whole team has >1 robot, regardless of per-group count.
    assert get_discount_factors(
        [{"lifting_robot": 2}, {"throwing_robot": 2}]
    ) == [0.85, 0.85]
    assert get_discount_factors(
        [{"lifting_robot": 1}, {"pushing_robot": 1}]
    ) == [0.85, 0.85]


def test_generated_tree_scaling_rules():
    """Spot-check the committed configs follow total_timesteps x= num_robots,
    train_freq = num_robots (reference :77-82)."""
    from spatial_intention_maps_tpu import config as config_mod

    root = Path(__file__).resolve().parents[1] / "configs" / "experiments"
    c1 = config_mod.load_config(root / "base" / "lifting_1-small_empty-base.yml")
    c4 = config_mod.load_config(root / "base" / "lifting_4-small_divider-base.yml")
    assert c4.total_timesteps == 4 * c1.total_timesteps
    assert c4.train_freq == 4 and c1.train_freq == 1
    assert c1.discount_factors == [0.75]
    assert c4.discount_factors == [0.85]

    het = config_mod.load_config(
        root / "ours" / "lifting_2_throwing_2-large_empty-ours.yml"
    )
    assert het.discount_factors == [0.85, 0.85]
    assert het.train_freq == 4
    assert het.total_timesteps == 4 * 40000
