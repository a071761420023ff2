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


def test_select_run_noninteractive_falls_back_to_most_recent(tmp_path):
    """select_run (reference utils.py:61-90): without a TTY it must return
    the most recent run's config.yml, never prompt."""
    from spatial_intention_maps_tpu import config as config_mod

    for name in ["20260101T000000-a", "20260102T000000-b", "20260103T000000-c"]:
        (tmp_path / name).mkdir()
    # run names sort lexicographically = chronologically
    out = config_mod.select_run(logs_dir=tmp_path)
    assert out == tmp_path / "20260103T000000-c" / "config.yml"
    assert config_mod.select_run(logs_dir=tmp_path / "missing") is None


def test_select_run_interactive_picks_by_index(tmp_path, monkeypatch):
    """On a TTY the picker lists newest-first and returns the chosen run
    (index 1 = second newest); empty input defaults to the newest."""
    import sys
    from spatial_intention_maps_tpu import config as config_mod

    for name in ["20260101T000000-a", "20260102T000000-b", "20260103T000000-c"]:
        (tmp_path / name).mkdir()
    monkeypatch.setattr(sys.stdin, "isatty", lambda: True)
    monkeypatch.setattr(sys.stdout, "isatty", lambda: True)
    monkeypatch.setattr("builtins.input", lambda prompt="": "1")
    out = config_mod.select_run(logs_dir=tmp_path)
    assert out == tmp_path / "20260102T000000-b" / "config.yml"
    monkeypatch.setattr("builtins.input", lambda prompt="": "")
    out = config_mod.select_run(logs_dir=tmp_path)
    assert out == tmp_path / "20260103T000000-c" / "config.yml"
