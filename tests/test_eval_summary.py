"""eval_summary analysis functions (pure host-side, eval_summary.ipynb
semantics: interpolated curves, cutoffs, cubes-at-cutoff)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import eval_summary as es


def fake_run(rate, n_eps=3, steps_per_ep=1000):
    data = []
    for _ in range(n_eps):
        ep = []
        cubes = 0
        for t in range(100, steps_per_ep + 1, 100):
            cubes = int(rate * t)
            ep.append({"simulation_steps": t, "cubes": cubes, "robot_collisions": 0})
        data.append(ep)
    return data


def test_cutoffs_and_results():
    runs = {
        "20260101T000000-lifting_4-small_empty-ours": fake_run(0.01),
        "20260101T000001-lifting_4-small_empty-base": fake_run(0.005),
    }
    cutoffs = es.get_all_cutoffs(runs)
    assert "lifting_4-small_empty" in cutoffs
    results = es.get_all_results(runs, cutoffs)
    ours = results[("lifting_4-small_empty", "ours")][0][0]
    base = results[("lifting_4-small_empty", "base")][0][0]
    # The faster method gathers more cubes at the shared cutoff.
    assert ours > base


def test_curves_interpolation():
    data = fake_run(0.01, n_eps=1)
    curves = es.get_curve_for_run(data)
    xs, ys = curves[0]
    assert xs[0] == 0 and ys[0] == 0
    assert ys[-1] == data[0][-1]["cubes"]
