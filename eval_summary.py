"""Evaluation summary tables (eval_summary.ipynb parity, as a script).

Loads all eval/<run>.npy files, interpolates cubes-vs-simulation-steps curves
(step 100), computes per-(robot-config, env) cutoffs = the earliest time the
best method gathered its last cube, and reports mean +- std cubes at cutoff
per experiment.

Usage: python eval_summary.py [--eval-dir eval]
"""

import argparse
from collections import defaultdict
from pathlib import Path

import numpy as np

STEP = 100


def get_curve_for_run(data, max_steps=None):
    """Interpolated cubes-vs-sim-steps curves per episode."""
    curves = []
    for episode in data:
        steps = np.array([e["simulation_steps"] for e in episode])
        cubes = np.array([e["cubes"] for e in episode])
        if max_steps is None:
            limit = steps[-1]
        else:
            limit = max_steps
        xs = np.arange(0, limit + STEP, STEP)
        ys = np.interp(xs, steps, cubes, left=0, right=cubes[-1] if len(cubes) else 0)
        curves.append((xs, ys))
    return curves


def run_key(run_name):
    """<timestamp>-<robots>-<env>-<method> -> (robots-env, method)."""
    parts = run_name.split("-")
    if len(parts) >= 4:
        return "-".join(parts[1:3]), "-".join(parts[3:])
    return run_name, "unknown"


def load_all(eval_dir):
    runs = {}
    for path in sorted(Path(eval_dir).glob("*.npy")):
        runs[path.stem] = np.load(path, allow_pickle=True)
    return runs


def get_all_cutoffs(runs):
    """Per (robot-config, env) group: earliest sim-step at which the best
    method collected its final cube."""
    cutoffs = {}
    for run_name, data in runs.items():
        cfg_env, _ = run_key(run_name)
        last_cube_steps = []
        for episode in data:
            cubes = [e["cubes"] for e in episode]
            steps = [e["simulation_steps"] for e in episode]
            final = cubes[-1] if cubes else 0
            t = next((s for s, c in zip(steps, cubes) if c >= final), steps[-1] if steps else 0)
            last_cube_steps.append(t)
        mean_t = float(np.mean(last_cube_steps)) if last_cube_steps else 0.0
        cutoffs[cfg_env] = min(cutoffs.get(cfg_env, float("inf")), mean_t)
    return cutoffs


def get_all_results(runs, cutoffs):
    results = defaultdict(list)
    for run_name, data in runs.items():
        cfg_env, method = run_key(run_name)
        cutoff = cutoffs.get(cfg_env, None)
        cubes_at_cutoff = []
        for episode in data:
            steps = np.array([e["simulation_steps"] for e in episode])
            cubes = np.array([e["cubes"] for e in episode])
            if len(steps) == 0:
                cubes_at_cutoff.append(0)
                continue
            c = np.interp(cutoff, steps, cubes, left=0, right=cubes[-1])
            cubes_at_cutoff.append(c)
        results[(cfg_env, method)].append(
            (float(np.mean(cubes_at_cutoff)), float(np.std(cubes_at_cutoff)))
        )
    return results


def mean_curve(data, max_steps):
    """Mean +- std cubes-vs-sim-steps curve over a run's episodes, resampled
    onto a common grid (eval_summary.ipynb show_curves cells)."""
    xs = np.arange(0, max_steps + STEP, STEP)
    ys = []
    for episode in data:
        steps = np.array([e["simulation_steps"] for e in episode])
        cubes = np.array([e["cubes"] for e in episode])
        if len(steps) == 0:
            ys.append(np.zeros_like(xs, float))
            continue
        ys.append(np.interp(xs, steps, cubes, left=0, right=cubes[-1]))
    ys = np.stack(ys)
    return xs, ys.mean(axis=0), ys.std(axis=0)


def show_curves(runs, output_path):
    """Per-(robot-config, env) panel of per-method mean curves with std
    bands, saved as a PNG (the notebook's interactive show_curves)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    by_group = defaultdict(dict)
    for run_name, data in runs.items():
        cfg_env, method = run_key(run_name)
        by_group[cfg_env][method] = data

    n = len(by_group)
    fig, axes = plt.subplots(n, 1, figsize=(7, 3.2 * n), squeeze=False)
    for ax, (cfg_env, methods) in zip(axes[:, 0], sorted(by_group.items())):
        max_steps = max(
            (ep[-1]["simulation_steps"] for data in methods.values()
             for ep in data if len(ep)),
            default=STEP,
        )
        for method, data in sorted(methods.items()):
            xs, mean, std = mean_curve(data, max_steps)
            ax.plot(xs, mean, label=method)
            ax.fill_between(xs, mean - std, mean + std, alpha=0.2)
        ax.set_title(cfg_env)
        ax.set_xlabel("simulation steps")
        ax.set_ylabel("cubes")
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(output_path, dpi=120)
    print("curves saved to", output_path)


def count_truncated(data):
    """Episodes whose final record carries the batched-eval truncation flag
    (wall/action cap hit before a task-rule termination)."""
    return sum(1 for ep in data if len(ep) and ep[-1].get("truncated"))


def main(eval_dir, plot=None):
    runs = load_all(eval_dir)
    if not runs:
        print("no eval results in", eval_dir)
        return
    cutoffs = get_all_cutoffs(runs)
    results = get_all_results(runs, cutoffs)
    print(f"{'config-env':40s} {'method':28s} {'cubes@cutoff':>14s}")
    for (cfg_env, method), vals in sorted(results.items()):
        for mean, std in vals:
            print(f"{cfg_env:40s} {method:28s} {mean:8.2f} +- {std:.2f}")
    for run_name, data in sorted(runs.items()):
        n_trunc = count_truncated(data)
        if n_trunc:
            print(f"WARNING: {run_name}: {n_trunc} truncated episode(s) "
                  f"(hit eval caps, not task-rule termination)")
    if plot:
        show_curves(runs, plot)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval-dir", default="eval")
    parser.add_argument("--plot", default=None, help="save curve panel PNG")
    args = parser.parse_args()
    main(args.eval_dir, args.plot)
