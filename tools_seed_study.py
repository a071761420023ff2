"""Multi-seed base-vs-ours study on lifting_4-small_divider (VERDICT r4 #3).

The live eval_summary cutoff tightens whenever any faster method lands, so
cross-round numbers drift.  This tool PINS the cutoff: by default to the
earliest-best-method cutoff computed over the committed NON-seed runs in the
group (i.e. what `eval_summary.py` used before the seed study landed), and
reports per-seed cubes@pinned-cutoff and cubes@termination for base and ours,
with across-seed mean +- std.

Usage: python tools_seed_study.py [--eval-dir eval] [--cutoff SIMSTEPS]
"""

import argparse
from collections import defaultdict

import numpy as np

from eval_summary import get_all_cutoffs, load_all, run_key

GROUP = "lifting_4-small_divider"
METHODS = ("base", "ours")


def cubes_at(data, cutoff):
    vals = []
    for episode in data:
        steps = np.array([e["simulation_steps"] for e in episode])
        cubes = np.array([e["cubes"] for e in episode])
        if len(steps) == 0:
            vals.append(0.0)
            continue
        vals.append(float(np.interp(cutoff, steps, cubes, left=0,
                                    right=cubes[-1])))
    return np.array(vals)


def cubes_at_termination(data):
    return np.array([
        float(episode[-1]["cubes"]) if len(episode) else 0.0
        for episode in data
    ])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-dir", default="eval")
    ap.add_argument("--cutoff", type=float, default=None,
                    help="pin the cutoff explicitly (sim steps)")
    args = ap.parse_args()

    runs = load_all(args.eval_dir)
    group_runs = {
        name: data for name, data in runs.items()
        if run_key(name)[0] == GROUP
    }
    if args.cutoff is None:
        nonseed = {
            n: d for n, d in group_runs.items()
            if "seed" not in run_key(n)[1]
        }
        cutoff = get_all_cutoffs(nonseed)[GROUP]
    else:
        cutoff = args.cutoff
    print(f"pinned cutoff: {cutoff:.0f} sim steps "
          f"({'explicit' if args.cutoff else 'non-seed committed runs'})")

    by_method = defaultdict(dict)  # base -> {seed: (at_cutoff, at_term)}
    for name, data in group_runs.items():
        _, method = run_key(name)
        base = method.split("-seed")[0]
        if base not in METHODS:
            continue
        seed = int(method.split("-seed")[1]) if "-seed" in method else 0
        # keep the NEWEST run per (method, seed)
        if seed in by_method[base] and name < by_method[base][seed][0]:
            continue
        by_method[base][seed] = (name, cubes_at(data, cutoff),
                                 cubes_at_termination(data))

    print(f"\n{'method':8s} {'seed':4s} {'cubes@cutoff':>16s} "
          f"{'cubes@termination':>18s}   run")
    summary = {}
    for method in METHODS:
        per_seed_cut, per_seed_term = [], []
        for seed in sorted(by_method[method]):
            name, at_cut, at_term = by_method[method][seed]
            per_seed_cut.append(at_cut.mean())
            per_seed_term.append(at_term.mean())
            print(f"{method:8s} {seed:<4d} "
                  f"{at_cut.mean():7.2f} +- {at_cut.std():5.2f} "
                  f"{at_term.mean():9.2f} +- {at_term.std():5.2f}   {name}")
        if per_seed_cut:
            summary[method] = (np.array(per_seed_cut), np.array(per_seed_term))

    print("\nacross-seed (mean of per-seed episode means +- std over seeds):")
    for method, (cut, term) in summary.items():
        print(f"  {method:8s} n={len(cut)}  cubes@cutoff "
              f"{cut.mean():.2f} +- {cut.std(ddof=1 if len(cut) > 1 else 0):.2f}"
              f"   @termination {term.mean():.2f} +- "
              f"{term.std(ddof=1 if len(term) > 1 else 0):.2f}")
    if len(summary) == 2 and all(len(v[0]) > 1 for v in summary.values()):
        b, o = summary["base"][0], summary["ours"][0]
        diff = o.mean() - b.mean()
        se = np.sqrt(b.var(ddof=1) / len(b) + o.var(ddof=1) / len(o))
        print(f"\nours - base @cutoff: {diff:+.2f} (Welch SE {se:.2f}, "
              f"t {diff / se if se > 0 else float('nan'):.2f})")


if __name__ == "__main__":
    main()
