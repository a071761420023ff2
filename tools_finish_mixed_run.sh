#!/bin/bash
# Finish/continue pipeline for the lifting_2_pushing_2-large_empty-ours run.
#
# The round-4 session trained this config to a partial checkpoint (committed
# under pretrained/..._partial_<STEP>/ with its metrics.jsonl + config.yml).
# To CONTINUE training to the full 240k+6k budget, restore the partial into a
# fresh run (config.yml's policy_path/checkpoint_path already point at it):
#
#   python train.py --config-path pretrained/<partial_dir>/config.yml \
#       --checkpoint-freq 8000
#
# (setup_run re-stamps a new run; load_policy/load_checkpoint restore nets,
# optimizer state, and the timestep so the epsilon/curriculum schedules
# resume where they left off.  Replay refills from live rollouts — buffer
# checkpoints are opt-in, matching the reference's policy-only resume.)
#
# To EVAL a policy dir (20 episodes @ seed 0) and refresh the curves:
#   bash tools_finish_mixed_run.sh pretrained/<dir>/config.yml
set -eu
cd "$(dirname "$0")"
CFG=${1:?usage: tools_finish_mixed_run.sh <config.yml>}
timeout 2400 python evaluate.py --config-path "$CFG" --fused --num-episodes 20
python eval_summary.py --plot eval/curves_r04.png || python eval_summary.py
