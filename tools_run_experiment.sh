#!/bin/bash
# Train one experiment config on the chip, then run the 20-episode fused
# eval protocol on the finished policy.  One background task per queued run.
#
# Usage: tools_run_experiment.sh <config.yml> [extra train.py args...]
set -uo pipefail
cd "$(dirname "$0")"
CFG="$1"; shift || true

before=$(ls logs 2>/dev/null)
timeout 14000 python train.py --config-path "$CFG" "$@"
rc=$?
after=$(ls logs)
RUN=$(comm -13 <(echo "$before") <(echo "$after") | tail -1)
if [ -z "$RUN" ]; then
  # resumed run: config path IS the run config
  RUN=$(dirname "$CFG" | xargs basename)
fi
echo "=== train rc=$rc run=$RUN ==="
if [ $rc -ne 0 ]; then exit $rc; fi
timeout 2400 python evaluate.py --config-path "logs/$RUN/config.yml" --fused --num-episodes 20
echo "=== eval rc=$? run=$RUN ==="
