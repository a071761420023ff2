#!/bin/bash
# Package a finished training run: copy the final policy checkpoint into
# pretrained/<config-name>_policy_<step>/ (with config + metrics), matching
# the repo convention the README results table points at.
#
# Usage: tools_package_run.sh <run-dir-name> [step]
#   <run-dir-name>: a directory under logs/ (e.g. 20260820T...-ours-seed1)
#   [step]: checkpoint step; default = the highest policy_* present
set -eu
cd "$(dirname "$0")"
RUN=${1:?usage: tools_package_run.sh <run-dir-name> [step]}
NAME=$(echo "$RUN" | cut -d- -f2-)   # strip the timestamp prefix
CKPT_DIR="checkpoints/$RUN"
if [ -z "${2:-}" ]; then
  STEP=$(ls "$CKPT_DIR" | grep -o 'policy_[0-9]*' | sort | tail -1 | cut -d_ -f2)
else
  STEP=$2
fi
DST="pretrained/${NAME}_policy_${STEP}"
mkdir -p "$DST"
cp -r "$CKPT_DIR/policy_${STEP}/." "$DST/"
cp "logs/$RUN/config.yml" "$DST/config.yml"
cp "logs/$RUN/metrics.jsonl" "$DST/metrics.jsonl"
du -sh "$DST"
ls "$DST"
