#!/bin/bash
# Post-run pipeline for the lifting_2_pushing_2-large_empty-ours training run:
# copy the final policy into pretrained/, run the 20-episode seed-0 eval, and
# regenerate the summary curves.  Run AFTER train.py has exited (one JAX
# process at a time on this host).
set -eu
cd "$(dirname "$0")"
RUN=20260819T221242099957-lifting_2_pushing_2-large_empty-ours
CKPT_DIR=checkpoints/$RUN
FINAL=$(ls "$CKPT_DIR" | grep '^policy_' | sort | tail -1)
STEP=${FINAL#policy_}
DEST=pretrained/lifting_2_pushing_2-large_empty-ours_policy_$STEP
echo "final policy: $FINAL -> $DEST"
rm -rf "$DEST"
cp -r "$CKPT_DIR/$FINAL" "$DEST"
cp "logs/$RUN/metrics.jsonl" "$DEST/metrics.jsonl"
# Point the run config at the FINAL policy (train.py's end-of-run save does
# not rewrite config.yml; the last log_fn save does, one segment earlier).
python - "$RUN" "$CKPT_DIR/$FINAL" <<'EOF'
import sys
from spatial_intention_maps_tpu import config as config_mod
run, final = sys.argv[1], sys.argv[2]
path = f"logs/{run}/config.yml"
cfg = config_mod.load_config(path)
cfg.policy_path = final
cfg.checkpoint_path = final.replace("policy_", "checkpoint_")
config_mod.save_config(path, cfg)
print("policy_path ->", cfg.policy_path)
EOF
cp "logs/$RUN/config.yml" "$DEST/config.yml"
timeout 2400 python evaluate.py --config-path "logs/$RUN/config.yml" --fused --num-episodes 20
python eval_summary.py --plot eval/curves_r04.png || python eval_summary.py
