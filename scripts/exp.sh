#!/usr/bin/env bash
# Sweep runner: scheduler x task (reference: scripts/exp.sh)
set -uo pipefail
MODEL=${MODEL:-musicldm}
DATA=${DATA:-moises}
EXTRA=${EXTRA:-}
for scheduler in dps mpgd dsg diffmusic ditto; do
  for task in music_inpainting super_resolution phase_retrieval music_dereverberation; do
    echo "=== $scheduler / $task ==="
    python run.py -c "$scheduler" -t "$task" -d "$DATA" -m "$MODEL" $EXTRA
  done
done
