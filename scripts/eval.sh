#!/usr/bin/env bash
# Sweep eval over the outputs tree (reference: scripts/eval.sh)
set -uo pipefail
MODEL=${MODEL:-musicldm}
DATA=${DATA:-moises}
for scheduler in dps mpgd dsg diffmusic ditto; do
  for task in music_inpainting super_resolution phase_retrieval music_dereverberation; do
    dir="outputs/$MODEL/$DATA/$scheduler/$task"
    [ -d "$dir/wav_recon" ] || continue
    echo "=== $scheduler / $task ==="
    python eval.py -gt "$dir/wav_label" -r "$dir/wav_recon"
  done
done
