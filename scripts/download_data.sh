#!/usr/bin/env bash
# Dataset fetch (reference: scripts/download_data.sh pulls two Google-Drive zips
# with gdown). This environment has zero egress; place the archives manually:
#   data/moises_subset/     (wav, 16 kHz)
#   data/musiccaps_subset/  (wav, 16 kHz)
set -euo pipefail
mkdir -p data
if command -v gdown >/dev/null 2>&1; then
  gdown --fuzzy "$MOISES_GDRIVE_URL" -O data/moises_subset.zip && unzip -o data/moises_subset.zip -d data/
  gdown --fuzzy "$MUSICCAPS_GDRIVE_URL" -O data/musiccaps_subset.zip && unzip -o data/musiccaps_subset.zip -d data/
else
  echo "no egress: copy moises_subset/ and musiccaps_subset/ into data/ manually" >&2
fi
