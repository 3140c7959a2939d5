#!/usr/bin/env bash
# Fetch the two datasets whose raw blobs are absent from this mount
# (reference .MISSING_LARGE_BLOBS / SURVEY §2 C15), verify their structure,
# and capture golden reference trajectories for them.  Run this in a
# NETWORKED environment; this container has zero egress.
#
#   HAR        — UCI Human Activity Recognition Using Smartphones
#                (reference dataset.py:634-733 expects
#                datasets/HAR/{X,y}_{train,test}.txt)
#   GEFCOM2012 — Kaggle Global Energy Forecasting Competition 2012, load
#                track (reference dataset.py:122-310 expects
#                datasets/GEFCOM2012/Load/Load_history.csv etc.)
#
# After the files land, the shape validators below assert the exact
# invariants the loaders rely on, and the golden-capture step records the
# reference's seed-0 loss trajectories for tests/test_golden_parity.py.
set -euo pipefail
cd "$(dirname "$0")/.."

mkdir -p datasets/HAR datasets/GEFCOM2012/Load

# ---------------------------------------------------------------- HAR ---
if [ ! -f datasets/HAR/X_train.txt ]; then
  echo "Fetching UCI HAR..."
  curl -fL -o /tmp/har.zip \
    'https://archive.ics.uci.edu/static/public/240/human+activity+recognition+using+smartphones.zip'
  unzip -o /tmp/har.zip -d /tmp/har
  unzip -o '/tmp/har/UCI HAR Dataset.zip' -d /tmp/har 2>/dev/null || true
  base=$(find /tmp/har -name 'X_train.txt' -path '*train*' | head -1 | xargs dirname | xargs dirname)
  cp "$base/train/X_train.txt" "$base/train/y_train.txt" \
     "$base/test/X_test.txt"  "$base/test/y_test.txt"  datasets/HAR/
fi
sha256sum datasets/HAR/*.txt | tee datasets/HAR/SHA256SUMS

# Structural invariants from the UCI documentation / reference loader:
python - <<'EOF'
import numpy as np
xt = np.loadtxt('datasets/HAR/X_train.txt'); yt = np.loadtxt('datasets/HAR/y_train.txt')
xe = np.loadtxt('datasets/HAR/X_test.txt');  ye = np.loadtxt('datasets/HAR/y_test.txt')
assert xt.shape == (7352, 561), xt.shape   # documented UCI HAR train size
assert xe.shape == (2947, 561), xe.shape   # documented UCI HAR test size
assert len(yt) == 7352 and len(ye) == 2947
assert set(np.unique(yt)) <= set(range(1, 7))
print('HAR structure OK')
EOF

# --------------------------------------------------------- GEFCOM2012 ---
# Kaggle competition data: requires an authenticated Kaggle CLI
# (pip install kaggle; put the API token in ~/.kaggle/kaggle.json and
# accept the competition rules on the website first).
if [ ! -f datasets/GEFCOM2012/Load/Load_history.csv ]; then
  echo "Fetching GEFCOM2012 load track (Kaggle)..."
  kaggle competitions download -c global-energy-forecasting-competition-2012-load-forecasting \
    -p /tmp/gefcom
  unzip -o /tmp/gefcom/*.zip -d /tmp/gefcom
  find /tmp/gefcom -name 'Load_history.csv' -exec cp {} datasets/GEFCOM2012/Load/ \;
  find /tmp/gefcom -name 'temperature_history.csv' -exec cp {} datasets/GEFCOM2012/Load/ \; || true
fi
sha256sum datasets/GEFCOM2012/Load/*.csv | tee datasets/GEFCOM2012/Load/SHA256SUMS

python - <<'EOF'
import csv
with open('datasets/GEFCOM2012/Load/Load_history.csv') as f:
    header = next(csv.reader(f))
# Reference parser (dataset.py:201-292) expects zone_id, year, month, day, h1..h24.
assert header[:4] == ['zone_id', 'year', 'month', 'day'], header[:8]
assert len(header) == 28, len(header)
print('GEFCOM2012 structure OK')
EOF

# ------------------------------------------------- golden trajectories ---
# Capture the reference's seed-0 loss trajectories on the restored data
# (drives /root/reference in place; see tools/make_golden.py).  The
# recorded npz files feed tests/test_golden_parity.py, closing the
# loss-parity target for the 2 datasets BASELINE.md names but this mount
# cannot verify (HAR, GEFCOM2012).
python tools/make_golden.py --epochs 30 --skip-small --skip-googlestock \
  --datasets HAR,GEFCOM2012
echo "Done. Commit datasets/*/SHA256SUMS and tests/golden/*.npz."
