#!/bin/bash
# Fetch the coil-100 image set and convert to the dense float64 binary
# consumed by `-tensor o1` (shape written: (7200, 128, 128, 3); the solver
# declares (3, 128, 128, 7200) over the same row-major buffer, matching
# the reference pipeline: script/get_coil.sh + script/imageloader.py).
set -e
URL="http://www.cs.columbia.edu/CAVE/databases/SLAM_coil-100/coil-100.zip"
wget -nc "$URL" -O coil-100.zip
unzip -n coil-100.zip
python - <<'PY'
from pairwise_perturbation_tpu.utils.io import build_coil100_binary
build_coil100_binary("coil-100", "coil-100.bin")
PY
