#!/bin/bash
# Fetch the time-lapse hyperspectral .mat set and convert to the dense
# float64 binary consumed by `-tensor o2` (reference pipeline:
# script/get_time_lapse.sh + script/unzip_time_lapse.sh + script/matloader.py).
set -e
BASE="http://www.ehu.eus/ccwintco/uploads"
mkdir -p time-lapse && cd time-lapse
for i in $(seq 1 9); do
  wget -nc "$BASE/nogueira_scene${i}.mat" || true
done
cd ..
python - <<'PY'
from pairwise_perturbation_tpu.utils.io import build_time_lapse_binary
build_time_lapse_binary("time-lapse", "time-lapse.bin")
PY
