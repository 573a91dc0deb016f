#!/usr/bin/env bash
# Train one KITTI-360 segment (parity with the reference's
# bash_scripts/train_kitti360.sh; device selection is JAX-native).
set -euo pipefail
KITTI_ROOT=${KITTI_ROOT:-/data/KITTI-360}
SEQ=${SEQ:-2013_05_28_drive_0009_sync}
START=${START:-3972}
END=${END:-4258}
OUT=${OUT:-output/kitti360_${SEQ}_${START}_${END}}

python -m vegs_tpu.train \
  --source_path "$KITTI_ROOT" --model_path "$OUT" \
  --seq "$SEQ" --start_frame "$START" --end_frame "$END" \
  --data_type kitti360 --eval "$@"
