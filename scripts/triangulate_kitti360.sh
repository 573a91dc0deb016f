#!/usr/bin/env bash
set -euo pipefail
KITTI_ROOT=${KITTI_ROOT:-/data/KITTI-360}
SEQ=${SEQ:-2013_05_28_drive_0009_sync}
python -m vegs_tpu.tools.triangulate --kitti_root "$KITTI_ROOT" \
  --seq "$SEQ" --start_frame "$1" --end_frame "$2"
