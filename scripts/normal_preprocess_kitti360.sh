#!/usr/bin/env bash
# DPT normal maps for all sequences (reference bash_scripts/normal_preprocess_kitti360.sh)
set -euo pipefail
KITTI_ROOT=${KITTI_ROOT:-/data/KITTI-360}
CKPT=${CKPT:-weights/omnidata_dpt_normal_v2.ckpt}
python -m vegs_tpu.tools.estimate_normal --kitti_root "$KITTI_ROOT" \
  --checkpoint "$CKPT" --seqs "$@"
