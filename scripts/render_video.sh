#!/usr/bin/env bash
set -euo pipefail
OUT=${OUT:?set OUT to the trained model path}
python -m vegs_tpu.render_video --model_path "$OUT" "$@"
