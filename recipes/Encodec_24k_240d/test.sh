#!/usr/bin/env bash
set -euo pipefail
ckpt=${1:?checkpoint}
wav_dir=${2:?input wav dir}
out_dir=${3:-outputs}
python -m academicodec_tpu.cli.compress \
  --input "${wav_dir}" --output "${out_dir}" \
  --resume_path "${ckpt}" \
  --sr 24000 --ratios 6 5 4 2 \
  --target_bandwidths 1 2 4 8 12 --target_bw 12 --ecdc
