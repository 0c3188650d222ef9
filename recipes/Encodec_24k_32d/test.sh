#!/usr/bin/env bash
set -euo pipefail
ckpt=${1:?checkpoint}
wav_dir=${2:?input wav dir}
out_dir=${3:-outputs/encodec_24k_32d}
python -m academicodec_tpu.cli.compress \
  --input "${wav_dir}" --output "${out_dir}" \
  --resume_path "${ckpt}" \
  --sr 24000 --ratios 2 2 2 4 \
  --target_bandwidths 7.5 15 --target_bw 15 --ecdc
