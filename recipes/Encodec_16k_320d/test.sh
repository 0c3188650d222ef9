#!/usr/bin/env bash
# Inference round-trip (reference: egs/Encodec_16k_320d/test.sh)
set -euo pipefail
ckpt=${1:?checkpoint (.pth torch or orbax dir)}
wav_dir=${2:?input wav dir}
out_dir=${3:-outputs/encodec_16k_320d}
python -m academicodec_tpu.cli.compress \
  --input "${wav_dir}" --output "${out_dir}" \
  --resume_path "${ckpt}" \
  --sr 16000 --ratios 8 5 4 2 \
  --target_bandwidths 1 1.5 2 4 6 12 --target_bw 12 --ecdc
