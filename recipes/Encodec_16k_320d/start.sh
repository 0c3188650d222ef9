#!/usr/bin/env bash
# Encodec 16 kHz / 320x hop recipe (reference: egs/Encodec_16k_320d/start.sh)
set -euo pipefail
train_data_dir=${1:?train wav dir or filelist}
valid_data_dir=${2:?valid wav dir or filelist}
log_root=${3:-ckpts/encodec_16k_320d}
python -m academicodec_tpu.cli.train_encodec \
  --batch_size 128 --n_epochs 300 \
  --path "${log_root}" \
  --train_data_path "${train_data_dir}" --valid_data_path "${valid_data_dir}" \
  --sr 16000 --ratios 8 5 4 2 \
  --target_bandwidths 1 1.5 2 4 6 12
