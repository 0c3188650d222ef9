#!/usr/bin/env bash
# Encodec 24 kHz / 240x hop recipe (reference: egs/Encodec_24k_240d/start.sh)
set -euo pipefail
train_data_dir=${1:?train wav dir or filelist}
valid_data_dir=${2:?valid wav dir or filelist}
log_root=${3:-ckpts/encodec_24k_240d}
python -m academicodec_tpu.cli.train_encodec \
  --batch_size 128 --n_epochs 300 \
  --path "${log_root}" \
  --train_data_path "${train_data_dir}" --valid_data_path "${valid_data_dir}" \
  --sr 24000 --ratios 6 5 4 2 \
  --target_bandwidths 1 2 4 8 12
