#!/usr/bin/env bash
# HiFi-Codec recipe (reference: egs/HiFi-Codec-24k-240d/start.sh)
set -euo pipefail
train_lst=${1:?train filelist}
valid_lst=${2:?valid filelist}
log_root=${3:-ckpts/HiFi-Codec-24k-240d}
python -m academicodec_tpu.cli.train_hificodec \
  --config config_24k_240d.json \
  --input_training_file "${train_lst}" \
  --input_validation_file "${valid_lst}" \
  --checkpoint_path "${log_root}"
