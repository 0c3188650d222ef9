#!/usr/bin/env bash
# Causal HiFi-Codec (beyond-reference): same architecture with a causal
# generator — tokens -> wav decoding becomes chunk-streamable
# (streaming.StreamingVQVAEDecoder) for incremental TTS synthesis.
set -euo pipefail
train_lst=${1:?train filelist}
valid_lst=${2:?valid filelist}
log_root=${3:-ckpts/HiFi-Codec-24k-320d-causal}
python -m academicodec_tpu.cli.train_hificodec \
  --config config_24k_320d_causal.json \
  --input_training_file "${train_lst}" \
  --input_validation_file "${valid_lst}" \
  --checkpoint_path "${log_root}"
