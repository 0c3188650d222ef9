#!/usr/bin/env bash
# Copy-synthesis + token extraction for the causal variant (beyond-reference)
set -euo pipefail
ckpt=${1:?checkpoint}
wav_dir=${2:?input wav dir}
out_dir=${3:-outputs/HiFi-Codec-24k-320d-causal}
python -m academicodec_tpu.cli.extract_tokens \
  --config config_24k_320d_causal.json --model_path "${ckpt}" \
  --input "${wav_dir}" --outputdir "${out_dir}" \
  --tokens_out "${out_dir}/tokens.npz"
