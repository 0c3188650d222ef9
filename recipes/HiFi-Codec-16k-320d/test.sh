#!/usr/bin/env bash
# Copy-synthesis + token extraction (reference: egs/HiFi-Codec-16k-320d/test.sh + infer.ipynb)
set -euo pipefail
ckpt=${1:?checkpoint}
wav_dir=${2:?input wav dir}
out_dir=${3:-outputs/HiFi-Codec-16k-320d}
python -m academicodec_tpu.cli.extract_tokens \
  --config config_16k_320d.json --model_path "${ckpt}" \
  --input "${wav_dir}" --outputdir "${out_dir}" \
  --tokens_out "${out_dir}/tokens.npz"
