#!/bin/bash
# Round-5 post-training probe queue. Waits for r5_tpu_queue.sh to finish,
# then runs (sequentially, single TPU holder):
#   1. multi-length LM compression probe, Encodec rich 8000-step ckpt
#   2. same, HiFi-Codec GRVQ rich 24000-step ckpt
#   3. bitrate-matched Encodec eval (--eval_nq 3) on the rich held-out
#   4. HiFi-Codec eval + int8 W8A8 row on the same checkpoint generation
# Logs: /tmp/r5_lm_enc.log /tmp/r5_lm_hifi.log /tmp/r5_eval_enc.log /tmp/r5_eval_hifi.log
set -u
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo

for i in $(seq 1 600); do
  grep -q "TRAINING QUEUE DONE" /tmp/r5_tpu_queue.log 2>/dev/null && break
  sleep 60
done

latest_ckpt() {  # family -> newest val checkpoint path
  ls -d benchmarks/ckpts_rich/val_$1_* 2>/dev/null | sort | tail -1
}

ENC=$(latest_ckpt encodec)
HIFI=$(latest_ckpt hificodec)
echo "probe queue: ENC=$ENC HIFI=$HIFI" > /tmp/r5_probes_status.log

if [ -n "$ENC" ]; then
  timeout 5400 python benchmarks/lm_compression_probe.py \
    --codec_ckpt "$ENC" --corpus rich --lengths 1 5 30 60 \
    > /tmp/r5_lm_enc.log 2>&1
  echo "lm_enc rc=$?" >> /tmp/r5_probes_status.log
  sleep 75
  timeout 1800 python benchmarks/train_validation.py --family encodec \
    --corpus rich --eval_ckpt "$ENC" --eval_nq 3 \
    > /tmp/r5_eval_enc.log 2>&1
  echo "eval_enc rc=$?" >> /tmp/r5_probes_status.log
  sleep 75
fi
if [ -n "$HIFI" ]; then
  timeout 5400 python benchmarks/lm_compression_probe.py --family hificodec \
    --codec_ckpt "$HIFI" --corpus rich --lengths 1 5 30 60 \
    > /tmp/r5_lm_hifi.log 2>&1
  echo "lm_hifi rc=$?" >> /tmp/r5_probes_status.log
  sleep 75
  timeout 1800 python benchmarks/train_validation.py --family hificodec \
    --corpus rich --eval_ckpt "$HIFI" --int8_min_channels 128 \
    > /tmp/r5_eval_hifi.log 2>&1
  echo "eval_hifi rc=$?" >> /tmp/r5_probes_status.log
fi
echo "PROBE QUEUE DONE $(date +%F_%T)" >> /tmp/r5_probes_status.log
