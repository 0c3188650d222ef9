#!/bin/bash
# Round-5 TPU queue: rich-corpus training for both GAN families, strictly
# sequential (one process holds the axon relay at a time). Each chunk is
# bounded by `timeout` and resumable via --resume_state, so a relay stall
# or chunk kill loses at most eval_every steps. Logs: /tmp/r5_tpu_queue.log
set -u
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo
LOG=/tmp/r5_tpu_queue.log

latest_step() {  # family -> highest saved state step (empty if none)
  ls benchmarks/states_rich 2>/dev/null \
    | sed -n "s/^state_$1_0*\([0-9][0-9]*\)$/\1/p" | sort -n | tail -1
}

train_to() {  # family target_step eval_every
  local fam=$1 target=$2 ev=$3 cur need resume
  for attempt in $(seq 1 14); do
    cur=$(latest_step "$fam"); cur=${cur:-0}
    if [ "$cur" -ge "$target" ]; then
      echo "=== $fam reached $cur >= $target" >> "$LOG"; return 0
    fi
    need=$((target - cur)); [ "$need" -gt 4000 ] && need=4000
    resume=""
    [ "$cur" -gt 0 ] && resume="--resume_state benchmarks/states_rich"
    echo "=== $(date +%F_%T) $fam $cur -> $((cur + need)) (attempt $attempt)" >> "$LOG"
    timeout 3600 python benchmarks/train_validation.py \
      --family "$fam" --corpus rich --steps "$need" --eval_every "$ev" \
      $resume --save_state benchmarks/states_rich \
      --save_path benchmarks/ckpts_rich >> "$LOG" 2>&1
    echo "=== rc=$?" >> "$LOG"
    sleep 75  # let a killed process's relay hold clear
  done
  echo "=== GAVE UP on $fam at $(latest_step "$fam")" >> "$LOG"; return 1
}

train_to encodec 8000 500
train_to hificodec 24000 1000
echo "=== TRAINING QUEUE DONE $(date +%F_%T)" >> "$LOG"
