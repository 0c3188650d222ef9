#!/bin/bash
# Deadline-aware round-5 TPU queue. Replaces the r5_tpu_queue.sh +
# r5_probe_queue.sh pair for the continuation session: the workspace wipe
# forced a from-zero rerun of BOTH families, which no longer fits the
# session wall clock — a naive "train everything, then probe" order would
# starve the probes (exactly how the round-4 LM table died). This queue
# keeps TPU holders strictly sequential and GUARANTEES the probe stages a
# slot by budgeting every training chunk against an absolute deadline.
#
#   usage: r5_timed_queue.sh DEADLINE_EPOCH [WAIT_PID]
#
#   1. Encodec rich -> 8000 (chunks, resumable via states_rich)
#   2. Encodec multi-length LM probe + bitrate-matched --eval_nq 3
#   3. HiFi-Codec rich -> as far as the clock allows (reserve kept back)
#   4. HiFi GRVQ LM probe + int8 eval on the newest checkpoint
#
# Logs: /tmp/r5_tpu_queue.log (training), /tmp/r5_lm_enc.log,
# /tmp/r5_eval_enc.log, /tmp/r5_lm_hifi.log, /tmp/r5_eval_hifi.log,
# status lines in /tmp/r5_probes_status.log
set -u
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo
LOG=/tmp/r5_tpu_queue.log
STATUS=/tmp/r5_probes_status.log
DEADLINE=${1:?absolute epoch seconds at which ALL TPU work must stop}
WAIT_PID=${2:-}

# Seconds/step estimates (measured; conservative, incl. host data-gen).
ENC_SPS=${ENC_SPS:-0.65}
HIFI_SPS=${HIFI_SPS:-1.3}
HIFI_PROBE_RESERVE=5200   # stage 4: LM probe (~3600) + int8 eval (~1500)

left() { echo $(( DEADLINE - $(date +%s) )); }

# Adopt any chunk the old queue still has running.
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  sleep 75
fi

latest_step() {
  ls benchmarks/states_rich 2>/dev/null \
    | sed -n "s/^state_$1_0*\([0-9][0-9]*\)$/\1/p" | sort -n | tail -1
}
latest_ckpt() {
  ls -d benchmarks/ckpts_rich/val_$1_* 2>/dev/null | sort | tail -1
}

train_to() {  # family target_step eval_every sec_per_step reserve
  local fam=$1 target=$2 ev=$3 sps=$4 reserve=$5 cur need fit budget resume
  for attempt in $(seq 1 20); do
    cur=$(latest_step "$fam"); cur=${cur:-0}
    if [ "$cur" -ge "$target" ]; then
      echo "=== $fam reached $cur >= $target" >> "$LOG"; return 0
    fi
    budget=$(( $(left) - reserve - 420 ))  # 420 s slack: warmup+compile+save
    fit=$(awk -v b="$budget" -v s="$sps" 'BEGIN{printf "%d", b/s}')
    if [ "$fit" -lt "$ev" ]; then
      echo "=== $fam stopping at $cur: only ${budget}s left for this stage" >> "$LOG"
      return 0
    fi
    need=$((target - cur)); [ "$need" -gt 4000 ] && need=4000
    [ "$need" -gt "$fit" ] && need=$(( (fit / ev) * ev ))
    resume=""
    [ "$cur" -gt 0 ] && resume="--resume_state benchmarks/states_rich"
    echo "=== $(date +%F_%T) $fam $cur -> $((cur + need)) (attempt $attempt, left $(left)s)" >> "$LOG"
    timeout $(( budget < 3600 ? budget : 3600 )) python benchmarks/train_validation.py \
      --family "$fam" --corpus rich --steps "$need" --eval_every "$ev" \
      $resume --save_state benchmarks/states_rich \
      --save_path benchmarks/ckpts_rich >> "$LOG" 2>&1
    echo "=== rc=$?" >> "$LOG"
    sleep 75  # let a killed process's relay hold clear
  done
  echo "=== GAVE UP on $fam at $(latest_step "$fam")" >> "$LOG"; return 1
}

run_probe() {  # name cap reserve_after cmd...
  local name=$1 cap=$2 reserve=$3; shift 3
  local budget=$(( $(left) - reserve ))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ "$budget" -lt 600 ]; then
    echo "$name SKIPPED (left $(left)s, reserve $reserve)" >> "$STATUS"; return 1
  fi
  echo "$name start $(date +%F_%T) budget ${budget}s" >> "$STATUS"
  timeout "$budget" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name rc=$? $(date +%F_%T)" >> "$STATUS"
  sleep 75
}

echo "timed queue start $(date +%F_%T), deadline in $(left)s" >> "$STATUS"

# ---- stage 1: Encodec -> 8000 (keep back enough for its own probes +
#      a first HiFi block + HiFi probes; encodec probes ~5000) ----
train_to encodec 8000 500 "$ENC_SPS" $(( HIFI_PROBE_RESERVE + 5000 ))

# ---- stage 2: Encodec probes (reserve stage-4 budget) ----
ENC=$(latest_ckpt encodec)
echo "ENC=$ENC" >> "$STATUS"
if [ -n "$ENC" ]; then
  run_probe lm_enc 4500 $(( HIFI_PROBE_RESERVE + 1600 )) \
    python benchmarks/lm_compression_probe.py \
    --codec_ckpt "$ENC" --corpus rich --lengths 1 5 30 60
  run_probe eval_enc 1500 "$HIFI_PROBE_RESERVE" \
    python benchmarks/train_validation.py --family encodec \
    --corpus rich --eval_ckpt "$ENC" --eval_nq 3
fi

# ---- stage 3: HiFi-Codec, as far as the clock allows ----
train_to hificodec 24000 1000 "$HIFI_SPS" "$HIFI_PROBE_RESERVE"

# ---- stage 4: HiFi probes on the newest checkpoint ----
HIFI=$(latest_ckpt hificodec)
echo "HIFI=$HIFI" >> "$STATUS"
if [ -n "$HIFI" ]; then
  run_probe lm_hifi 3600 1600 \
    python benchmarks/lm_compression_probe.py --family hificodec \
    --codec_ckpt "$HIFI" --corpus rich --lengths 1 5 30 60
  run_probe eval_hifi 1500 0 \
    python benchmarks/train_validation.py --family hificodec \
    --corpus rich --eval_ckpt "$HIFI" --int8_min_channels 128
fi

echo "TIMED QUEUE DONE $(date +%F_%T), left $(left)s" >> "$STATUS"
echo "=== TRAINING QUEUE DONE $(date +%F_%T)" >> "$LOG"
