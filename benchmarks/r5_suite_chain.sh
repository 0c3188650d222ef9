#!/bin/bash
# Round-5 suite chain: wait for the dryrun cache pre-warm to release the
# core, then run the full pytest suite at HEAD and record the result.
# (pytest-timeout is NOT installed — do not pass --timeout=.)
set -u
cd /root/repo

for i in $(seq 1 600); do
  if ! kill -0 "$(cat /tmp/dryrun_prewarm.pid 2>/dev/null)" 2>/dev/null; then
    break
  fi
  sleep 60
done

SHA=$(git rev-parse --short HEAD)
START=$(date +%s)
python -m pytest tests/ -q > /tmp/r5_suite.log 2>&1
RC=$?
END=$(date +%s)
{
  echo "suite at $SHA: rc=$RC wall=$((END - START))s $(date +%F_%T)"
  tail -3 /tmp/r5_suite.log
} > /tmp/r5_suite_result.log
