#!/bin/bash
# Round-5 fixup queue: reruns the steps that failed or were superseded in
# the first pass (numcheck rewritten around on-TPU oracles; fps_vs_n fixed
# a donated-buffer crash; lowbpp fixed its fit/QAT checkpoint-root split).
# Serial like tpu_queue_r5.sh — the axon pool serves ONE client.
mkdir -p /tmp/queue
cd /root/repo

probe() {
  timeout 90 python -c "import jax; jax.devices(); print('POOL OK')" \
    2>/dev/null | grep -q "POOL OK"
}

echo "$(date +%T) [r5b] waiting for pool" >> /tmp/queue/queue.log
until probe; do
  echo "$(date +%T) [r5b] pool still down" >> /tmp/queue/queue.log
  sleep 60
done
echo "$(date +%T) [r5b] pool up, starting" >> /tmp/queue/queue.log

run() {
  name=$1; shift
  local start_ts rc
  start_ts=$(date +%T)
  echo "$start_ts [r5b] START $name" >> /tmp/queue/queue.log
  timeout "$QT" "$@" > /tmp/queue/$name.log 2>&1
  rc=$?   # capture BEFORE any command substitution clobbers $?
  echo "$(date +%T) [r5b] DONE $name rc=$rc" >> /tmp/queue/queue.log
}

QT=1200 run gate2 python scripts/tpu_compile_check.py
QT=1800 run numcheck2 python scripts/tpu_numcheck.py
QT=1800 run bench2 python bench.py
QT=3600 run fps_vs_n2 python scripts/fps_vs_n.py
QT=9000 run lowbpp2 bash scripts/gaussianimage_cholesky/photos_lowbpp.sh
echo "$(date +%T) [r5b] QUEUE COMPLETE" >> /tmp/queue/queue.log
