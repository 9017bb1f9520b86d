#!/bin/bash
# Round-5 TPU work queue: waits for the axon pool to grant, then runs every
# TPU job serially (the pool serves ONE client; concurrent clients starve
# each other — observed this round). Logs per step under /tmp/queue/.
mkdir -p /tmp/queue
cd /root/repo

probe() {
  timeout 90 python -c "import jax; jax.devices(); print('POOL OK')" \
    2>/dev/null | grep -q "POOL OK"
}

echo "$(date +%T) waiting for pool" >> /tmp/queue/queue.log
until probe; do
  echo "$(date +%T) pool still down" >> /tmp/queue/queue.log
  sleep 60
done
echo "$(date +%T) pool up, starting queue" >> /tmp/queue/queue.log

run() {
  name=$1; shift
  local rc
  echo "$(date +%T) START $name" >> /tmp/queue/queue.log
  timeout "$QT" "$@" > /tmp/queue/$name.log 2>&1
  rc=$?   # capture BEFORE the $(date) substitution below clobbers $?
  echo "$(date +%T) DONE $name rc=$rc" >> /tmp/queue/queue.log
}

QT=1200 run gate python scripts/tpu_compile_check.py
QT=1800 run numcheck python scripts/tpu_numcheck.py
QT=1800 run bench python bench.py
QT=3600 run fps_vs_n python scripts/fps_vs_n.py
QT=2400 run ab_batched python scripts/ab_batched_regime.py
QT=7200 run lowbpp bash scripts/gaussianimage_cholesky/photos_lowbpp.sh
QT=5400 run anchor bash scripts/gaussianimage_cholesky/photos_anchor.sh
QT=2400 run profile python scripts/profile_breakdown.py r05
echo "$(date +%T) QUEUE COMPLETE" >> /tmp/queue/queue.log
