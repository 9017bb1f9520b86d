#!/bin/bash
# Round-5 third pass: validate the serving config's raised flat-stream
# ceiling at the sweep's large-N points (gate entry render_serving_70k +
# the serving columns in fps_vs_n), after r5b's lowbpp sweep finishes.
mkdir -p /tmp/queue
cd /root/repo

probe() {
  timeout 90 python -c "import jax; jax.devices(); print('POOL OK')" \
    2>/dev/null | grep -q "POOL OK"
}

echo "$(date +%T) [r5c] waiting for pool" >> /tmp/queue/queue.log
until probe; do
  echo "$(date +%T) [r5c] pool still down" >> /tmp/queue/queue.log
  sleep 60
done
echo "$(date +%T) [r5c] pool up, starting" >> /tmp/queue/queue.log

run() {
  name=$1; shift
  local rc
  echo "$(date +%T) [r5c] START $name" >> /tmp/queue/queue.log
  timeout "$QT" "$@" > /tmp/queue/$name.log 2>&1
  rc=$?
  echo "$(date +%T) [r5c] DONE $name rc=$rc" >> /tmp/queue/queue.log
}

QT=1800 run gate3 python scripts/tpu_compile_check.py serving
QT=1800 run numcheck3 python scripts/tpu_numcheck.py
QT=3600 run fps_vs_n3 python scripts/fps_vs_n.py
echo "$(date +%T) [r5c] QUEUE COMPLETE" >> /tmp/queue/queue.log
