#!/bin/bash
# Round-5 fourth pass: regenerate every codec-eval artifact with the
# serving-config decode probe (uniform FPS methodology across the RD
# table — the earlier rows measured the default config, which drops to
# the aligned stream layout above 12.8k points), then rebuild the table.
mkdir -p /tmp/queue
cd /root/repo

probe() {
  timeout 90 python -c "import jax; jax.devices(); print('POOL OK')" \
    2>/dev/null | grep -q "POOL OK"
}

echo "$(date +%T) [r5d] waiting for pool" >> /tmp/queue/queue.log
until probe; do
  echo "$(date +%T) [r5d] pool still down" >> /tmp/queue/queue.log
  sleep 60
done
echo "$(date +%T) [r5d] pool up, starting" >> /tmp/queue/queue.log

run() {
  name=$1; shift
  local rc
  echo "$(date +%T) [r5d] START $name" >> /tmp/queue/queue.log
  timeout "$QT" "$@" > /tmp/queue/$name.log 2>&1
  rc=$?
  echo "$(date +%T) [r5d] DONE $name rc=$rc" >> /tmp/queue/queue.log
}

for n in 800 1000 3000 5000 7000 9000 10000 20000 40000; do
  QT=900 run eval_$n python -m gaussianimage_tpu.test_quantize \
    -d ./data --data_name photos --model_name GaussianImage_Cholesky \
    --num_points $n --iterations 50000 \
    --model_path ./results_quant/photos/GaussianImage_Cholesky_50000_$n
done
QT=120 run rd_table python scripts/make_rd_table.py
echo "$(date +%T) [r5d] QUEUE COMPLETE" >> /tmp/queue/queue.log
