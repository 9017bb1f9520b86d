#!/bin/bash
# Two-stage compression sweep on the committed real-photo dataset: the
# 50k representation fits under results/photos feed 50k QAT, then the
# entropy-coded codec eval — counterpart of kodak_comp.sh, writing the
# committed results_quant artifacts the README RD rows and bench.py's
# decode probe chain from.
set -e
fit_root="${1:-./results}"
for num_points in 10000 20000 40000; do
  python -m gaussianimage_tpu.train_quantize -d ./data --data_name photos \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 --lr 1e-3 \
    --model_path "$fit_root"/photos/GaussianImage_Cholesky_50000_${num_points} \
    --checkpoint_root ./results_quant
  python -m gaussianimage_tpu.test_quantize -d ./data --data_name photos \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 \
    --model_path ./results_quant/photos/GaussianImage_Cholesky_50000_${num_points}
done
