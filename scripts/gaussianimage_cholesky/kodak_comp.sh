#!/bin/bash
# Two-stage compression sweep on Kodak (representation ckpt -> QAT -> codec
# eval) — counterpart of scripts/gaussianimage_cholesky/kodak_comp.sh.
set -e
data_path="${1:-./datasets/kodak}"
for num_points in 800 1000 3000 5000 7000 9000; do
  python -m gaussianimage_tpu.train -d "$data_path" --data_name kodak \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 --lr 1e-3
  python -m gaussianimage_tpu.train_quantize -d "$data_path" --data_name kodak \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 --lr 1e-3 \
    --model_path ./checkpoints/kodak/GaussianImage_Cholesky_50000_${num_points}
  python -m gaussianimage_tpu.test_quantize -d "$data_path" --data_name kodak \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 \
    --model_path ./checkpoints_quant/kodak/GaussianImage_Cholesky_50000_${num_points}
done
