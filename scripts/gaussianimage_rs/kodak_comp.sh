#!/bin/bash
# Two-stage compression sweep (QAT then codec eval) for GaussianImage-RS on
# Kodak — counterpart of the reference's scripts/gaussianimage_rs/kodak_comp.sh.
set -e
data_path="${1:-./datasets/kodak}"
for num_points in 800 1000 3000 5000 7000 9000; do
  python -m gaussianimage_tpu.train_quantize -d "$data_path" --data_name kodak \
    --model_name GaussianImage_RS --num_points $num_points --iterations 50000 \
    --model_path "./checkpoints/kodak/GaussianImage_RS_50000_${num_points}"
  python -m gaussianimage_tpu.test_quantize -d "$data_path" --data_name kodak \
    --model_name GaussianImage_RS --num_points $num_points \
    --model_path "./checkpoints_quant/kodak/GaussianImage_RS_50000_${num_points}"
done
