#!/bin/bash
# Two-stage compression sweep for GaussianImage-RS on DIV2K — counterpart of
# the reference's scripts/gaussianimage_rs/div2k_comp.sh.
set -e
data_path="${1:-./datasets/DIV2K_valid_LRX2}"
for num_points in 2000 4000 6000 8000 10000 12000 14000; do
  python -m gaussianimage_tpu.train_quantize -d "$data_path" --data_name DIV2K_valid_LRX2 \
    --model_name GaussianImage_RS --num_points $num_points --iterations 50000 \
    --model_path "./checkpoints/DIV2K_valid_LRX2/GaussianImage_RS_50000_${num_points}"
  python -m gaussianimage_tpu.test_quantize -d "$data_path" --data_name DIV2K_valid_LRX2 \
    --model_name GaussianImage_RS --num_points $num_points \
    --model_path "./checkpoints_quant/DIV2K_valid_LRX2/GaussianImage_RS_50000_${num_points}"
done
