#!/bin/bash
# 3DGS baseline sweep on DIV2K — counterpart of the reference's
# scripts/3d_gs/div2k.sh (num_points grid per image).
set -e
data_path="${1:-./datasets/DIV2K_valid_LRX2}"
for num_points in 5000 10000 15000 20000 25000 30000 50000 60000 70000; do
  python -m gaussianimage_tpu.train -d "$data_path" --data_name DIV2K_valid_LRX2 \
    --model_name 3DGS --num_points $num_points --iterations 50000 --save_imgs
done
