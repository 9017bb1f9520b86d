#!/bin/bash
# GaussianImage-RS representation sweep on DIV2K — counterpart of the
# reference's scripts/gaussianimage_rs/div2k.sh.
set -e
data_path="${1:-./datasets/DIV2K_valid_LRX2}"
for num_points in 2000 4000 6000 8000 10000 12000 14000; do
  python -m gaussianimage_tpu.train -d "$data_path" --data_name DIV2K_valid_LRX2 \
    --model_name GaussianImage_RS --num_points $num_points --iterations 50000 --save_imgs
done
