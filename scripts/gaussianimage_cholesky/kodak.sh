#!/bin/bash
# Representation sweep on Kodak — counterpart of the reference's
# scripts/gaussianimage_cholesky/kodak.sh (num_points grid per image).
# No CUDA_VISIBLE_DEVICES pinning: device selection is JAX's.
set -e
data_path="${1:-./datasets/kodak}"
for num_points in 12000 16000; do
  python -m gaussianimage_tpu.train -d "$data_path" --data_name kodak \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 --lr 1e-3 --save_imgs
done
