#!/bin/bash
# wMask smoke run on the 2-image "test" set — counterpart of the reference's
# scripts/gaussianimage_cholesky/test_wMask.sh.
set -e
data_path="${1:-./datasets/test}"
for num_points in 1000; do
  python -m gaussianimage_tpu.train -d "$data_path" --data_name test \
    --model_name GaussianImage_Cholesky_wMask --num_points $num_points \
    --iterations 50000 --save_imgs \
    --reg_type ada_kl --target_sparsity 0.7 --lambda_reg 0.005 \
    --start_mask_training 10000 --stop_mask_training 40000
done
