#!/bin/bash
# Learnable-pruning-mask experiments — counterpart of kodak_wMask.sh.
set -e
data_path="${1:-./datasets/kodak}"
for num_points in 16000; do
  for reg in kl ada_kl l1; do
    python -m gaussianimage_tpu.train -d "$data_path" --data_name kodak \
      --model_name GaussianImage_Cholesky_wMask --num_points $num_points \
      --iterations 50000 --lr 1e-3 --reg_type $reg --target_sparsity 0.7 \
      --lambda_reg 0.005 --init_mask_logit 2.0 \
      --start_mask_training 10000 --stop_mask_training 40000 --save_imgs
  done
done
