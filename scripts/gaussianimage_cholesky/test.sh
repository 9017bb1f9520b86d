#!/bin/bash
# Smoke run on the 2-image "test" set — counterpart of the reference's
# scripts/gaussianimage_cholesky/test.sh (its manual sanity loop; wandb
# logging there corresponds to our train.txt/training.npy artifacts and
# the optional --profile trace).
set -e
data_path="${1:-./datasets/test}"
for num_points in 1000; do
  python -m gaussianimage_tpu.train -d "$data_path" --data_name test \
    --num_points $num_points --iterations 50000 --save_imgs
done
