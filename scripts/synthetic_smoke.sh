#!/bin/bash
# Environment smoke run — fits the built-in synthetic dataset (no image files
# needed), the analog of the reference's private 2-image "test" dataset runs.
set -e
python -m gaussianimage_tpu.train --data_name synthetic \
  --model_name "${1:-GaussianImage_Cholesky}" --num_points 4000 \
  --iterations 3000 --chunk_size 250 --save_imgs
