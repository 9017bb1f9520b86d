#!/bin/bash
# 3DGS baseline sweep on Kodak — counterpart of scripts/3d_gs/kodak.sh.
set -e
data_path="${1:-./datasets/kodak}"
for num_points in 5000 10000 30000 50000 70000; do
  python -m gaussianimage_tpu.train -d "$data_path" --data_name kodak \
    --model_name 3DGS --num_points $num_points \
    --iterations 50000 --lr 1e-3 --sh_degree 3 --save_imgs
done
