#!/bin/bash
# Representation sweep on the committed real-photo proxy dataset (data/,
# china+flower at 768x512 — the Kodak stand-in for the zero-egress
# environment; see README "real-image results"). Grid matches the numbers
# reported in README/results: 10k/20k/40k points, 50k iterations.
# --init_mode adaptive (the default) is the content-adaptive init
# (core/init.py); pass uniform to reproduce the reference's init exactly.
set -e
init_mode="${1:-adaptive}"
for num_points in 10000 20000 40000; do
  python -m gaussianimage_tpu.train -d ./data --data_name photos \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 --lr 1e-3 --init_mode "$init_mode" --save_imgs
done
