#!/bin/bash
# Difficulty anchor (VERDICT r4 #8): fit the photos with the EXACT reference
# pipeline settings (uniform random init, no relocation/reseeding — what
# /root/reference/gaussianimage.py does) across the reference's Kodak sweep
# range (scripts/3d_gs/kodak.sh:11-16 uses 10k-70k), so the PSNR-vs-N curve
# under identical algorithmic conditions quantifies per-image difficulty:
# china's curve vs flower's curve vs the >=40 dB north star.
# Artifacts: ./results_anchor/photos/GaussianImage_Cholesky_50000_<N>/.
set -e
for num_points in 10000 20000 40000 70000; do
  python -m gaussianimage_tpu.train -d ./data --data_name photos \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 --lr 1e-3 --init_mode uniform --no_reseed \
    --checkpoint_root ./results_anchor
done
