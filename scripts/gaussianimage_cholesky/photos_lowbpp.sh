#!/bin/bash
# Low-bitrate codec sweep on the committed real-photo dataset — the
# operating regime the reference's RD curves actually live in (reference
# scripts/gaussianimage_cholesky/kodak_comp.sh:11-16: 800/1000/3000/5000/
# 7000/9000 points, ~0.1-0.7 bpp at Kodak 768x512). Three stages per N:
# 50k-iter fit -> 50k-iter QAT -> entropy-coded eval. Artifacts land in
# ./results (fits) and ./results_quant (QAT + test.npy RD rows).
set -e
for num_points in 800 1000 3000 5000 7000 9000; do
  # idempotent per stage: a rerun after a crash skips finished fits/QATs
  fit_dir=./results/photos/GaussianImage_Cholesky_50000_${num_points}
  if [ ! -f "$fit_dir/china/gaussian_model.npz" ] || \
     [ ! -f "$fit_dir/flower/gaussian_model.npz" ]; then
  python -m gaussianimage_tpu.train -d ./data --data_name photos \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 --lr 1e-3 --save_imgs --checkpoint_root ./results
  fi
  qat_dir=./results_quant/photos/GaussianImage_Cholesky_50000_${num_points}
  if [ ! -f "$qat_dir/china/gaussian_model.best.npz" ] || \
     [ ! -f "$qat_dir/flower/gaussian_model.best.npz" ]; then
  python -m gaussianimage_tpu.train_quantize -d ./data --data_name photos \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 --lr 1e-3 \
    --model_path ./results/photos/GaussianImage_Cholesky_50000_${num_points} \
    --checkpoint_root ./results_quant
  fi
  python -m gaussianimage_tpu.test_quantize -d ./data --data_name photos \
    --model_name GaussianImage_Cholesky --num_points $num_points \
    --iterations 50000 \
    --model_path ./results_quant/photos/GaussianImage_Cholesky_50000_${num_points}
done
