"""Build the committed RD table (results_quant/RD_TABLE.md) from the codec
eval artifacts: every checkpoints_quant/photos/<model>_<iters>_<N>/<img>/
test.npy row (entropy-coded PSNR / MS-SSIM / bpp / decode FPS), sorted by
bpp — the rate-distortion evidence spanning the reference's low-bitrate
operating regime (kodak_comp.sh grid, 800-9000 pts) through the committed
10k-40k fits.

Run after scripts/gaussianimage_cholesky/photos_lowbpp.sh.
"""

import sys
from pathlib import Path

import numpy as np


def main(root="checkpoints_quant/photos", out="results_quant/RD_TABLE.md"):
    rows = []
    for p in sorted(Path(root).glob("*/*/test.npy")):
        d = np.load(p, allow_pickle=True).item()
        run = p.parent.parent.name          # GaussianImage_Cholesky_50000_N
        img = p.parent.name
        parts = run.rsplit("_", 2)
        n_points = int(parts[-1])
        rows.append({
            "img": img, "N": n_points,
            "psnr": float(d["psnr"]), "msssim": float(d["ms-ssim"]),
            # real entropy-coded rate when the eval wired it (bpp_ec);
            # unit-bits estimate otherwise
            "bpp": float(d.get("bpp_ec", d["bpp"])),
            "pos_bpp": float(d.get("position_bpp", np.nan)),
            "chol_bpp": float(d.get("cholesky_bpp", np.nan)),
            "col_bpp": float(d.get("feature_dc_bpp", np.nan)),
            "fps": float(d.get("rendering_fps", np.nan)),
            "fps_ec": float(d.get("rendering_fps_ec", np.nan)),
        })
    if not rows:
        print("no test.npy artifacts found under", root)
        return 1
    rows.sort(key=lambda r: (r["img"], r["bpp"]))
    lines = [
        "# Rate-distortion table — entropy-coded two-stage codec",
        "",
        "Canonical two-stage pipeline (50k-iter fit -> 50k-iter QAT -> rANS",
        "entropy-coded eval, `test_quantize.py`) on the committed real",
        "photos at the reference's codec sweep points (reference",
        "`scripts/gaussianimage_cholesky/kodak_comp.sh:11-16`: 800-9000",
        "points, ~0.1-0.7 bpp) plus the 10k-40k representation grid.",
        "Decode FPS is the 100-frame dequantize+project+rasterize probe;",
        "`fps_ec` includes real rANS entropy decode on the host.",
        "",
        "| image | points | bpp | PSNR (dB) | MS-SSIM | pos/chol/col bpp "
        "| decode FPS | decode FPS (EC) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            "| {img} | {N} | {bpp:.4f} | {psnr:.2f} | {msssim:.4f} "
            "| {pos_bpp:.2f}/{chol_bpp:.2f}/{col_bpp:.2f} | {fps:.0f} "
            "| {fps_ec:.0f} |".format(**r))
    Path(out).write_text("\n".join(lines) + "\n")
    print(f"{len(rows)} rows -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
