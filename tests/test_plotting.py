"""P11 plot/summary tool tests: artifact-schema parsing, name decoding
(plain + wMask forms), filter/exclude, summary math, and an Agg plot smoke
(reference analog: plot_script.py parse_npy_logs/plot_comparison)."""

import numpy as np
import pytest

from gaussianimage_tpu.plotting import (collect_runs, parse_experiment_name,
                                        plot_comparison, summarize)


def _fake_run(root, exp, img, psnr, pts):
    d = root / exp / img
    d.mkdir(parents=True, exist_ok=True)
    np.save(d / "training.npy", {
        "iterations": [1000], "training_psnr": [psnr - 1.0],
        "training_time": 12.0, "psnr": psnr, "ms-ssim": 0.95,
        "rendering_time": 0.001, "rendering_fps": 1000.0,
        "final_points": pts})


def test_parse_experiment_name_forms():
    p = parse_experiment_name("GaussianImage_Cholesky_50000_10000")
    assert (p["model"], p["iterations"], p["num_points"]) == (
        "GaussianImage_Cholesky", 50000, 10000)
    m = parse_experiment_name(
        "maskGI_Ch_ada_kl_tgt0.6_lam0.001_init-1.0_50000_30000_ema")
    assert m["mask"] and m["reg_type"] == "ada_kl"
    assert (m["target"], m["lam"], m["init_logit"]) == (0.6, 0.001, -1.0)
    assert (m["iterations"], m["num_points"]) == (50000, 30000)
    assert m["flags"] == "_ema"


def test_collect_summarize_filters(tmp_path):
    _fake_run(tmp_path, "GaussianImage_Cholesky_50000_10000", "a", 40.0,
              10000)
    _fake_run(tmp_path, "GaussianImage_Cholesky_50000_10000", "b", 42.0,
              10000)
    _fake_run(tmp_path, "GaussianImage_RS_50000_10000", "a", 39.0, 10000)
    runs = collect_runs(str(tmp_path))
    assert len(runs) == 2
    assert len(runs["GaussianImage_Cholesky_50000_10000"]) == 2
    rows = summarize(runs)
    chol = next(r for r in rows if "Cholesky" in r[0])
    assert chol[1] == 2 and abs(chol[2] - 41.0) < 1e-6
    assert abs(chol[5] - 10000 * 8 / 1000) < 1e-6  # params(K) convention
    only_rs = collect_runs(str(tmp_path), filters=["RS"])
    assert list(only_rs) == ["GaussianImage_RS_50000_10000"]
    no_rs = collect_runs(str(tmp_path), excludes=["RS"])
    assert list(no_rs) == ["GaussianImage_Cholesky_50000_10000"]


def test_plot_comparison_smoke(tmp_path):
    pytest.importorskip("matplotlib")
    _fake_run(tmp_path, "GaussianImage_Cholesky_50000_10000", "a", 40.0,
              10000)
    runs = collect_runs(str(tmp_path))
    out = tmp_path / "plot.png"
    plot_comparison(runs, str(out))
    assert out.exists() and out.stat().st_size > 1000
