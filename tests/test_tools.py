"""tools/: the PSNR comparison gate and the track CLI."""

import subprocess
import sys

import numpy as np
import pytest


def test_psnr_math():
    from flexam_tpu.tools.compare_latents import psnr
    a = np.random.RandomState(0).randn(4, 8, 8)
    assert psnr(a, a) == float("inf")
    noisy = a + np.random.RandomState(1).randn(*a.shape) * 1e-3
    p = psnr(a, noisy)
    assert 50 < p < 100                   # ~1e-3 noise on unit-scale data
    worse = psnr(a, a + 0.1)
    assert worse < p


def test_compare_latents_cli(tmp_path):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 4).astype(np.float32)
    np.savez(tmp_path / "a.npz", latents=x)
    np.savez(tmp_path / "b.npz", latents=x + 1e-4)
    out = subprocess.run(
        [sys.executable, "-m", "flexam_tpu.tools.compare_latents",
         str(tmp_path / "a.npz"), str(tmp_path / "b.npz")],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "latents" in out.stdout and "dB" in out.stdout


def test_track_cli(tmp_path):
    pytest.importorskip("cv2")
    from flexam_tpu.utils.media import save_video
    rng = np.random.RandomState(3)
    vid = rng.rand(1, 3, 8, 48, 64).astype(np.float32)
    save_video(vid, str(tmp_path / "in.mp4"), fps=8)
    from flexam_tpu.tools.track import main
    main(["--input", str(tmp_path / "in.mp4"),
          "--output", str(tmp_path / "t.npz"),
          "--video_length", "8", "--sample_size", "48", "64",
          "--density", "8", "--method", "flow", "--solve_poses"])
    d = np.load(tmp_path / "t.npz")
    assert d["tracks"].shape[0] == 8 and d["tracks"].shape[2] == 3
    assert d["extrinsics"].shape == (8, 3, 4)
    assert d["intrinsics"].shape == (8, 3, 3)
