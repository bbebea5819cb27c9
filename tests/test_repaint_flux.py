"""FLUX depth-repaint backend e2e (tiny geometry, random weights):
the full Control-pipeline flow — depth -> control latents -> embedded-
guidance rectified flow -> decode — behind the FirstFrameRepainter
surface the demo uses (`pipelines.py:137-173` parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flexam_tpu.repaint import FirstFrameRepainter
from flexam_tpu.repaint_flux import (FluxDepthRepainter, load_flux_repainter,
                                     make_tiny_repainter)


@pytest.fixture(scope="module")
def repainter():
    return make_tiny_repainter(seed=0)


def test_repaint_e2e_tiny(repainter, tmp_path):
    depth = np.linspace(0, 1, 16 * 24).reshape(16, 24).astype(np.float32)
    rp = FirstFrameRepainter(16, 24, str(tmp_path),
                             depth_fn=lambda img: depth,
                             repaint_fn=repainter.as_repaint_fn(seed=1))
    out = rp.repaint(np.random.default_rng(0).uniform(
        0, 1, (3, 16, 24)).astype(np.float32), "a red house",
        depth_path=None, num_inference_steps=4)
    # FirstFrameRepainter contract: [1, 3, 1, H, W] float in [0, 1]
    assert out.shape == (1, 3, 1, 16, 24)
    assert np.isfinite(out).all()
    assert (tmp_path / "temp_repainted.png").exists()

    # depth arrives via estimate_depth injection in the demo; here the
    # repaint_fn got the raw [H, W] map (depth_fn path exercised above
    # through repaint()'s estimate step only when depth_fn is set)


def test_bf16_production_dtype():
    """The deployment dtype: bf16 storage, fp32 Euler update (a bf16
    scan-carry dtype mismatch escaped the fp32-only tests once)."""
    import jax.numpy as jnp

    rp = make_tiny_repainter(seed=0, dtype=jnp.bfloat16)
    depth = np.random.default_rng(7).uniform(0, 1, (16, 16))
    out = rp("x", depth, 16, 16, num_inference_steps=2, seed=0)
    assert out.shape == (16, 16, 3) and np.isfinite(out).all()


def test_determinism_and_seed_sensitivity(repainter):
    depth = np.random.default_rng(1).uniform(0, 1, (16, 16))
    a = repainter("prompt", depth, 16, 16, num_inference_steps=2, seed=3)
    b = repainter("prompt", depth, 16, 16, num_inference_steps=2, seed=3)
    c = repainter("prompt", depth, 16, 16, num_inference_steps=2, seed=4)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a.astype(int) - c.astype(int)).max() > 0


def test_control_conditioning_matters(repainter):
    """Different depth maps must change the output (the control tokens
    actually reach the transformer)."""
    d1 = np.zeros((16, 16), np.float32)
    d2 = np.random.default_rng(2).uniform(0, 1, (16, 16))
    a = repainter("x", d1, 16, 16, num_inference_steps=2, seed=0)
    b = repainter("x", d2, 16, 16, num_inference_steps=2, seed=0)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_guidance_embedding_matters(repainter):
    depth = np.random.default_rng(3).uniform(0, 1, (16, 16))
    a = repainter("x", depth, 16, 16, num_inference_steps=2, seed=0,
                  guidance_scale=1.0)
    b = repainter("x", depth, 16, 16, num_inference_steps=2, seed=0,
                  guidance_scale=9.0)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_size_snapping(repainter):
    """Sizes snap down to the VAE-factor x patch grid (4 at tiny
    geometry: VAE 2x spatial, 2x2 packing)."""
    depth = np.random.default_rng(4).uniform(0, 1, (19, 23))
    out = repainter("x", depth, 19, 23, num_inference_steps=1, seed=0)
    assert out.shape == (16, 20, 3)


def test_loader_requires_files(monkeypatch):
    monkeypatch.delenv("FLEXAM_FLUX_CKPT", raising=False)
    monkeypatch.delenv("FLEXAM_FLUX_AE", raising=False)
    with pytest.raises(FileNotFoundError):
        load_flux_repainter()


def test_loader_coverage_gates(tmp_path, monkeypatch):
    """A wrong-content transformer file refuses loudly (verify_load)."""
    from safetensors.numpy import save_file

    bad = {"not_a_flux_key": np.zeros((4, 4), np.float32)}
    f1 = str(tmp_path / "flux1-depth-dev.safetensors")
    f2 = str(tmp_path / "ae.safetensors")
    save_file(bad, f1)
    save_file(bad, f2)
    with pytest.raises(ValueError, match="coverage"):
        load_flux_repainter(ckpt=f1, ae=f2)
