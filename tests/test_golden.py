"""Golden-output regression: the tiny pipeline's seeded latents are pinned
to a committed fixture, so any silent numerical drift in future rounds
fails fast (the reference-oracle tests verify parity; this verifies
reproducibility of OUR stack end to end)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_latents.npz")


def _run():
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.t5 import init_t5_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels

    cfg = tiny_test_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(42), 3)
    pipe = FlexAMGenerationPipeline(FlexAMModels(
        cfg=cfg, dit_params=init_dit_params(k1, cfg.dit, dtype=jnp.float32),
        vae_params=init_vae_params(k2, cfg.vae),
        t5_params=init_t5_params(k3, cfg.t5)), compute_dtype=jnp.float32)
    rng = np.random.RandomState(7)
    t, h, w = 9, 32, 32
    video = rng.rand(1, 3, t, h, w).astype(np.float32)
    mask = np.ones((1, 1, t, h, w), np.float32)
    mask[:, :, 0] = 0.0
    cond = pipe.prepare_conditioning(
        video, mask, rng.rand(1, 3, t, h, w).astype(np.float32),
        rng.rand(1, 3, t, h, w).astype(np.float32),
        [rng.rand(1, 3, t, h, w).astype(np.float32) for _ in range(4)],
        rng.rand(1, 3, 1, h, w).astype(np.float32))
    ids = np.arange(16, dtype=np.int32)[None] % 64
    ctx = pipe.encode_prompt_ids(ids, np.ones((1, 16), np.int32))
    context = jnp.concatenate([ctx, ctx], axis=0)
    lat = pipe.denoise(cond, context, num_inference_steps=4,
                       guidance_scale=6.0, seed=123, density=0.1)
    return np.asarray(lat)


def test_golden_latents():
    lat = _run()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, latents=lat)
        pytest.skip("golden fixture created; rerun to compare")
    ref = np.load(GOLDEN)["latents"]
    np.testing.assert_allclose(lat, ref, rtol=1e-4, atol=1e-4)
