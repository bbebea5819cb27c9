"""Group-streamed VAE == whole-clip VAE (which is parity-tested against
the reference's own streaming), across group sizes and boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.config import VAEConfig
from flexam_tpu.models.vae import init_vae_params, vae_decode, vae_encode
from flexam_tpu.models.vae_stream import (vae_decode_streamed,
                                          vae_encode_streamed)

TINY = VAEConfig(latent_channels=8, c_dim=16, dec_dim=16, dim_mult=(1, 2, 4, 4),
                 num_res_blocks=1, temporal_downsample=(False, True, True))


@pytest.fixture(scope="module")
def params():
    return init_vae_params(jax.random.PRNGKey(0), TINY)


def test_decode_streamed_matches_whole_clip(params):
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 7, 2, 2),
                          jnp.float32) * 0.5
    ref = np.asarray(vae_decode(params, TINY, z))
    for g in (2, 3, 7):
        out = np.asarray(vae_decode_streamed(params, TINY, z, group_size=g))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"group_size={g}")


def test_encode_streamed_matches_whole_clip(params):
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 17, 32, 32),
                           jnp.float32, -1, 1)
    mu_ref, lv_ref = vae_encode(params, TINY, x)
    for g in (4, 8, 16):
        mu, lv = vae_encode_streamed(params, TINY, x, group_size=g)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"group_size={g}")
        np.testing.assert_allclose(np.asarray(lv), np.asarray(lv_ref),
                                   rtol=2e-4, atol=2e-4)


def test_decode_streamed_u8_matches_streamed(params):
    """The async-fetch uint8 path returns byte-identical pixels to
    uint8(vae_decode_streamed(...)), in [B, T, H, W, 3] layout."""
    from flexam_tpu.models.vae_stream import vae_decode_streamed_u8
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 7, 2, 2),
                          jnp.float32) * 0.5
    ref = np.asarray(vae_decode_streamed(params, TINY, z, group_size=3))
    ref_u8 = np.clip(np.round((np.clip(ref, -1, 1) + 1) * 127.5),
                     0, 255).astype(np.uint8)
    ref_u8 = ref_u8.transpose(0, 2, 3, 4, 1)          # [B, T, H, W, 3]
    got = vae_decode_streamed_u8(params, TINY, z, group_size=3)
    assert got.dtype == np.uint8 and got.shape == ref_u8.shape
    np.testing.assert_array_equal(got, ref_u8)
