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


def test_decode_streamed_yuv420_matches_spec(params):
    """Device YUV 4:2:0 fetch == a numpy reference of the same BT.601
    full-range + 2x2 chroma-average spec applied to the float streamed
    decode (±1 from independent rounding); luma stays near-exact vs the
    uint8 path. (RGB-vs-RGB distance is content-dependent — random-weight
    decoder output is chroma noise — so parity is against the spec.)"""
    from flexam_tpu.models.vae_stream import (vae_decode_streamed,
                                              vae_decode_streamed_u8,
                                              vae_decode_streamed_yuv420,
                                              yuv420_to_rgb)
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 5, 2, 2),
                          jnp.float32) * 0.5
    luma, uv = vae_decode_streamed_yuv420(params, TINY, z, group_size=2)
    exact = vae_decode_streamed_u8(params, TINY, z, group_size=2)
    b, t, h, w, _ = exact.shape
    assert luma.shape == (b, t, h, w) and luma.dtype == np.uint8
    assert uv.shape == (b, t, 2, h // 2, w // 2) and uv.dtype == np.uint8
    rgb = yuv420_to_rgb(luma, uv)
    assert rgb.shape == exact.shape and rgb.dtype == np.uint8

    ref = np.asarray(vae_decode_streamed(params, TINY, z, group_size=2))
    rf = (np.clip(ref.transpose(0, 2, 3, 4, 1), -1, 1) + 1.0) * 127.5
    r, g, bl = rf[..., 0], rf[..., 1], rf[..., 2]
    # limited-range (studio-swing) BT.601 — the yuv420p video convention
    y_ref = 16.0 + 0.256788 * r + 0.504129 * g + 0.097906 * bl
    u_ref = 128.0 - 0.148223 * r - 0.290993 * g + 0.439216 * bl
    v_ref = 128.0 + 0.439216 * r - 0.367788 * g - 0.071427 * bl
    uv_ref = np.stack([u_ref, v_ref], 2).reshape(
        b, t, 2, h // 2, 2, w // 2, 2).mean(axis=(4, 6))
    assert np.abs(luma.astype(np.float32) - y_ref).max() <= 1.0
    assert np.abs(uv.astype(np.float32) - uv_ref).max() <= 1.0
    # luma also near-exact vs the uint8 RGB path
    ef = exact.astype(np.float32)
    y_u8 = (16.0 + 0.256788 * ef[..., 0] + 0.504129 * ef[..., 1]
            + 0.097906 * ef[..., 2])
    assert np.abs(luma.astype(np.float32) - y_u8).max() <= 1.5
