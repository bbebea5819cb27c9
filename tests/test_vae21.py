"""Parity: Wan2.1 VAE (8x/16ch) vs the actual reference `wan_vae.py`
module in chunked-streaming mode."""

import numpy as np
import pytest
import torch

from flexam_tpu.models.vae21 import (VAE21Config, vae21_decode, vae21_encode,
                                     vae21_params_from_state_dict)
from tests.reference_oracle import load_reference_module

TINY = VAE21Config(latent_channels=4, dim=8, dim_mult=(1, 2, 4, 4),
                   num_res_blocks=1, temporal_downsample=(False, True, True))


@pytest.fixture(scope="module")
def ref_vae():
    mod = load_reference_module("FlexAM/models/wan_vae.py", "ref_wan_vae")
    torch.manual_seed(0)
    model = mod.AutoencoderKLWan_(
        dim=TINY.dim, z_dim=TINY.latent_channels,
        dim_mult=list(TINY.dim_mult), num_res_blocks=TINY.num_res_blocks,
        attn_scales=[], temperal_downsample=list(TINY.temporal_downsample),
        dropout=0.0).eval()
    for name, p in model.named_parameters():
        if "proj" in name:
            torch.nn.init.normal_(p, std=0.2)
    return model


@pytest.fixture(scope="module")
def jax_params(ref_vae):
    sd = {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()}
    return vae21_params_from_state_dict(sd, TINY)


def _scale(z):
    return [torch.zeros(z), torch.ones(z)]


def test_encode21_parity(ref_vae, jax_params):
    torch.manual_seed(1)
    x = torch.randn(1, 3, 9, 24, 24, dtype=torch.float32)
    with torch.no_grad():
        ref_out = ref_vae.encode(x, _scale(TINY.latent_channels)).numpy()
    mu, logvar = vae21_encode(jax_params, TINY, np.asarray(x.numpy()))
    assert np.asarray(mu).shape == (1, 4, 3, 3, 3)   # 24/8 = 3
    np.testing.assert_allclose(np.asarray(mu), ref_out[:, :4],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), ref_out[:, 4:],
                               rtol=2e-4, atol=2e-4)


def test_decode21_parity(ref_vae, jax_params):
    torch.manual_seed(2)
    z = torch.randn(1, 4, 3, 3, 3, dtype=torch.float32) * 0.5
    with torch.no_grad():
        ref_dec = ref_vae.decode(z, _scale(TINY.latent_channels)).numpy()
    dec = np.asarray(vae21_decode(jax_params, TINY, np.asarray(z.numpy())))
    assert dec.shape == (1, 3, 9, 24, 24)
    np.testing.assert_allclose(dec, np.clip(ref_dec, -1, 1),
                               rtol=1e-3, atol=1e-4)
