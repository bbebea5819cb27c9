"""Parity tests: flexam_tpu whole-clip causal VAE vs the ACTUAL reference
`wan_vae3_8.py` module run in its chunked-streaming mode.

The critical claim under test is the streaming->whole-clip equivalence
derived in `flexam_tpu/models/vae.py`'s docstring: the reference encodes in
[1,4,4,...]-frame chunks and decodes one latent frame at a time with
per-conv feature caches; ours runs each op once over the full clip.
"""

import numpy as np
import pytest
import torch

from flexam_tpu.config import VAEConfig
from flexam_tpu.io.checkpoints import vae_params_from_state_dict
from flexam_tpu.models import vae as jvae
from tests.reference_oracle import load_reference_module

TINY = VAEConfig(
    latent_channels=8, c_dim=16, dec_dim=16, dim_mult=(1, 2, 4, 4),
    num_res_blocks=1, temporal_downsample=(False, True, True),
)


@pytest.fixture(scope="module")
def ref_vae():
    mod = load_reference_module("FlexAM/models/wan_vae3_8.py", "ref_wan_vae3_8")
    torch.manual_seed(0)
    model = mod.AutoencoderKLWan2_2_(
        dim=TINY.c_dim, dec_dim=TINY.dec_dim, z_dim=TINY.latent_channels,
        dim_mult=list(TINY.dim_mult), num_res_blocks=TINY.num_res_blocks,
        attn_scales=[], temperal_downsample=list(TINY.temporal_downsample),
        dropout=0.0,
    ).eval()
    # randomize the zero-init attention proj so attention actually
    # contributes to the parity check
    for name, p in model.named_parameters():
        if "proj" in name:
            torch.nn.init.normal_(p, std=0.2)
    return model


@pytest.fixture(scope="module")
def jax_params(ref_vae):
    sd = {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()}
    return vae_params_from_state_dict(sd, TINY)


def _scale(z):
    return [torch.zeros(z), torch.ones(z)]


def test_encode_parity(ref_vae, jax_params):
    torch.manual_seed(1)
    x = torch.randn(1, 3, 9, 32, 32, dtype=torch.float32)
    with torch.no_grad():
        ref_out = ref_vae.encode(x, _scale(TINY.latent_channels)).numpy()
    ref_mu = ref_out[:, :TINY.latent_channels]
    ref_logvar = ref_out[:, TINY.latent_channels:]

    mu, logvar = jvae.vae_encode(jax_params, TINY, np.asarray(x.numpy()))
    mu, logvar = np.asarray(mu), np.asarray(logvar)
    assert mu.shape == (1, 8, 3, 2, 2)   # T: 1+(9-1)/4=3, HW: 32/16=2
    np.testing.assert_allclose(mu, ref_mu, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(logvar, ref_logvar, rtol=2e-4, atol=2e-4)


def test_decode_parity(ref_vae, jax_params):
    torch.manual_seed(2)
    z = torch.randn(1, TINY.latent_channels, 3, 2, 2, dtype=torch.float32) * 0.5
    with torch.no_grad():
        ref_dec = ref_vae.decode(z, _scale(TINY.latent_channels)).numpy()
    dec = np.asarray(jvae.vae_decode(jax_params, TINY, np.asarray(z.numpy())))
    assert dec.shape == (1, 3, 9, 32, 32)
    np.testing.assert_allclose(
        np.clip(ref_dec, -1, 1), dec, rtol=1e-3, atol=1e-4)


def test_roundtrip_shapes_multi_chunk(ref_vae, jax_params):
    """17 frames = 1+4*4 -> 5 latent frames -> back to 17."""
    x = np.random.RandomState(3).randn(1, 3, 17, 32, 32).astype(np.float32)
    mu, _ = jvae.vae_encode(jax_params, TINY, x)
    assert mu.shape == (1, 8, 5, 2, 2)
    dec = jvae.vae_decode(jax_params, TINY, np.asarray(mu))
    assert dec.shape == (1, 3, 17, 32, 32)


def test_latent_stats_applied():
    mean, inv_std = jvae.latent_stats(48)
    assert mean.shape == (48,) and inv_std.shape == (48,)
    assert abs(mean[0] - (-0.2289)) < 1e-6
    assert abs(inv_std[0] - 1.0 / 0.4765) < 1e-6
