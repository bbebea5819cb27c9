"""FLUX autoencoder (models/flux_vae.py): shapes, loader, invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from flexam_tpu.io.verify_load import check_mapping
from flexam_tpu.models.flux_vae import (
    FluxVAEConfig, flux_vae_decode, flux_vae_encode,
    flux_vae_params_from_state_dict, flux_vae_params_to_state_dict,
    init_flux_vae_params,
)

CFG = FluxVAEConfig.tiny()


def test_encode_decode_shapes():
    params = init_flux_vae_params(jax.random.PRNGKey(0), CFG)
    factor = 2 ** (len(CFG.ch_mult) - 1)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 16, 24, 3)), jnp.float32)
    z = flux_vae_encode(params, CFG, x)
    assert z.shape == (1, 16 // factor, 24 // factor, CFG.z_channels)
    y = flux_vae_decode(params, CFG, z)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_encode_deterministic_vs_sampled():
    params = init_flux_vae_params(jax.random.PRNGKey(1), CFG)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (1, 8, 8, 3)), jnp.float32)
    a = flux_vae_encode(params, CFG, x)
    b = flux_vae_encode(params, CFG, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s = flux_vae_encode(params, CFG, x, sample_key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(s) - np.asarray(a)).max() > 1e-6


def test_scale_shift_convention():
    """encode output is scale*(posterior - shift); decode inverts it."""
    params = init_flux_vae_params(jax.random.PRNGKey(3), CFG)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (1, 8, 8, 3)), jnp.float32)
    z = np.asarray(flux_vae_encode(params, CFG, x))
    raw = z / CFG.scale_factor + CFG.shift_factor
    cfg2 = FluxVAEConfig(ch=CFG.ch, ch_mult=CFG.ch_mult,
                         num_res_blocks=CFG.num_res_blocks,
                         z_channels=CFG.z_channels,
                         scale_factor=1.0, shift_factor=0.0)
    raw2 = np.asarray(flux_vae_encode(params, cfg2, x))
    np.testing.assert_allclose(raw, raw2, rtol=1e-5, atol=1e-6)
    # decode sees identical pre-conv input under either convention
    a = np.asarray(flux_vae_decode(params, CFG, jnp.asarray(z)))
    b = np.asarray(flux_vae_decode(params, cfg2, jnp.asarray(raw2)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_loader_round_trip_exact():
    params = init_flux_vae_params(jax.random.PRNGKey(4), CFG)
    sd = flux_vae_params_to_state_dict(params, CFG)
    # CompVis/BFL naming spot checks
    assert "encoder.down.0.block.0.norm1.weight" in sd
    assert "decoder.up.1.upsample.conv.weight" in sd
    assert "encoder.mid.attn_1.q.weight" in sd
    # torch layout: OIHW
    assert sd["encoder.conv_in.weight"].shape == (CFG.ch, 3, 3, 3)
    loaded, report = flux_vae_params_from_state_dict(sd, CFG)
    assert not report["missed"] and not report["unused"]
    assert check_mapping(report, "flux-vae-tiny", quiet=True)
    x = jnp.asarray(np.random.default_rng(3).uniform(
        -1, 1, (1, 8, 8, 3)), jnp.float32)
    a = flux_vae_decode(params, CFG, flux_vae_encode(params, CFG, x))
    b = flux_vae_decode(loaded, CFG, flux_vae_encode(loaded, CFG, x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_loader_flags_missing_level():
    params = init_flux_vae_params(jax.random.PRNGKey(5), CFG)
    sd = flux_vae_params_to_state_dict(params, CFG)
    for k in [k for k in sd if k.startswith("decoder.up.1.block")]:
        del sd[k]
    _, report = flux_vae_params_from_state_dict(sd, CFG)
    assert report["missed"]
    assert not check_mapping(report, "flux-vae-partial", quiet=True)


def test_full_geometry_param_count():
    """The real FLUX ae has ~83.8M params — the geometry sanity check
    that catches wrong ch_mult / res-block wiring."""
    cfg = FluxVAEConfig()
    params = init_flux_vae_params(jax.random.PRNGKey(6), cfg)
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(params))
    assert 80e6 < n < 90e6, n
