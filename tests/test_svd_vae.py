"""SVD temporal decoder (models/svd_vae.py): shapes, loader, temporal
mixing, DepthCrafter decode_fn integration."""

import numpy as np
import jax
import jax.numpy as jnp

from flexam_tpu.io.verify_load import check_mapping
from flexam_tpu.models.flux_vae import FluxVAEConfig
from flexam_tpu.models.svd_vae import (
    TemporalDecoderConfig, init_temporal_decoder_params,
    make_temporal_decode_fn, svd_vae_encode,
    svd_vae_params_from_state_dict, temporal_decode)
from flexam_tpu.models.svd_unet import svd_unet_params_to_state_dict  # noqa

CFG = TemporalDecoderConfig.tiny()
ENC_CFG = FluxVAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4, scale_factor=0.18215,
                        shift_factor=0.0)


def test_decode_shapes_and_temporal_mixing():
    params = init_temporal_decoder_params(jax.random.PRNGKey(0), CFG)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 8, 8, 4)), jnp.float32)
    out = temporal_decode(params, CFG, z)
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # frame 0's latents influence frame 2's pixels (temporal resnets +
    # the final 3-tap RGB conv)
    z2 = np.asarray(z).copy()
    z2[0] += 1.0
    out2 = temporal_decode(params, CFG, jnp.asarray(z2))
    assert np.abs(np.asarray(out[2]) - np.asarray(out2[2])).max() > 1e-6


def test_loader_round_trip_and_gating():
    from flexam_tpu.models.svd_unet import _flatten

    dec = init_temporal_decoder_params(jax.random.PRNGKey(1), CFG)
    # synthesize a published-layout combined state dict: encoder via the
    # image-VAE inverse map, decoder via generic flatten
    from flexam_tpu.models.flux_vae import (flux_vae_params_to_state_dict,
                                            init_flux_vae_params)
    full_img = init_flux_vae_params(jax.random.PRNGKey(2), ENC_CFG)
    sd = {k: v for k, v in flux_vae_params_to_state_dict(
        full_img, ENC_CFG).items() if k.startswith("encoder.")}
    for ours, val in _flatten(dec).items():
        v = np.asarray(val)
        if v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)
        elif v.ndim == 5:
            v = v.transpose(4, 3, 0, 1, 2)
        sd[f"decoder.{ours}"] = v
    sd["quant_conv.weight"] = np.eye(8, dtype=np.float32
                                     ).reshape(8, 8, 1, 1)
    sd["quant_conv.bias"] = np.zeros((8,), np.float32)

    params, report = svd_vae_params_from_state_dict(sd, ENC_CFG, CFG)
    assert not report["missed"], report["missed"][:5]
    assert not report["unused"], report["unused"][:5]
    assert check_mapping(report, "svd-vae-tiny", quiet=True)

    # decoder round-trips exactly
    z = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 8, 8, 4)), jnp.float32)
    a = temporal_decode(dec, CFG, z)
    b = temporal_decode(jax.tree_util.tree_map(jnp.asarray,
                                               params["decoder"]), CFG, z)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)

    # encoder path with identity quant_conv == image-VAE raw posterior
    x = jnp.asarray(np.random.default_rng(4).uniform(
        -1, 1, (2, 16, 16, 3)), jnp.float32)
    enc = svd_vae_encode(jax.tree_util.tree_map(jnp.asarray, params),
                         ENC_CFG, x)
    assert enc.shape == (2, 8, 8, 4)


def test_loader_accepts_diffusers_naming():
    """The video release ships diffusers naming; translate + load must
    reach 100% coverage and reproduce the CompVis-named load exactly.
    The diffusers keys are written out LITERALLY here (a synthesized
    inverse rename once hid a symmetric translation bug: downsamplers
    map to down.N.downsample.conv, not down.N.downsample)."""
    from flexam_tpu.models.flux_vae import (flux_vae_params_to_state_dict,
                                            init_flux_vae_params)
    from flexam_tpu.models.svd_unet import _flatten

    img = init_flux_vae_params(jax.random.PRNGKey(20), ENC_CFG)
    sd = {k: v for k, v in flux_vae_params_to_state_dict(
        img, ENC_CFG).items() if k.startswith("encoder.")}
    dec = init_temporal_decoder_params(jax.random.PRNGKey(21), CFG)
    for ours, val in _flatten(dec).items():
        v = np.asarray(val)
        if v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)
        elif v.ndim == 5:
            v = v.transpose(4, 3, 0, 1, 2)
        sd[f"decoder.{ours}"] = v
    sd["quant_conv.weight"] = np.eye(8, dtype=np.float32
                                     ).reshape(8, 8, 1, 1)
    sd["quant_conv.bias"] = np.zeros((8,), np.float32)

    # rewrite to the REAL diffusers key spellings
    attn_inv = {"q": "to_q", "k": "to_k", "v": "to_v",
                "proj_out": "to_out.0", "norm": "group_norm"}
    dsd = {}
    for k, v in sd.items():
        nk = k
        if k.startswith("encoder."):
            nk = nk.replace(".norm_out.", ".conv_norm_out.")
            for i in range(len(ENC_CFG.ch_mult)):
                nk = nk.replace(f"down.{i}.block.",
                                f"down_blocks.{i}.resnets.")
                nk = nk.replace(f"down.{i}.downsample.conv.",
                                f"down_blocks.{i}.downsamplers.0.conv.")
            nk = nk.replace("mid.block_1.", "mid_block.resnets.0.")
            nk = nk.replace("mid.block_2.", "mid_block.resnets.1.")
            for a, b in attn_inv.items():
                nk = nk.replace(f"mid.attn_1.{a}.",
                                f"mid_block.attentions.0.{b}.")
            nk = nk.replace(".nin_shortcut.", ".conv_shortcut.")
        if k.startswith("decoder.mid_block.attentions.0."):
            for a, b in attn_inv.items():
                nk = nk.replace(f"attentions.0.{a}.",
                                f"attentions.0.{b}.")
        v = np.asarray(v)
        if (any(t in nk for t in ("to_q", "to_k", "to_v", "to_out"))
                and nk.endswith(".weight") and v.ndim == 4
                and v.shape[2] == v.shape[3] == 1):
            v = v[:, :, 0, 0]           # diffusers ships Linears here
        dsd[nk] = v
    # no CompVis-era spellings may survive the rewrite
    assert not any(".downsample." in k or ".attn_1." in k
                   or ".block_1." in k for k in dsd
                   if k.startswith("encoder.")), \
        [k for k in dsd if ".downsample." in k][:3]

    params, report = svd_vae_params_from_state_dict(dsd, ENC_CFG, CFG)
    assert not report["missed"], report["missed"][:8]
    assert not report["unused"], report["unused"][:8]

    x = jnp.asarray(np.random.default_rng(22).uniform(
        -1, 1, (2, 16, 16, 3)), jnp.float32)
    compvis, _ = svd_vae_params_from_state_dict(sd, ENC_CFG, CFG)
    a = svd_vae_encode(jax.tree_util.tree_map(jnp.asarray, compvis),
                       ENC_CFG, x)
    b = svd_vae_encode(jax.tree_util.tree_map(jnp.asarray, params),
                       ENC_CFG, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_loader_autodetects_temporal_vae(tmp_path):
    """load_depthcrafter_denoiser picks the temporal decoder when the
    VAE file carries decoder.time_conv_out (the video-release layout)."""
    from safetensors.numpy import save_file

    from flexam_tpu.models.flux_vae import (flux_vae_params_to_state_dict,
                                            init_flux_vae_params)
    from flexam_tpu.models.svd_unet import (SVDUNetConfig, _flatten,
                                            init_svd_unet_params,
                                            svd_unet_params_to_state_dict)
    from flexam_tpu.perception.depthcrafter_model import (
        load_depthcrafter_denoiser)

    ucfg = SVDUNetConfig.tiny()
    unet_sd = svd_unet_params_to_state_dict(
        init_svd_unet_params(jax.random.PRNGKey(6), ucfg))

    img = init_flux_vae_params(jax.random.PRNGKey(7), ENC_CFG)
    vae_sd = {k: v for k, v in flux_vae_params_to_state_dict(
        img, ENC_CFG).items() if k.startswith("encoder.")}
    dec = init_temporal_decoder_params(jax.random.PRNGKey(8), CFG)
    for ours, val in _flatten(dec).items():
        v = np.asarray(val)
        if v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)
        elif v.ndim == 5:
            v = v.transpose(4, 3, 0, 1, 2)
        vae_sd[f"decoder.{ours}"] = v

    f1 = str(tmp_path / "unet.safetensors")
    f2 = str(tmp_path / "vae.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in unet_sd.items()}, f1)
    save_file({k: np.ascontiguousarray(v) for k, v in vae_sd.items()}, f2)

    dn = load_depthcrafter_denoiser(ckpt=f1, vae=f2, cfg=ucfg,
                                    vae_cfg=ENC_CFG)
    assert dn.decode_fn is not None          # temporal decoder picked
    frames = np.random.default_rng(9).uniform(
        0, 1, (2, 16, 16, 3)).astype(np.float32)
    out = dn(frames, num_inference_steps=1)
    assert out.shape == (2, 16, 16, 3) and np.isfinite(out).all()


def test_depthcrafter_temporal_decode_fn():
    """The denoiser accepts the temporal decoder as decode_fn."""
    from flexam_tpu.perception.depthcrafter_model import make_tiny_denoiser

    dec = init_temporal_decoder_params(jax.random.PRNGKey(5), CFG)
    fn = make_temporal_decode_fn({"decoder": dec}, CFG)
    dn = make_tiny_denoiser(seed=0, decode_fn=fn)
    frames = np.random.default_rng(5).uniform(
        0, 1, (2, 16, 16, 3)).astype(np.float32)
    out = dn(frames, num_inference_steps=2)
    assert out.shape == (2, 16, 16, 3) and np.isfinite(out).all()
