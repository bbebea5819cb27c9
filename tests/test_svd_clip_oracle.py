"""Native CLIP image-embed head (models/clip.py clip_image_embed +
clip_vision_params_from_hf) vs the actual transformers
CLIPVisionModelWithProjection, plus DepthCrafter FLEXAM_SVD_CLIP wiring."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flexam_tpu.models.clip import (clip_image_embed,
                                    clip_vision_params_from_hf)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf_model(act: str, proj_dim: int = 16):
    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=proj_dim, hidden_act=act)
    torch.manual_seed(0)
    return transformers.CLIPVisionModelWithProjection(cfg).eval()


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_image_embed_oracle(act):
    model = _tiny_hf_model(act)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, cfg, rep = clip_vision_params_from_hf(sd, num_heads=2,
                                                  activation=act)
    assert not rep["missed"], rep["missed"][:5]
    assert cfg.num_layers == 2 and cfg.dim == 32 and cfg.image_size == 28

    x = np.random.default_rng(0).standard_normal(
        (2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(x)).image_embeds.numpy()
    ours = np.asarray(clip_image_embed(
        jax.tree_util.tree_map(jnp.asarray, params), cfg, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_loader_reports_missing():
    _, _, rep = clip_vision_params_from_hf(
        {"junk": np.zeros((2, 2), np.float32)})
    assert rep["missed"] and not rep["loaded"]

    # a partially-present dict also refuses (dropping a whole trailing
    # layer would just infer a consistent shallower model, so drop a
    # non-structural leaf)
    model = _tiny_hf_model("gelu")
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if "post_layernorm" not in k}
    params, _, rep = clip_vision_params_from_hf(sd, num_heads=2)
    assert params == {} and rep["missed"]

    # attention weights present but biases pruned: report, don't crash
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if not ("self_attn" in k and k.endswith(".bias"))}
    params, _, rep = clip_vision_params_from_hf(sd, num_heads=2)
    assert params == {} and rep["missed"]


def test_depthcrafter_clip_wiring(tmp_path):
    """load_depthcrafter_denoiser(clip=...) runs the native tower."""
    from safetensors.numpy import save_file

    from flexam_tpu.models.flux_vae import (FluxVAEConfig,
                                            flux_vae_params_to_state_dict,
                                            init_flux_vae_params)
    from flexam_tpu.models.svd_unet import (SVDUNetConfig,
                                            init_svd_unet_params,
                                            svd_unet_params_to_state_dict)
    from flexam_tpu.perception.depthcrafter_model import (
        load_depthcrafter_denoiser)

    ucfg = SVDUNetConfig.tiny()                  # cross_attention_dim 48
    unet_sd = svd_unet_params_to_state_dict(
        init_svd_unet_params(jax.random.PRNGKey(0), ucfg))
    vcfg = FluxVAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         z_channels=4, scale_factor=0.18215,
                         shift_factor=0.0)
    vae_sd = flux_vae_params_to_state_dict(
        init_flux_vae_params(jax.random.PRNGKey(1), vcfg), vcfg)
    clip_model = _tiny_hf_model("quick_gelu", proj_dim=48)
    clip_sd = {k: np.ascontiguousarray(v.numpy())
               for k, v in clip_model.state_dict().items()}

    f_unet = str(tmp_path / "unet.safetensors")
    f_vae = str(tmp_path / "vae.safetensors")
    f_clip = str(tmp_path / "image_encoder.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in unet_sd.items()},
              f_unet)
    save_file({k: np.ascontiguousarray(v) for k, v in vae_sd.items()},
              f_vae)
    save_file(clip_sd, f_clip)
    with open(tmp_path / "config.json", "w") as f:
        json.dump({"num_attention_heads": 2, "hidden_act": "quick_gelu"}, f)

    dn = load_depthcrafter_denoiser(ckpt=f_unet, vae=f_vae, clip=f_clip,
                                    cfg=ucfg, vae_cfg=vcfg,
                                    dtype=jnp.float32)
    assert dn.image_embed_fn is not None

    # the embed fn reproduces the HF head (through resize+normalize)
    frames = np.random.default_rng(2).uniform(
        0, 1, (2, 16, 16, 3)).astype(np.float32)
    e = dn.image_embed_fn(frames)
    assert e.shape == (2, 48)
    # distinct frames -> distinct embeddings (conditioning is live)
    assert np.abs(e[0] - e[1]).max() > 1e-5

    out = dn(frames, num_inference_steps=1)
    assert out.shape == (2, 16, 16, 3) and np.isfinite(out).all()
