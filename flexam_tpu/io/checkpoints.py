"""Checkpoint key-mapping: reference torch state_dicts -> flexam_tpu pytrees.

The reference loads the VAE from a raw `.pth` re-prefixed with `model.`
(`FlexAM/models/wan_vae3_8.py:1058-1079`) and the DiT from multi-file
safetensors with `strict=False` + patch-embed channel padding
(`wan_transformer3d_FlexAM.py:1190-1332`). Here the mapping is an explicit
table from torch module paths to our pytree paths; inputs are dicts of numpy
arrays (load safetensors/pth on host, then map).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from flexam_tpu.config import DiTConfig, T5Config, VAEConfig
from flexam_tpu.models.vae import latent_stats


def _conv(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"weight": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _gamma(sd: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    """RMS_norm gamma, squeezing the broadcast dims ((c,1,1,1) or (c,1,1))."""
    return np.asarray(sd[key]).reshape(-1)


def _res_from_sd(sd, prefix: str) -> dict:
    """ResidualBlock: residual = Sequential(RMS, SiLU, Conv, RMS, SiLU,
    Dropout, Conv) (`wan_vae3_8.py:206-214`)."""
    p = {
        "norm1": _gamma(sd, f"{prefix}.residual.0.gamma"),
        "conv1": _conv(sd, f"{prefix}.residual.2"),
        "norm2": _gamma(sd, f"{prefix}.residual.3.gamma"),
        "conv2": _conv(sd, f"{prefix}.residual.6"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, f"{prefix}.shortcut")
    return p


def _attn_from_sd(sd, prefix: str) -> dict:
    return {
        "norm": _gamma(sd, f"{prefix}.norm.gamma"),
        "to_qkv": _conv(sd, f"{prefix}.to_qkv"),
        "proj": _conv(sd, f"{prefix}.proj"),
    }


def _resample_from_sd(sd, prefix: str) -> dict:
    """Resample: resample.1 is the spatial conv (index 0 is Upsample/ZeroPad,
    `wan_vae3_8.py:90-113`); time_conv present for 3d modes."""
    p = {"resample_conv": _conv(sd, f"{prefix}.resample.1")}
    if f"{prefix}.time_conv.weight" in sd:
        p["time_conv"] = _conv(sd, f"{prefix}.time_conv")
    return p


def vae_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: VAEConfig,
) -> dict:
    """Map an `AutoencoderKLWan2_2_` state_dict (keys WITHOUT the diffusers
    wrapper's `model.` prefix) to the `flexam_tpu.models.vae` param tree."""
    n_res = cfg.num_res_blocks
    n_blocks = len(cfg.dim_mult)

    enc: Dict = {"conv1": _conv(sd, "encoder.conv1"), "downsamples": []}
    for i in range(n_blocks):
        base = f"encoder.downsamples.{i}.downsamples"
        blk = {"res": [_res_from_sd(sd, f"{base}.{j}") for j in range(n_res)]}
        if i != n_blocks - 1:
            blk["down"] = _resample_from_sd(sd, f"{base}.{n_res}")
        enc["downsamples"].append(blk)
    enc["middle"] = [_res_from_sd(sd, "encoder.middle.0"),
                     _attn_from_sd(sd, "encoder.middle.1"),
                     _res_from_sd(sd, "encoder.middle.2")]
    enc["head_norm"] = _gamma(sd, "encoder.head.0.gamma")
    enc["head_conv"] = _conv(sd, "encoder.head.2")

    dec: Dict = {"conv1": _conv(sd, "decoder.conv1"), "upsamples": []}
    dec["middle"] = [_res_from_sd(sd, "decoder.middle.0"),
                     _attn_from_sd(sd, "decoder.middle.1"),
                     _res_from_sd(sd, "decoder.middle.2")]
    for i in range(n_blocks):
        base = f"decoder.upsamples.{i}.upsamples"
        blk = {"res": [_res_from_sd(sd, f"{base}.{j}")
                       for j in range(n_res + 1)]}
        if i != n_blocks - 1:
            blk["up"] = _resample_from_sd(sd, f"{base}.{n_res + 1}")
        dec["upsamples"].append(blk)
    dec["head_norm"] = _gamma(sd, "decoder.head.0.gamma")
    dec["head_conv"] = _conv(sd, "decoder.head.2")

    mean, inv_std = latent_stats(cfg.latent_channels)
    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv(sd, "conv1"),
        "conv2": _conv(sd, "conv2"),
        "latents_mean": mean,
        "latents_inv_std": inv_std,
    }


def strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
