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


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

def _lin(sd, prefix, dtype=None):
    p = {"weight": np.asarray(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = np.asarray(sd[prefix + ".bias"])
    if dtype is not None:
        p = {k: v.astype(dtype) for k, v in p.items()}
    return p


def dit_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: DiTConfig, dtype=np.float32,
) -> dict:
    """Map a `Wan2_2Transformer3DModel_FlexAM` state_dict to the
    scan-stacked flexam_tpu DiT pytree (module names at
    `wan_transformer3d_FlexAM.py:624-711`). Reproduces the patch-embedding
    input-channel zero-padding for checkpoints with fewer input channels
    (`:1307-1310`)."""
    import jax

    def g(k):
        return np.asarray(sd[k], dtype)

    patch_w = g("patch_embedding.weight")
    if patch_w.shape[1] < cfg.in_dim:   # channel-pad (`:1307-1310`)
        pad = np.zeros(
            (patch_w.shape[0], cfg.in_dim - patch_w.shape[1])
            + patch_w.shape[2:], dtype)
        patch_w = np.concatenate([patch_w, pad], axis=1)

    params = {
        "patch_embedding": {"weight": patch_w,
                            "bias": g("patch_embedding.bias")},
        "text_embedding": {"fc1": _lin(sd, "text_embedding.0", dtype),
                           "fc2": _lin(sd, "text_embedding.2", dtype)},
        "time_embedding": {"fc1": _lin(sd, "time_embedding.0", dtype),
                           "fc2": _lin(sd, "time_embedding.2", dtype)},
        "time_projection": {"fc": _lin(sd, "time_projection.1", dtype)},
        "density_embedding": {"fc1": _lin(sd, "density_embedding.0", dtype),
                              "fc2": _lin(sd, "density_embedding.2", dtype)},
        "density_projection": {"fc": _lin(sd, "density_projection.1", dtype)},
        "head": {
            "head": _lin(sd, "head.head", dtype),
            "modulation": np.asarray(sd["head.modulation"], np.float32),
            "modulation_density": np.asarray(sd["head.modulation_density"],
                                             np.float32),
        },
    }

    blocks = []
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        blk = {
            "self_attn": {
                "q": _lin(sd, f"{p}.self_attn.q", dtype),
                "k": _lin(sd, f"{p}.self_attn.k", dtype),
                "v": _lin(sd, f"{p}.self_attn.v", dtype),
                "o": _lin(sd, f"{p}.self_attn.o", dtype),
                "norm_q": g(f"{p}.self_attn.norm_q.weight"),
                "norm_k": g(f"{p}.self_attn.norm_k.weight"),
            },
            "cross_attn": {
                "q": _lin(sd, f"{p}.cross_attn.q", dtype),
                "k": _lin(sd, f"{p}.cross_attn.k", dtype),
                "v": _lin(sd, f"{p}.cross_attn.v", dtype),
                "o": _lin(sd, f"{p}.cross_attn.o", dtype),
                "norm_q": g(f"{p}.cross_attn.norm_q.weight"),
                "norm_k": g(f"{p}.cross_attn.norm_k.weight"),
            },
            "ffn": {"fc1": _lin(sd, f"{p}.ffn.0", dtype),
                    "fc2": _lin(sd, f"{p}.ffn.2", dtype)},
            "modulation": np.asarray(sd[f"{p}.modulation"], np.float32),
            "modulation_density": np.asarray(sd[f"{p}.modulation_density"],
                                             np.float32),
        }
        if cfg.cross_attn_norm:
            blk["norm3"] = {"weight": g(f"{p}.norm3.weight"),
                            "bias": g(f"{p}.norm3.bias")}
        blocks.append(blk)
    params["blocks"] = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, 0), *blocks)

    if cfg.add_ref_conv and "ref_conv.weight" in sd:
        params["ref_conv"] = {"weight": g("ref_conv.weight"),
                              "bias": g("ref_conv.bias")}
    if cfg.add_cnn_block and "cnn_conv1.0.weight" in sd:
        cnn = {}
        for j in range(1, 5):
            cnn[f"conv{j}"] = _lin(sd, f"cnn_conv{j}.0", dtype)
            cnn[f"gn{j}"] = {"weight": g(f"cnn_conv{j}.1.weight"),
                             "bias": g(f"cnn_conv{j}.1.bias")}
        cnn["conv5"] = _lin(sd, "cnn_conv5", dtype)
        params["cnn"] = cnn
    return params


# ---------------------------------------------------------------------------
# File loading
# ---------------------------------------------------------------------------

def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Multi-file safetensors glob merge (the reference's loader,
    `wan_transformer3d_FlexAM.py:1238-1246`), or a single file/pth."""
    import glob
    import os

    sd: Dict[str, np.ndarray] = {}
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no safetensors under {path}")
        for f in files:
            sd.update(_load_one(f))
    else:
        sd.update(_load_one(path))
    return sd


def _load_one(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        try:
            return load_file(path)
        except Exception:
            # bf16 tensors: go through torch then numpy
            from safetensors.torch import load_file as tload
            return {k: v.float().numpy() for k, v in tload(path).items()}
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.float().numpy() for k, v in sd.items()}


def load_vae_checkpoint(path: str, cfg: VAEConfig) -> dict:
    """Raw Wan VAE `.pth` (keys without prefix; the reference re-prefixes
    with `model.`, `wan_vae3_8.py:1058-1079`)."""
    sd = _load_one(path)
    if any(k.startswith("model.") for k in sd):
        sd = strip_prefix(sd, "model.")
    return vae_params_from_state_dict(sd, cfg)


def load_dit_checkpoint(path: str, cfg: DiTConfig, dtype=np.float32) -> dict:
    return dit_params_from_state_dict(load_safetensors_dir(path), cfg, dtype)


def load_t5_checkpoint(path: str, cfg: T5Config, dtype=np.float32) -> dict:
    from flexam_tpu.models.t5 import t5_params_from_state_dict
    return t5_params_from_state_dict(_load_one(path), cfg, dtype)


# ---------------------------------------------------------------------------
# Pytree save/restore (training checkpoints; the reference only loads)
# ---------------------------------------------------------------------------

def save_pytree(path: str, tree) -> None:
    """Flatten a params pytree to a single .npz keyed by '/'-joined paths
    (bf16/fp8 leaves stored as uint16/uint8 views for numpy .npy-format
    compatibility — int8 quantized trees need no translation)."""
    import jax
    import jax.numpy as jnp

    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}/{k}" if prefix else str(k), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(f"{prefix}/{i}", v)
        else:
            arr = np.asarray(node)
            if arr.dtype == jnp.bfloat16:
                flat[prefix + "::bf16"] = arr.view(np.uint16)
            elif arr.dtype == jnp.float8_e4m3fn:
                flat[prefix + "::f8e4m3"] = arr.view(np.uint8)
            else:
                flat[prefix] = arr

    visit("", tree)
    np.savez(path, **flat)


def load_pytree_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a save_pytree .npz back into a flat '/'-path dict."""
    import ml_dtypes

    out = {}
    with np.load(path) as z:
        for k in z.files:
            if k.endswith("::bf16"):
                out[k[:-6]] = z[k].view(ml_dtypes.bfloat16)
            elif k.endswith("::f8e4m3"):
                out[k[:-8]] = z[k].view(ml_dtypes.float8_e4m3fn)
            else:
                out[k] = z[k]
    return out


def nest_flat_paths(flat: dict) -> dict:
    """Rebuild a nested tree from '/'-joined flat paths (the save_pytree
    layout). save_pytree flattens list/tuple nodes to stringified
    indices; a dict whose keys are exactly the contiguous digits 0..n-1
    is therefore converted back to a list, so int-indexed access (e.g.
    the VAE's `downsamples`/`upsamples` lists) round-trips."""
    tree: dict = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def delist(node):
        if not isinstance(node, dict):
            return node
        node = {k: delist(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            idx = sorted(int(k) for k in node)
            if idx == list(range(len(idx))):
                return [node[str(i)] for i in idx]
        return node

    return delist(tree)


def restore_pytree_nested(path: str) -> dict:
    """Restore a save_pytree .npz WITHOUT a like-tree: '/'-joined paths
    rebuild nested dicts (list/tuple nodes restore as lists — see
    nest_flat_paths). Used for trees whose structure differs from any
    init skeleton — e.g. prequantized DiT trees ({weight_q, w_scale}
    replacing {weight}; `tools/prequant_ckpt.py`)."""
    return nest_flat_paths(load_pytree_state_dict(path))


def restore_pytree(path: str, like) -> dict:
    """Restore into the structure of `like` (shapes/paths must match)."""
    import jax

    flat = load_pytree_state_dict(path)

    def visit(prefix, node):
        if isinstance(node, dict):
            return {k: visit(f"{prefix}/{k}" if prefix else str(k), v)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [visit(f"{prefix}/{i}", v) for i, v in enumerate(node)]
            return type(node)(vals) if isinstance(node, tuple) else vals
        return flat[prefix]

    return visit("", like)
