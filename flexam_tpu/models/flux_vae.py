"""FLUX image autoencoder (AutoencoderKL, 16 latent channels), TPU-native.

The reference's FLUX repaint consumes this VAE inside
``FluxControlPipeline`` (`pipelines.py:137-173`) — both the noisy image
latents and the depth control image pass through it. This is a
from-scratch JAX implementation of the published SD-style KL autoencoder
at the FLUX geometry: ch 128, mult (1,2,4,4), 2 res blocks per level,
mid attention at 512, z=16 with double-z encoder output, and the FLUX
scale/shift convention ``z = scale*(sample - shift)``.

TPU-first notes:
  * NHWC layout end-to-end (conv HWIO kernels — MXU-friendly, no NCHW
    transposes inside jit); torch OIHW weights transpose once at load;
  * the encoder's strided downsample uses the reference's asymmetric
    (0,1)x(0,1) padding; decoder upsamples are nearest-2x + conv;
  * single-head spatial attention in the mid blocks runs as one batched
    matmul pair (H*W tokens — 1024 at the repaint latent size).

Loader: exact name map for the official ``ae.safetensors`` layout
(``encoder.down.N.block.M.*``, ``decoder.up.N.*``, CompVis naming, where
``decoder.up`` is indexed by LEVEL and executed high-index-first) with a
coverage report for `io/verify_load`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.core.layers import group_norm, silu


@dataclass(frozen=True)
class FluxVAEConfig:
    in_channels: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159

    @classmethod
    def tiny(cls) -> "FluxVAEConfig":
        # ch must stay a multiple of 32 (GroupNorm(32), like the model)
        return cls(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)


def _conv(x: jnp.ndarray, p: dict, stride: int = 1,
          pad="SAME") -> jnp.ndarray:
    """NHWC conv; p = {"w": [kh, kw, in, out], "b": [out]}."""
    w = p["w"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"].astype(x.dtype)


def _gn(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """GroupNorm(32, eps 1e-6) over NHWC (channels last)."""
    return group_norm(x, p["w"], p["b"], num_groups=32, eps=1e-6)


def _resnet(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    h = _conv(silu(_gn(x, p["norm1"])), p["conv1"])
    h = _conv(silu(_gn(h, p["norm2"])), p["conv2"])
    if "nin_shortcut" in p:
        x = _conv(x, p["nin_shortcut"])
    return x + h


def _attn(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Single-head spatial attention (1x1-conv q/k/v/proj, residual)."""
    b, hh, ww, c = x.shape
    h = _gn(x, p["norm"])
    q = _conv(h, p["q"]).reshape(b, hh * ww, c)
    k = _conv(h, p["k"]).reshape(b, hh * ww, c)
    v = _conv(h, p["v"]).reshape(b, hh * ww, c)
    logits = jnp.einsum("bic,bjc->bij", q, k,
                        preferred_element_type=jnp.float32) * (c ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bij,bjc->bic", probs, v).reshape(b, hh, ww, c)
    return x + _conv(out, p["proj_out"])


def flux_vae_encode(params: dict, cfg: FluxVAEConfig, x: jnp.ndarray,
                    sample_key=None) -> jnp.ndarray:
    """x: [B, H, W, 3] in [-1, 1] -> scaled latents [B, H/8, W/8, z].

    Deterministic (posterior mean) unless `sample_key` is given —
    the control-image encode in the depth pipeline is mean-encoded.
    """
    p = params["encoder"]
    h = _conv(x, p["conv_in"])
    for i in range(len(cfg.ch_mult)):
        lv = p["down"][i]
        for j in range(cfg.num_res_blocks):
            h = _resnet(h, lv["block"][j])
        if i != len(cfg.ch_mult) - 1:
            # asymmetric (0,1)x(0,1) pad, stride-2 conv (reference conv)
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = _conv(h, lv["downsample"], stride=2, pad="VALID")
    h = _resnet(h, p["mid_block_1"])
    h = _attn(h, p["mid_attn_1"])
    h = _resnet(h, p["mid_block_2"])
    h = _conv(silu(_gn(h, p["norm_out"])), p["conv_out"])
    mean, logvar = jnp.split(h, 2, axis=-1)
    z = mean
    if sample_key is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            sample_key, mean.shape, mean.dtype)
    return cfg.scale_factor * (z - cfg.shift_factor)


def flux_vae_decode(params: dict, cfg: FluxVAEConfig,
                    z: jnp.ndarray) -> jnp.ndarray:
    """Scaled latents [B, h, w, z] -> image [B, 8h, 8w, 3] in [-1, 1]."""
    p = params["decoder"]
    z = z / cfg.scale_factor + cfg.shift_factor
    h = _conv(z, p["conv_in"])
    h = _resnet(h, p["mid_block_1"])
    h = _attn(h, p["mid_attn_1"])
    h = _resnet(h, p["mid_block_2"])
    for i in reversed(range(len(cfg.ch_mult))):   # up.3 first (CompVis)
        lv = p["up"][i]
        for j in range(cfg.num_res_blocks + 1):
            h = _resnet(h, lv["block"][j])
        if i != 0:
            b, hh, ww, c = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = _conv(h, lv["upsample"])
    return _conv(silu(_gn(h, p["norm_out"])), p["conv_out"])


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _enc_dims(cfg: FluxVAEConfig):
    dims = [cfg.ch * m for m in cfg.ch_mult]
    return dims, dims[-1]


def init_flux_vae_params(key, cfg: FluxVAEConfig,
                         dtype=jnp.float32) -> dict:
    kit = iter(jax.random.split(key, 256))

    def conv(cin, cout, k=3):
        fan = cin * k * k
        return {"w": (jax.random.normal(next(kit), (k, k, cin, cout),
                                        jnp.float32)
                      * fan ** -0.5).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    def gn(c):
        return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    def resnet(cin, cout):
        p = {"norm1": gn(cin), "conv1": conv(cin, cout),
             "norm2": gn(cout), "conv2": conv(cout, cout)}
        if cin != cout:
            p["nin_shortcut"] = conv(cin, cout, k=1)
        return p

    def attn(c):
        return {"norm": gn(c), "q": conv(c, c, 1), "k": conv(c, c, 1),
                "v": conv(c, c, 1), "proj_out": conv(c, c, 1)}

    dims, top = _enc_dims(cfg)
    enc: dict = {"conv_in": conv(cfg.in_channels, cfg.ch), "down": []}
    cin = cfg.ch
    for i, d in enumerate(dims):
        lv = {"block": []}
        for _ in range(cfg.num_res_blocks):
            lv["block"].append(resnet(cin, d))
            cin = d
        if i != len(dims) - 1:
            lv["downsample"] = conv(d, d)
        enc["down"].append(lv)
    enc.update({"mid_block_1": resnet(top, top), "mid_attn_1": attn(top),
                "mid_block_2": resnet(top, top), "norm_out": gn(top),
                "conv_out": conv(top, 2 * cfg.z_channels)})

    dec: dict = {"conv_in": conv(cfg.z_channels, top),
                 "mid_block_1": resnet(top, top), "mid_attn_1": attn(top),
                 "mid_block_2": resnet(top, top),
                 "up": [None] * len(dims)}
    cin = top
    for i in reversed(range(len(dims))):
        lv = {"block": []}
        for _ in range(cfg.num_res_blocks + 1):
            lv["block"].append(resnet(cin, dims[i]))
            cin = dims[i]
        if i != 0:
            lv["upsample"] = conv(dims[i], dims[i])
        dec["up"][i] = lv
    dec.update({"norm_out": gn(cfg.ch * cfg.ch_mult[0]),
                "conv_out": conv(cfg.ch * cfg.ch_mult[0], cfg.in_channels)})
    return {"encoder": enc, "decoder": dec}


def _vae_names(cfg: FluxVAEConfig) -> Dict[str, tuple]:
    """ae.safetensors key (without .weight/.bias) -> pytree path."""
    names: Dict[str, tuple] = {}

    def mod(sd_key, *path):
        names[sd_key] = path

    for side in ("encoder", "decoder"):
        mod(f"{side}.conv_in", side, "conv_in")
        mod(f"{side}.conv_out", side, "conv_out")
        mod(f"{side}.norm_out", side, "norm_out")
        for blk in ("block_1", "block_2"):
            for leaf in ("norm1", "conv1", "norm2", "conv2",
                         "nin_shortcut"):
                mod(f"{side}.mid.{blk}.{leaf}", side, f"mid_{blk}", leaf)
        for leaf in ("norm", "q", "k", "v", "proj_out"):
            mod(f"{side}.mid.attn_1.{leaf}", side, "mid_attn_1", leaf)
    n_lv = len(cfg.ch_mult)
    for i in range(n_lv):
        for j in range(cfg.num_res_blocks):
            for leaf in ("norm1", "conv1", "norm2", "conv2",
                         "nin_shortcut"):
                mod(f"encoder.down.{i}.block.{j}.{leaf}",
                    "encoder", "down", i, "block", j, leaf)
        if i != n_lv - 1:
            mod(f"encoder.down.{i}.downsample.conv",
                "encoder", "down", i, "downsample")
    for i in range(n_lv):
        for j in range(cfg.num_res_blocks + 1):
            for leaf in ("norm1", "conv1", "norm2", "conv2",
                         "nin_shortcut"):
                mod(f"decoder.up.{i}.block.{j}.{leaf}",
                    "decoder", "up", i, "block", j, leaf)
        if i != 0:
            mod(f"decoder.up.{i}.upsample.conv",
                "decoder", "up", i, "upsample")
    return names


def _get_path(tree, path):
    node = tree
    for p in path:
        if node is None:
            return None
        if isinstance(p, int):
            node = node[p] if p < len(node) else None
        else:
            node = node.get(p) if isinstance(node, dict) else None
    return node


def flux_vae_params_from_state_dict(sd: Dict[str, np.ndarray],
                                    cfg: FluxVAEConfig, dtype=np.float32
                                    ) -> Tuple[dict, Dict[str, list]]:
    """Exact name map; torch OIHW conv kernels -> HWIO. Norm weights are
    1-D and pass through. Optional leaves (nin_shortcut) only count when
    the module structurally needs them (channel-changing resnets)."""
    template = init_flux_vae_params(jax.random.PRNGKey(0), cfg)
    names = _vae_names(cfg)
    loaded, missed, used = [], [], set()
    params = jax.tree_util.tree_map(lambda x: np.zeros_like(
        np.asarray(x, dtype)), template)
    for sd_key, path in names.items():
        tgt = _get_path(params, path)
        if tgt is None:   # optional leaf this geometry doesn't have
            continue
        wk, bk = f"{sd_key}.weight", f"{sd_key}.bias"
        if wk not in sd or bk not in sd:
            missed.append("/".join(str(p) for p in path))
            continue
        w = np.asarray(sd[wk], dtype)
        if w.ndim == 4:                       # OIHW -> HWIO
            w = w.transpose(2, 3, 1, 0)
        tgt["w"][...] = w
        tgt["b"][...] = np.asarray(sd[bk], dtype)
        loaded.append("/".join(str(p) for p in path))
        used.update((wk, bk))
    unused = [k for k in sd if k not in used]
    return params, {"loaded": loaded, "missed": missed, "unused": unused}


def flux_vae_params_to_state_dict(params: dict, cfg: FluxVAEConfig
                                  ) -> Dict[str, np.ndarray]:
    """Inverse map (round-trip tests / export), HWIO -> OIHW."""
    out = {}
    for sd_key, path in _vae_names(cfg).items():
        node = _get_path(params, path)
        if node is None:
            continue
        w = np.asarray(node["w"])
        if w.ndim == 4:
            w = w.transpose(3, 2, 0, 1)
        out[f"{sd_key}.weight"] = w
        out[f"{sd_key}.bias"] = np.asarray(node["b"])
    return out
