"""Depth-Anything-V2 (Large) — native port of the reference's default
repaint/annotator depth model.

Reference call sites: `pipelines.py:158-161` (the "dav" default of
`FirstFrameRepainter` loads `depth-anything/Depth-Anything-V2-Large-hf`)
and the `VideoToDepth` annotator's `model.infer` per-frame loop
(`comfyui/annotator/nodes.py:171-233`, 2/85-percentile normalize +
invert). The model itself is external to the snapshot; this is a
structural port of the published DepthAnythingV2 architecture:

  DINOv2 ViT-L/14 (NO register tokens, LayerScale, final-norm applied to
  the 4 tapped layers 4/11/17/23) -> DPT head (per-layer 1x1 projections
  to (256,512,1024,1024), 4x/2x/1x/0.5x resample, 3x3 no-bias scratch
  convs to 256, four residual-conv-unit fusion blocks with
  align_corners=True upsampling, 3x3 -> 2x -> 3x3 -> 1x1 head) ->
  relative (disparity-like) depth, larger = nearer.

Shared machinery: the DINOv2 encoder is `perception/unidepth.py`'s
(`encoder_init`/`encode_image` — same published backbone, different
geometry flags), the DPT fusion blocks are `perception/zoedepth.py`'s
(`_rcu`/`_fusion` — Midas/DPT lineage). Weights: FLEXAM_DAV2_CKPT
pointing at the original-release `depth_anything_v2_vitl.pth` naming
(`pretrained.*` / `depth_head.*`); the loader is name-mapped and
coverage-gated (io/verify_load) like every perception loader here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.perception.unidepth import (UniDepthV2Config, encode_image,
                                            encoder_init)
from flexam_tpu.perception.zoedepth import (_conv, _conv_init, _conv_t,
                                            _fusion, _fusion_init, _rcu,
                                            resize_ac)


@dataclass(frozen=True)
class DAv2Config:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    # intermediate_layer_idx["vitl"] = [4, 11, 17, 23] (0-based) ->
    # 1-based slice ends for encode_image's output_idx
    output_idx: Tuple[int, ...] = (5, 12, 18, 24)
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    input_size: int = 518            # lower-bound resize, multiple of 14

    def encoder_cfg(self) -> UniDepthV2Config:
        return UniDepthV2Config(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            num_register_tokens=0, layer_scale_init=1.0,
            output_idx=self.output_idx, use_encoder_norm=True,
            stacking_fn="last")


def tiny_dav2_config() -> DAv2Config:
    return DAv2Config(embed_dim=32, depth=4, num_heads=2,
                      output_idx=(1, 2, 3, 4), features=16,
                      out_channels=(8, 16, 32, 32), input_size=42)


def dav2_init(key, cfg: DAv2Config) -> dict:
    ks = jax.random.split(key, 16)
    enc = encoder_init(ks[0], cfg.encoder_cfg())
    f = cfg.features
    def _convt_init(key, k, c):
        # torch ConvTranspose2d layout [I, O, kh, kw] (what zoedepth's
        # _conv_t consumes)
        w = jax.random.normal(key, (c, c, k, k), jnp.float32) * 0.02
        return {"weight": w, "bias": jnp.zeros((c,), jnp.float32)}

    head = {
        "projects": [_conv_init(ks[1 + i], 1, 1, cfg.embed_dim,
                                cfg.out_channels[i]) for i in range(4)],
        # resize_layers: convT x4, convT x2, identity, conv s2
        "resize0": _convt_init(ks[5], 4, cfg.out_channels[0]),
        "resize1": _convt_init(ks[6], 2, cfg.out_channels[1]),
        "resize3": _conv_init(ks[7], 3, 3, cfg.out_channels[3],
                              cfg.out_channels[3]),
        "layer_rn": [_conv_init(ks[8 + i], 3, 3, cfg.out_channels[i], f,
                                bias=False) for i in range(4)],
        "refinenet": [_fusion_init(ks[12], f), _fusion_init(ks[13], f),
                      _fusion_init(ks[14], f), _fusion_init(ks[15], f)],
        "out_conv1": _conv_init(ks[2], 3, 3, f, f // 2),
        "out_conv2a": _conv_init(ks[3], 3, 3, f // 2, 32),
        "out_conv2b": _conv_init(ks[4], 1, 1, 32, 1),
    }
    return {"encoder": enc, "head": head}


@partial(jax.jit, static_argnums=(2,))
def dav2_forward(params: dict, x: jnp.ndarray, cfg: DAv2Config
                 ) -> jnp.ndarray:
    """x [B, H, W, 3] ImageNet-normalized, H/W multiples of patch_size ->
    relative depth [B, H, W] (larger = nearer)."""
    b, hh, ww, _ = x.shape
    ph, pw = hh // cfg.patch_size, ww // cfg.patch_size
    feats, _ = encode_image(params["encoder"], x, cfg.encoder_cfg())
    head = params["head"]
    outs = []
    for i, ft in enumerate(feats):
        y = _conv(ft, head["projects"][i])
        if i == 0:
            y = _conv_t(y, head["resize0"], stride=4)
        elif i == 1:
            y = _conv_t(y, head["resize1"], stride=2)
        elif i == 3:
            y = _conv(y, head["resize3"], stride=2)
        outs.append(_conv(y, head["layer_rn"][i]))
    l1, l2, l3, l4 = outs
    p4 = _fusion(head["refinenet"][3], l4, size=l3.shape[-3:-1])
    p3 = _fusion(head["refinenet"][2], p4, skip=l3, size=l2.shape[-3:-1])
    p2 = _fusion(head["refinenet"][1], p3, skip=l2, size=l1.shape[-3:-1])
    p1 = _fusion(head["refinenet"][0], p2, skip=l1,
                 size=(l1.shape[-3] * 2, l1.shape[-2] * 2))
    y = _conv(p1, head["out_conv1"])
    y = resize_ac(y, (ph * cfg.patch_size, pw * cfg.patch_size))
    y = jax.nn.relu(_conv(y, head["out_conv2a"]))
    y = jax.nn.relu(_conv(y, head["out_conv2b"]))
    return y[..., 0]


# ---------------------------------------------------------------------------
# preprocessing + video driver
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _lower_bound_size(h: int, w: int, target: int, mult: int
                      ) -> Tuple[int, int]:
    """DAv2's Resize(lower_bound, ensure_multiple_of=14): scale so the
    SMALLER side reaches >= target, then round each side UP to /14."""
    scale = target / min(h, w)
    rnd = lambda v: int(np.ceil(v / mult) * mult)
    return max(rnd(h * scale), target), max(rnd(w * scale), target)


def dav2_infer_video(params: dict, video: np.ndarray,
                     cfg: DAv2Config = DAv2Config(),
                     batch: int = 8) -> np.ndarray:
    """video [T, H, W, 3] float 0..1 -> relative depth [T, H, W]
    (resized back to input geometry, raw model scale)."""
    import cv2
    v = np.asarray(video, np.float32)
    t, h, w, _ = v.shape
    rh, rw = _lower_bound_size(h, w, cfg.input_size, cfg.patch_size)
    xs = np.stack([cv2.resize(f, (rw, rh), interpolation=cv2.INTER_CUBIC)
                   for f in v])
    xs = (xs - _IMAGENET_MEAN) / _IMAGENET_STD
    outs = []
    for s in range(0, t, batch):          # bounded launches (watchdog)
        d = dav2_forward(params, jnp.asarray(xs[s:s + batch]), cfg)
        outs.append(np.asarray(d, np.float32))
    d = np.concatenate(outs, 0)
    return np.stack([cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR)
                     for f in d])


def _dav2_backend(video: np.ndarray, **kw) -> np.ndarray:
    """Depth-registry adapter: loads FLEXAM_DAV2_CKPT (coverage-gated)
    and returns depth with the registry's bigger=farther convention
    (DAv2 predicts disparity-like, so invert positively)."""
    params, cfg = load_dav2(os.environ["FLEXAM_DAV2_CKPT"])
    rel = dav2_infer_video(params, video, cfg)
    return 1.0 / np.maximum(rel, 1e-4)


# ---------------------------------------------------------------------------
# checkpoint loader (original-release naming: pretrained.* / depth_head.*)
# ---------------------------------------------------------------------------

def _rename(k: str) -> str:
    k = k.replace("pretrained.", "encoder/")
    k = k.replace("depth_head.", "head/")
    return k


def load_dav2(path: str, cfg: DAv2Config = DAv2Config(),
              verbose: bool = True):
    """Name-mapped loader for `depth_anything_v2_vitl.pth`; coverage-
    gated via io.verify_load (raises on low coverage like the other
    perception loaders)."""
    import torch

    from flexam_tpu.io.verify_load import check_mapping
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v.float()) for k, v in sd.items()}
    params = dav2_init(jax.random.PRNGKey(0), cfg)
    report = {"loaded": [], "missing": [], "unused": list(sd)}

    def take(dst, dst_key, name, transform=lambda a: a):
        if name in sd:
            a = transform(sd[name])
            cur = dst[dst_key]
            if a.shape != cur.shape:
                report["missing"].append(f"{name} (shape {a.shape} vs "
                                         f"{cur.shape})")
                return
            dst[dst_key] = jnp.asarray(a)
            report["loaded"].append(name)
            report["unused"].remove(name)
        else:
            report["missing"].append(name)

    # layouts: the zoedepth-style head convs store TORCH layouts
    # ([O,I,kh,kw] / convT [I,O,kh,kw]) and core `linear` is torch
    # [out,in] -- those tensors pass through UNchanged. Only the
    # unidepth-style patch embed is HWIO.
    to_hwio = lambda a: a.transpose(2, 3, 1, 0)
    enc = params["encoder"]
    take(enc["patch_embed"]["proj"], "weight",
         "pretrained.patch_embed.proj.weight", to_hwio)
    take(enc["patch_embed"]["proj"], "bias", "pretrained.patch_embed.proj.bias")
    take(enc, "cls_token", "pretrained.cls_token")
    take(enc, "pos_embed", "pretrained.pos_embed")
    take(enc["norm"], "weight", "pretrained.norm.weight")
    take(enc["norm"], "bias", "pretrained.norm.bias")
    for i, bp in enumerate(enc["blocks"]):
        pre = f"pretrained.blocks.{i}."
        take(bp["norm1"], "weight", pre + "norm1.weight")
        take(bp["norm1"], "bias", pre + "norm1.bias")
        take(bp["norm2"], "weight", pre + "norm2.weight")
        take(bp["norm2"], "bias", pre + "norm2.bias")
        take(bp["attn"]["qkv"], "weight", pre + "attn.qkv.weight")
        take(bp["attn"]["qkv"], "bias", pre + "attn.qkv.bias")
        take(bp["attn"]["proj"], "weight", pre + "attn.proj.weight")
        take(bp["attn"]["proj"], "bias", pre + "attn.proj.bias")
        take(bp["mlp"]["fc1"], "weight", pre + "mlp.fc1.weight")
        take(bp["mlp"]["fc1"], "bias", pre + "mlp.fc1.bias")
        take(bp["mlp"]["fc2"], "weight", pre + "mlp.fc2.weight")
        take(bp["mlp"]["fc2"], "bias", pre + "mlp.fc2.bias")
        take(bp["ls1"], "gamma", pre + "ls1.gamma")
        take(bp["ls2"], "gamma", pre + "ls2.gamma")
    head = params["head"]
    for i in range(4):
        take(head["projects"][i], "weight",
             f"depth_head.projects.{i}.weight")
        take(head["projects"][i], "bias", f"depth_head.projects.{i}.bias")
        take(head["layer_rn"][i], "weight",
             f"depth_head.scratch.layer{i + 1}_rn.weight")
    # resize_layers 0/1 are ConvTranspose2d (torch IOHW); 3 is Conv2d
    take(head["resize0"], "weight", "depth_head.resize_layers.0.weight")
    take(head["resize0"], "bias", "depth_head.resize_layers.0.bias")
    take(head["resize1"], "weight", "depth_head.resize_layers.1.weight")
    take(head["resize1"], "bias", "depth_head.resize_layers.1.bias")
    take(head["resize3"], "weight", "depth_head.resize_layers.3.weight")
    take(head["resize3"], "bias", "depth_head.resize_layers.3.bias")
    for i in range(4):
        pre = f"depth_head.scratch.refinenet{i + 1}."
        blk = head["refinenet"][i]
        take(blk["out_conv"], "weight", pre + "out_conv.weight")
        take(blk["out_conv"], "bias", pre + "out_conv.bias")
        for j, rcu in ((1, "rcu1"), (2, "rcu2")):
            take(blk[rcu]["conv1"], "weight",
                 pre + f"resConfUnit{j}.conv1.weight")
            take(blk[rcu]["conv1"], "bias", pre + f"resConfUnit{j}.conv1.bias")
            take(blk[rcu]["conv2"], "weight",
                 pre + f"resConfUnit{j}.conv2.weight")
            take(blk[rcu]["conv2"], "bias", pre + f"resConfUnit{j}.conv2.bias")
    take(head["out_conv1"], "weight",
         "depth_head.scratch.output_conv1.weight")
    take(head["out_conv1"], "bias", "depth_head.scratch.output_conv1.bias")
    take(head["out_conv2a"], "weight",
         "depth_head.scratch.output_conv2.0.weight")
    take(head["out_conv2a"], "bias", "depth_head.scratch.output_conv2.0.bias")
    take(head["out_conv2b"], "weight",
         "depth_head.scratch.output_conv2.2.weight")
    take(head["out_conv2b"], "bias", "depth_head.scratch.output_conv2.2.bias")
    check_mapping(report, name="depth_anything_v2", strict=True,
                  quiet=not verbose)
    return params, cfg
