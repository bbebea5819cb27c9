"""VGGT — alternating-attention multi-view geometry model, native.

The reference's video-input camera path runs
`VGGT.from_pretrained("facebook/VGGT-1B")` and consumes exactly three
members (`/root/reference/demo.py:296-325`):

    tokens_list, ps_idx = model.aggregator(video [1, T, 3, 518, W])
    pose_enc = model.camera_head(tokens_list)[-1]        # [B, T, 9]
    extr, intr = pose_encoding_to_extri_intri(pose_enc, (H, W))
    depth, conf = model.depth_head(tokens_list, video, ps_idx)

The vggt submodule is EMPTY in the snapshot (SURVEY.md §2.6), so — like
DenseTrack3D/MoGe/Pi3 — this is an original TPU-native implementation of
the published architecture family (CVPR 2025: DINOv2 patchifier; per
frame a camera token + register tokens, with DISTINCT first-frame
embeddings that pin the reference view — the model is deliberately NOT
permutation equivariant, unlike Pi3; alternating frame-wise/global
attention aggregator whose per-layer outputs feed the heads; an
iterative camera head refining an absT+quatR+FoV encoding; a DPT-style
depth head over selected aggregator layers) behind that exact surface.

Post-processing (`pose_encoding_to_extri_intri`) was ported in round 2
(`perception/poses.py`) and is reused unchanged. Loading follows the
coverage-gated shape mapper policy (FLEXAM_VGGT_CKPT); the
no-checkpoint fallback for the camera path remains the Kabsch track
solver (`perception/pose_solver.py`).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.core.layers import linear, linear_init
from flexam_tpu.perception.unidepth import (UniDepthV2Config, _attn_block,
                                            _attn_block_init, _gelu, _ln,
                                            _ln_init, encode_image,
                                            encoder_init)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class VGGTConfig:
    # DINOv2 patchifier (shared family with the UniDepth/MoGe/Pi3 ports)
    patch_size: int = 14
    embed_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    num_register_tokens: int = 4
    pretrain_img_size: int = 518
    # aggregator: alternating frame/global attention pairs
    agg_dim: int = 1024
    agg_depth: int = 24
    agg_heads: int = 16
    mlp_expansion: int = 4
    n_special: int = 5              # 1 camera + 4 register tokens / frame
    # camera head
    cam_iters: int = 4
    cam_heads: int = 8
    # depth head taps (indices into tokens_list)
    depth_taps: Tuple[int, ...] = (4, 11, 17, 23)
    depth_features: int = 128
    compute: str = "float32"

    def encoder_cfg(self) -> UniDepthV2Config:
        return UniDepthV2Config(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.enc_depth, num_heads=self.enc_heads,
            num_register_tokens=self.num_register_tokens,
            output_idx=(self.enc_depth,),
            pretrain_img_size=self.pretrain_img_size)


def vggt_init(key, cfg: VGGTConfig) -> dict:
    ks = jax.random.split(key, cfg.agg_depth * 2 + cfg.cam_iters + 16)
    d = cfg.agg_dim
    p = {
        "encoder": encoder_init(ks[0], cfg.encoder_cfg()),
        "proj_in": linear_init(ks[1], cfg.embed_dim, d),
        # learnable special tokens; the FIRST-frame variants differ so the
        # model can pin the reference view (non-equivariance by design)
        "camera_token": jax.random.normal(ks[2], (1, 1, 1, d)) * 0.02,
        "camera_token_first": jax.random.normal(ks[3], (1, 1, 1, d)) * 0.02,
        "register_token": jax.random.normal(
            ks[4], (1, 1, cfg.n_special - 1, d)) * 0.02,
        "register_token_first": jax.random.normal(
            ks[5], (1, 1, cfg.n_special - 1, d)) * 0.02,
        "agg_frame": [
            _attn_block_init(ks[6 + 2 * i], d, cfg.mlp_expansion,
                             cfg.agg_heads, 0.0)
            for i in range(cfg.agg_depth)],
        "agg_global": [
            _attn_block_init(ks[7 + 2 * i], d, cfg.mlp_expansion,
                             cfg.agg_heads, 0.0)
            for i in range(cfg.agg_depth)],
    }
    base = 6 + 2 * cfg.agg_depth
    # camera head: iterative trunk over the per-frame camera tokens
    p["cam_norm"] = _ln_init(d)
    p["cam_embed"] = linear_init(ks[base], 9, d)
    p["cam_trunk"] = [
        _attn_block_init(ks[base + 1 + i], d, cfg.mlp_expansion,
                         cfg.cam_heads, 0.0) for i in range(cfg.cam_iters)]
    p["cam_fc1"] = linear_init(ks[base + cfg.cam_iters + 1], d, d)
    p["cam_fc2"] = {"weight": jnp.zeros((9, d)), "bias": jnp.zeros((9,))}
    # depth head: per-tap projection + fused conv refinement
    f = cfg.depth_features
    kk = jax.random.split(ks[base + cfg.cam_iters + 2], 8)
    p["depth_proj"] = [linear_init(kk[i], d, f)
                       for i in range(len(cfg.depth_taps))]
    p["depth_conv1"] = linear_init(kk[4], f, f)
    p["depth_conv2"] = linear_init(
        kk[5], f, cfg.patch_size * cfg.patch_size * 2)
    return p


def _prep(imgs: jnp.ndarray, dtype) -> jnp.ndarray:
    x = imgs.transpose(0, 1, 3, 4, 2)
    return ((x - jnp.asarray(_IMAGENET_MEAN, x.dtype))
            / jnp.asarray(_IMAGENET_STD, x.dtype)).astype(dtype)


def vggt_aggregator(params: dict, cfg: VGGTConfig, imgs: jnp.ndarray
                    ) -> Tuple[List[jnp.ndarray], int]:
    """imgs [B, T, 3, H, W] 0..1 -> (tokens_list — one [B, T, N, D] per
    alternating-attention pair, N = n_special + patches —,
    patch_start_idx)."""
    b, t, _, h, w = imgs.shape
    dtype = jnp.bfloat16 if cfg.compute == "bfloat16" else jnp.float32
    x = _prep(imgs, dtype).reshape(b * t, h, w, 3)
    feats, _ = encode_image(params["encoder"], x, cfg.encoder_cfg())
    f = feats[-1]
    h0, w0 = f.shape[1], f.shape[2]
    ptoks = h0 * w0
    tok = linear(f.reshape(b * t, ptoks, cfg.embed_dim), params["proj_in"])
    tok = tok.reshape(b, t, ptoks, cfg.agg_dim)

    def expand(first, rest, n):
        first = jnp.broadcast_to(first.astype(tok.dtype),
                                 (b, 1, n, cfg.agg_dim))
        rest = jnp.broadcast_to(rest.astype(tok.dtype),
                                (b, max(t - 1, 0), n, cfg.agg_dim))
        return jnp.concatenate([first, rest], axis=1) if t > 1 else first

    cam = expand(params["camera_token_first"], params["camera_token"], 1)
    reg = expand(params["register_token_first"], params["register_token"],
                 cfg.n_special - 1)
    tok = jnp.concatenate([cam, reg, tok], axis=2)     # [B, T, N, D]
    n = tok.shape[2]

    tokens_list = []
    for fp, gp in zip(params["agg_frame"], params["agg_global"]):
        flat = tok.reshape(b * t, n, cfg.agg_dim)
        flat = _attn_block(fp, flat, cfg.agg_heads)            # per frame
        flat = flat.reshape(b, t * n, cfg.agg_dim)
        flat = _attn_block(gp, flat, cfg.agg_heads)            # global
        tok = flat.reshape(b, t, n, cfg.agg_dim)
        tokens_list.append(tok)
    return tokens_list, cfg.n_special


def vggt_camera_head(params: dict, cfg: VGGTConfig,
                     tokens_list: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Iterative refinement over the camera tokens -> list of pose
    encodings [B, T, 9] (absT(3) + quat wxyz(4) + fov(2)); the reference
    consumes `[-1]` (`demo.py:319`). Initialized to identity pose:
    quat bias (1,0,0,0) comes from `poses.quat_to_rotmat` normalization
    of the raw encoding."""
    cam = tokens_list[-1][:, :, 0]                       # [B, T, D]
    cam = _ln(cam, params["cam_norm"])
    b, t, d = cam.shape
    enc = jnp.zeros((b, t, 9), cam.dtype)
    enc = enc.at[..., 3].set(1.0)                        # identity quat
    # seed fov ~51 deg so identity-init intrinsics stay finite
    # (fov=0 -> fx=inf in pose_encoding_to_extri_intri)
    enc = enc.at[..., 7:9].set(0.9)
    outs = []
    for i in range(cfg.cam_iters):
        h = cam + linear(enc, params["cam_embed"])
        h = _attn_block(params["cam_trunk"][i], h, cfg.cam_heads)
        delta = linear(_gelu(linear(h, params["cam_fc1"])),
                       params["cam_fc2"])
        enc = enc + delta
        outs.append(enc.astype(jnp.float32))
    return outs


def vggt_depth_head(params: dict, cfg: VGGTConfig,
                    tokens_list: List[jnp.ndarray], imgs: jnp.ndarray,
                    patch_start_idx: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DPT-style fusion of the tapped aggregator layers -> per-pixel
    (depth [B, T, H, W, 1], conf [B, T, H, W]) like the reference's
    `depth_head(aggregated_tokens_list, images, ps_idx)`."""
    b, t, _, h, w = imgs.shape
    h0, w0 = h // cfg.patch_size, w // cfg.patch_size
    taps = [tokens_list[min(i, len(tokens_list) - 1)]
            for i in cfg.depth_taps]
    acc = None
    for proj, tap in zip(params["depth_proj"], taps):
        ft = linear(tap[:, :, patch_start_idx:], proj)   # [B,T,P,f]
        acc = ft if acc is None else acc + ft
    acc = _gelu(linear(acc, params["depth_conv1"]))
    out = linear(acc, params["depth_conv2"])             # [B,T,P,ps*ps*2]
    ps = cfg.patch_size
    out = out.reshape(b, t, h0, w0, ps, ps, 2)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h, w, 2)
    depth = jax.nn.softplus(out[..., :1]).astype(jnp.float32)
    conf = jax.nn.sigmoid(out[..., 1]).astype(jnp.float32)
    return depth, conf


class VGGT:
    """Reference call surface (`demo.py:310-321`)."""

    def __init__(self, cfg: Optional[VGGTConfig] = None, seed: int = 0):
        self.cfg = cfg or VGGTConfig()
        self.params = vggt_init(jax.random.key(seed), self.cfg)
        self.load_report = None
        self.load_ok = False
        self._agg_jit = jax.jit(
            lambda p, x: vggt_aggregator(p, self.cfg, x))

    def to(self, *a, **k):
        return self

    def eval(self):
        return self

    @classmethod
    def from_pretrained(cls, name_or_path: str = "facebook/VGGT-1B",
                        cfg: Optional[VGGTConfig] = None) -> "VGGT":
        path = None
        if os.path.exists(str(name_or_path)):
            path = str(name_or_path)
        elif os.environ.get("FLEXAM_VGGT_CKPT"):
            path = os.environ["FLEXAM_VGGT_CKPT"]
        model = cls(cfg)
        if path:
            load_vggt(path, model)
        else:
            print("WARNING: no VGGT weights found (set FLEXAM_VGGT_CKPT) "
                  "— random-weight VGGT emits near-identity poses; the "
                  "track-based Kabsch solver is the no-checkpoint "
                  "fallback")
        return model

    def aggregator(self, imgs) -> Tuple[list, int]:
        x = jnp.asarray(np.asarray(imgs), jnp.float32)
        if x.ndim == 4:
            x = x[None]
        toks, ps = self._agg_jit(self.params, x)
        return list(toks), ps

    def camera_head(self, tokens_list) -> List[np.ndarray]:
        outs = vggt_camera_head(self.params, self.cfg, tokens_list)
        return [np.asarray(o) for o in outs]

    def depth_head(self, tokens_list, imgs, patch_start_idx: int):
        x = jnp.asarray(np.asarray(imgs), jnp.float32)
        if x.ndim == 4:
            x = x[None]
        d, c = vggt_depth_head(self.params, self.cfg, tokens_list, x,
                               patch_start_idx)
        return np.asarray(d), np.asarray(c)


def load_vggt(path: str, model: Optional[VGGT] = None,
              coverage_threshold: float = 0.9) -> VGGT:
    """Shape-signature checkpoint mapping with coverage gating (same
    policy as load_densetrack3d/load_moge/load_pi3)."""
    import torch

    from flexam_tpu.io.verify_load import check_mapping
    from flexam_tpu.perception.densetrack3d import map_torch_state_dict

    if os.path.isdir(path):
        for name in ("model.safetensors", "model.pt", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        sd = {}
        with safe_open(path, framework="np") as fh:
            for k in fh.keys():
                sd[k] = fh.get_tensor(k)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        sd = {k: v.float().numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
    model = model or VGGT()
    model.params, report = map_torch_state_dict(model.params, sd)
    model.load_report = report
    model.load_ok = check_mapping(report, quiet=True,
                                  threshold=coverage_threshold)
    print(f"vggt: mapped {len(report['loaded'])} tensors, "
          f"{len(report['missed'])} unmatched (best-effort)")
    if not model.load_ok:
        check_mapping(report, name=f"vggt[{path}]",
                      threshold=coverage_threshold)
        print("WARNING: vggt checkpoint mapping is LOW-COVERAGE — "
              "unmatched modules stay at random init")
    return model


def vggt_video_poses(video: np.ndarray, model: Optional[VGGT] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """[T, H, W, 3] (or [T, 3, H, W]) 0..1 -> (extr [T, 3, 4],
    intr [T, 3, 3]) — the full reference preprocessing chain
    (`demo.py:297-319`): resize to width 518 (bicubic, height snapped to
    /14, center-cropped to <=518), aggregator -> camera head ->
    pose_encoding_to_extri_intri."""
    import cv2

    from flexam_tpu.perception.poses import pose_encoding_to_extri_intri

    v = np.asarray(video, np.float32)
    if v.ndim == 4 and v.shape[1] == 3:
        v = v.transpose(0, 2, 3, 1)
    t, h, w, _ = v.shape
    new_w = 518
    new_h = round(h * (new_w / w) / 14) * 14
    frames = np.stack([cv2.resize(f, (new_w, new_h),
                                  interpolation=cv2.INTER_CUBIC)
                       for f in v])
    if new_h > 518:
        y0 = (new_h - 518) // 2
        frames = frames[:, y0:y0 + 518]
    model = model or VGGT.from_pretrained()
    imgs = frames.transpose(0, 3, 1, 2)[None]            # [1,T,3,H,W]
    toks, ps = model.aggregator(imgs)
    enc = model.camera_head(toks)[-1]
    return pose_encoding_to_extri_intri(enc, frames.shape[1:3])
