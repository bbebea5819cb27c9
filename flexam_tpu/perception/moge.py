"""MoGe-2 — monocular geometry (point map / depth / mask / intrinsics).

The reference's image-input path runs
`MoGeModel.from_pretrained("Ruicheng/moge-2-vitl-normal").infer(img
[3,H,W] in 0..1)` -> {"points" [H,W,3], "depth" [H,W], "mask" [H,W],
"intrinsics" [3,3] (normalized)} (`demo.py:22,196,220-223`), tiles the
static point map over time, and feeds `w2s_moge` +
`convert_moge_to_delta_format`. The MoGe submodule is EMPTY in the
snapshot (SURVEY.md §2.6), so — like DenseTrack3D — this is an original
implementation of the published architecture family behind the exact
call surface:

  * DINOv2 ViT-L/14 encoder (SHARED with the UniDepth port:
    `flexam_tpu.perception.unidepth.encode_image`) over multi-depth
    feature slices;
  * a convolutional upsampling head emitting an affine-invariant point
    map (z known only up to a global shift), validity mask and (v2) a
    metric-scale scalar from the cls token;
  * camera recovery: MoGe's focal/shift optimization — the focal and the
    global z-shift are solved jointly from the point map itself by
    minimizing reprojection error to the pixel grid (closed-form optimal
    focal per candidate shift, golden-section over the shift). This
    solver is exact math, tested for exact recovery on synthetic pinhole
    scenes; the network part is shape-faithful with a best-effort
    checkpoint mapper (the source being absent, names are unknowable).

Fixtures (`--moge_npz`) remain the parity-safe path; this makes the
image path RUNNABLE end-to-end without them once weights exist
(FLEXAM_MOGE_CKPT).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.core.layers import linear, linear_init
from flexam_tpu.perception.unidepth import (UniDepthV2Config, _conv2d,
                                            _conv_init, _gelu, _ln,
                                            _ln_init, _resize_bilinear,
                                            encode_image, encoder_init)


@dataclass(frozen=True)
class MoGeConfig:
    # encoder (DINOv2 ViT-L/14 like the vitl checkpoints)
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    num_register_tokens: int = 4
    output_idx: Tuple[int, ...] = (5, 12, 18, 24)
    pretrain_img_size: int = 518
    # head
    head_dim: int = 256
    num_upsamples: int = 2          # grid -> 4x grid, then resize to H,W
    predict_normal: bool = True     # the "-normal" variants
    # infer-time pixel budget (multiple-of-14 resize like the encoder)
    pixels_min: int = 200_000
    pixels_max: int = 600_000

    def encoder_cfg(self) -> UniDepthV2Config:
        return UniDepthV2Config(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            num_register_tokens=self.num_register_tokens,
            output_idx=self.output_idx,
            pretrain_img_size=self.pretrain_img_size)


# ---------------------------------------------------------------------------
# head
# ---------------------------------------------------------------------------


def head_init(key, cfg: MoGeConfig) -> dict:
    keys = iter(jax.random.split(key, 16))
    d = cfg.head_dim
    out_ch = 3 + 1 + (3 if cfg.predict_normal else 0)   # points+mask(+normal)
    p = {
        "proj": [linear_init(next(keys), cfg.embed_dim, d)
                 for _ in cfg.output_idx],
        "level_w": jnp.zeros((len(cfg.output_idx),)),
        "ups": [],
        "out_norm": _ln_init(d // (2 ** cfg.num_upsamples)),
        "out_conv": _conv_init(next(keys), 3, 3,
                               d // (2 ** cfg.num_upsamples), out_ch),
        "scale_head": linear_init(next(keys), cfg.embed_dim, 1),
    }
    cur = d
    for _ in range(cfg.num_upsamples):
        p["ups"].append({
            "conv1": _conv_init(next(keys), 3, 3, cur, cur),
            "conv2": _conv_init(next(keys), 3, 3, cur, cur // 2),
        })
        cur //= 2
    return p


def run_head(p: dict, feats, clss, out_hw, cfg: MoGeConfig):
    """feats: per-slice [B, h, w, C] -> (raw point map [B, H, W, 3],
    mask logits [B, H, W], normal [B, H, W, 3] | None, log-scale [B])."""
    w = jax.nn.softmax(p["level_w"])
    x = sum(w[i] * linear(f, p["proj"][i]) for i, f in enumerate(feats))
    for up in p["ups"]:
        x = _gelu(_conv2d(x, up["conv1"]))
        x = _conv2d(x, up["conv2"])
        b, h, ww, c = x.shape
        x = _resize_bilinear(x, (2 * h, 2 * ww))
    x = _resize_bilinear(x, out_hw)
    x = _ln(x, p["out_norm"])
    out = _conv2d(x, p["out_conv"])
    pts = out[..., :3].astype(jnp.float32)
    # z parameterized positive-ish via exp on the 3rd channel (shift-free
    # scale ambiguity is resolved by the solver anyway)
    pts = jnp.concatenate(
        [pts[..., :2], jnp.exp(jnp.clip(pts[..., 2:], -8, 8))], axis=-1)
    mask_logits = out[..., 3].astype(jnp.float32)
    normal = None
    if cfg.predict_normal:
        n = out[..., 4:7].astype(jnp.float32)
        normal = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True),
                              1e-6)
    log_scale = linear(clss[-1][:, 0], p["scale_head"]
                       ).astype(jnp.float32)[..., 0]
    return pts, mask_logits, normal, log_scale


def moge_init(key, cfg: MoGeConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {"encoder": encoder_init(k1, cfg.encoder_cfg()),
            "head": head_init(k2, cfg)}


@partial(jax.jit, static_argnums=(2, 3))
def _forward_jit(params, x, out_hw, cfg: MoGeConfig):
    feats, clss = encode_image(params["encoder"], x, cfg.encoder_cfg())
    return run_head(params["head"], feats, clss, out_hw, cfg)


# ---------------------------------------------------------------------------
# camera recovery: focal + z-shift from the affine-invariant point map
# ---------------------------------------------------------------------------


def recover_focal_shift(points: np.ndarray, mask: Optional[np.ndarray],
                        iters: int = 48) -> Tuple[float, float]:
    """MoGe's camera recovery: the net's point map (x, y, z) is correct up
    to a global z-shift dz; the true camera satisfies
        x / (z + dz) = (u - cx) / f,   y / (z + dz) = (v - cy) / f
    over the pixel grid in NORMALIZED image coords. For a candidate dz
    the optimal 1/f is closed-form least squares; dz is found by
    golden-section search on the residual. Returns (focal, shift) with
    focal normalized by the half image diagonal-ish convention below
    (we keep everything in the same normalized units the caller uses).

    Exact on noiseless pinhole data (tested)."""
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    h, w = points.shape[:2]
    # normalized pixel grid, origin at the principal point (center),
    # scaled so the longer side spans [-1, 1] — MoGe's uv convention
    s = max(h, w) / 2.0
    us = (np.arange(w) + 0.5 - w / 2.0) / s
    vs = (np.arange(h) + 0.5 - h / 2.0) / s
    gu, gv = np.meshgrid(us, vs, indexing="xy")
    uv = np.stack([gu.reshape(-1), gv.reshape(-1)], axis=1)
    m = (np.ones(len(pts), bool) if mask is None
         else np.asarray(mask).reshape(-1).astype(bool))
    m &= np.isfinite(pts).all(axis=1)
    pts, uv = pts[m], uv[m]
    if len(pts) < 8:
        return 1.0, 0.0
    xy = pts[:, :2].reshape(-1)
    z = pts[:, 2]
    zmin = float(z.min())

    def residual(dz):
        denom = np.repeat(z + dz, 2)
        a = uv.reshape(-1) * denom                    # (u,v)*(z+dz)
        s_opt = float(a @ xy) / max(float(a @ a), 1e-12)   # = 1/f
        r = s_opt * a - xy
        return float(r @ r), 1.0 / max(s_opt, 1e-9)

    # golden-section over dz in (zmin*(-1)+eps, +range): z+dz must stay > 0
    lo = -zmin + 1e-6
    hi = -zmin + 10.0 * max(float(z.max() - zmin), 1e-3) + 1.0
    gr = (math.sqrt(5.0) - 1.0) / 2.0
    a_, b_ = lo, hi
    c_ = b_ - gr * (b_ - a_)
    d_ = a_ + gr * (b_ - a_)
    fc, _ = residual(c_)
    fd, _ = residual(d_)
    for _ in range(iters):
        if fc < fd:
            b_, d_, fd = d_, c_, fc
            c_ = b_ - gr * (b_ - a_)
            fc, _ = residual(c_)
        else:
            a_, c_, fc = c_, d_, fd
            d_ = a_ + gr * (b_ - a_)
            fd, _ = residual(d_)
    dz = (a_ + b_) / 2.0
    _, f = residual(dz)
    return float(f), float(dz)


# ---------------------------------------------------------------------------
# model wrapper
# ---------------------------------------------------------------------------


class MoGeModel:
    """`MoGeModel.infer(img)` drop-in: img [3, H, W] (or [H, W, 3]) in
    0..1 -> {"points" [H,W,3] camera-frame metric points, "depth" [H,W],
    "mask" [H,W] bool, "intrinsics" [3,3] NORMALIZED (fx, cx in units of
    width / height like MoGe), "normal" [H,W,3] when configured}."""

    def __init__(self, cfg: Optional[MoGeConfig] = None, params=None,
                 seed: int = 0):
        self.cfg = cfg or MoGeConfig()
        self.params = params if params is not None else moge_init(
            jax.random.key(seed), self.cfg)
        self.load_report = None    # set by load_moge
        self.load_ok = False

    def to(self, *a, **k):
        return self

    def eval(self):
        return self

    @classmethod
    def from_pretrained(cls, path: str, cfg: Optional[MoGeConfig] = None):
        return load_moge(path, cfg)

    def infer(self, img, **kw):
        cfg = self.cfg
        arr = np.asarray(img, np.float32)
        if arr.ndim == 3 and arr.shape[0] == 3:
            arr = arr.transpose(1, 2, 0)
        h, w, _ = arr.shape
        # contract: 0..1 input, like the reference's
        # `moge.infer(first_frame)` (`demo.py:220-223`) — no max()
        # heuristic (it would mis-scale near-black frames)
        # resize so H*W lands in the pixel budget, multiple of 14
        n = h * w
        target = min(cfg.pixels_max, max(cfg.pixels_min, n))
        f = (target / n) ** 0.5
        ps = cfg.patch_size
        nh = max(ps, int(round(h * f / ps)) * ps)
        nw = max(ps, int(round(w * f / ps)) * ps)
        x = jnp.asarray((arr - 0.5) / 0.5)[None]
        x = _resize_bilinear(x, (nh, nw))
        pts, mask_logits, normal, log_scale = _forward_jit(
            self.params, x, (nh, nw), cfg)
        pts = np.asarray(_resize_bilinear(pts, (h, w)))[0]
        mask = np.asarray(_resize_bilinear(
            mask_logits[..., None], (h, w)))[0, ..., 0] > 0.0
        focal, dz = recover_focal_shift(pts, mask)
        scale = float(np.exp(np.asarray(log_scale))[0])
        points = pts.copy()
        points[..., 2] += dz
        points *= scale
        # normalized intrinsics in MoGe's convention: fx normalized by
        # width, fy by height, principal point at the center
        s = max(h, w) / 2.0
        fx = focal * s / w
        fy = focal * s / h
        intr = np.asarray([[fx, 0, 0.5], [0, fy, 0.5], [0, 0, 1]],
                          np.float32)
        out = {"points": points.astype(np.float32),
               "depth": points[..., 2].astype(np.float32),
               "mask": mask,
               "intrinsics": intr}
        if normal is not None:
            out["normal"] = np.asarray(
                _resize_bilinear(normal, (h, w)))[0].astype(np.float32)
        return out


def load_moge(path: str, cfg: Optional[MoGeConfig] = None,
              coverage_threshold: float = 0.9) -> MoGeModel:
    """Best-effort checkpoint load (shape-signature mapping like
    `load_densetrack3d` — the MoGe source is absent from the snapshot, so
    exact names are unknowable; unmatched tensors are reported).

    A mapping below `coverage_threshold` RAISES (per-module table printed
    first) instead of silently serving scrambled weights; set
    FLEXAM_MOGE_BESTEFFORT=1 to opt into a partial load (ADVICE r2)."""
    import os
    from flexam_tpu.io.verify_load import check_mapping
    from flexam_tpu.perception.densetrack3d import map_torch_state_dict
    model = MoGeModel(cfg)
    if os.path.isdir(path):
        for name in ("model.pt", "model.safetensors", "pytorch_model.bin"):
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
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if "model" in sd:
            sd = sd["model"]
        sd = {k: v.float().numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
    model.params, report = map_torch_state_dict(model.params, sd)
    model.load_report = report
    print(f"moge: mapped {len(report['loaded'])} tensors, "
          f"{len(report['missed'])} unmatched (best-effort)")
    model.load_ok = check_mapping(report, quiet=True,
                                  threshold=coverage_threshold)
    if not model.load_ok:
        check_mapping(report, name=f"moge[{path}]",
                      threshold=coverage_threshold)
        if os.environ.get("FLEXAM_MOGE_BESTEFFORT") != "1":
            raise ValueError(
                f"moge checkpoint {path} mapped below "
                f"{coverage_threshold:.0%} coverage — refusing to serve "
                "scrambled weights (set FLEXAM_MOGE_BESTEFFORT=1 to "
                "accept the partial load)")
        print("WARNING: FLEXAM_MOGE_BESTEFFORT=1 — proceeding with a "
              "LOW-COVERAGE moge load; unmatched modules stay random")
    return model
