"""Pi3 — permutation-equivariant multi-view pose/geometry model, native.

The reference's video camera path runs
`Pi3.from_pretrained("yyfz233/Pi3")(imgs[None]) -> pred['camera_poses']
[B, N, 4, 4]` (c2w) inside `CameraMotionGenerator.process_video_file`
(`/root/reference/pipelines.py:259-321`), then converts c2w -> w2c with
`se3_inverse` and synthesizes intrinsics from a fixed 55-degree FoV. The
Pi3 submodule is EMPTY in the snapshot (SURVEY.md §2.6), so — like
DenseTrack3D and MoGe — this is an original TPU-native implementation of
the published architecture family (arXiv 2507.13347: DINOv2 encoder +
alternating view-local/global attention decoder + pose/point heads)
behind the exact call surface the reference consumes:

  * `Pi3.from_pretrained(...)`: classmethod; loads FLEXAM_PI3_CKPT (or a
    local path) via the shape-signature mapper with coverage gating
    (`io.verify_load`), else random init with a loud warning;
  * `model(imgs[None])` with imgs [N, 3, H, W] in 0..1 -> dict with
    `camera_poses` [B, N, 4, 4] c2w (plus `points`/`conf` per view);
  * `load_images_as_tensor(path, interval=1)` -> [N, 3, H, W].

Permutation equivariance — the architecture's defining property — holds
by construction: views interact only through order-agnostic global
attention (no view-index encoding), so permuting input views permutes
the output poses identically (tested in tests/test_pi3.py with random
weights; no checkpoint needed to verify the property).

Pose parameterization: quaternion (w, x, y, z) + translation from a
per-view attention-pooled feature, biased to identity at init so an
untrained model emits near-identity poses instead of garbage rotations.
The downstream conversion lives in `perception.poses
pi3_poses_to_extri_intri` (se3_inverse + 55-degree FoV intrinsics).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.core.layers import linear, linear_init
from flexam_tpu.perception.unidepth import (UniDepthV2Config, _attn_block,
                                            _attn_block_init, _conv_init,
                                            _gelu, _ln, _ln_init,
                                            encode_image, encoder_init)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class Pi3Config:
    # encoder: DINOv2 ViT-L/14 (shared family with the UniDepth/MoGe ports)
    patch_size: int = 14
    embed_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    num_register_tokens: int = 4
    pretrain_img_size: int = 518
    # decoder: alternating view-local / global attention
    dec_dim: int = 1024
    dec_depth: int = 12            # pairs of (frame, global) blocks
    dec_heads: int = 16
    mlp_expansion: int = 4
    # inference resize target (multiple of patch_size); the reference
    # requests width=672, height=384 -> snapped to /14
    infer_hw: Tuple[int, int] = (378, 672)
    compute: str = "float32"

    def encoder_cfg(self) -> UniDepthV2Config:
        return UniDepthV2Config(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.enc_depth, num_heads=self.enc_heads,
            num_register_tokens=self.num_register_tokens,
            output_idx=(self.enc_depth,),
            pretrain_img_size=self.pretrain_img_size)


def pi3_init(key, cfg: Pi3Config) -> dict:
    ks = jax.random.split(key, cfg.dec_depth * 2 + 8)
    p = {
        "encoder": encoder_init(ks[0], cfg.encoder_cfg()),
        "proj_in": linear_init(ks[1], cfg.embed_dim, cfg.dec_dim),
        "dec_frame": [
            _attn_block_init(ks[2 + 2 * i], cfg.dec_dim,
                             cfg.mlp_expansion, cfg.dec_heads, 0.0)
            for i in range(cfg.dec_depth)],
        "dec_global": [
            _attn_block_init(ks[3 + 2 * i], cfg.dec_dim,
                             cfg.mlp_expansion, cfg.dec_heads, 0.0)
            for i in range(cfg.dec_depth)],
        "dec_norm": _ln_init(cfg.dec_dim),
        # camera head: learnable query attends over a view's tokens
        "cam_query": jax.random.normal(
            ks[2 + 2 * cfg.dec_depth], (1, 1, cfg.dec_dim)) * 0.02,
        "cam_pool": _attn_block_init(ks[3 + 2 * cfg.dec_depth], cfg.dec_dim,
                                     cfg.mlp_expansion, cfg.dec_heads, 0.0),
        "cam_fc1": linear_init(ks[4 + 2 * cfg.dec_depth], cfg.dec_dim,
                               cfg.dec_dim),
        # 7 outputs: quat wxyz + translation; zero-init the final layer so
        # init poses are exactly identity (quat bias below)
        "cam_fc2": {"weight": jnp.zeros((7, cfg.dec_dim)),
                    "bias": jnp.zeros((7,))},
        # point head: per-token linear -> patch of 3D points + confidence
        "pt_fc1": linear_init(ks[5 + 2 * cfg.dec_depth], cfg.dec_dim,
                              cfg.dec_dim),
        "pt_fc2": linear_init(ks[6 + 2 * cfg.dec_depth], cfg.dec_dim,
                              cfg.patch_size * cfg.patch_size * 4),
    }
    return p


def _quat_trans_to_c2w(qt: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] (quat wxyz biased to identity + trans) -> [..., 4, 4]."""
    quat = qt[..., :4] + jnp.asarray([1.0, 0, 0, 0], qt.dtype)  # identity bias
    t = qt[..., 4:7]
    q = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(qt.shape[:-1] + (3, 3))
    top = jnp.concatenate([R, t[..., None]], axis=-1)           # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0, 0, 0, 1], qt.dtype), qt.shape[:-1] + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def pi3_forward(params: dict, cfg: Pi3Config, imgs: jnp.ndarray) -> dict:
    """imgs [B, N, 3, H, W] in 0..1 -> {"camera_poses" [B, N, 4, 4],
    "points" [B, N, H, W, 3], "conf" [B, N, H, W, 1]}."""
    b, n, _, h, w = imgs.shape
    dtype = jnp.bfloat16 if cfg.compute == "bfloat16" else jnp.float32
    x = imgs.transpose(0, 1, 3, 4, 2).reshape(b * n, h, w, 3)
    x = ((x - jnp.asarray(_IMAGENET_MEAN, x.dtype))
         / jnp.asarray(_IMAGENET_STD, x.dtype)).astype(dtype)

    feats, _ = encode_image(params["encoder"], x, cfg.encoder_cfg())
    f = feats[-1]                                       # [B*N, h0, w0, C]
    h0, w0 = f.shape[1], f.shape[2]
    ptoks = h0 * w0
    tok = linear(f.reshape(b * n, ptoks, cfg.embed_dim), params["proj_in"])

    # alternating view-local / order-agnostic global attention (the
    # permutation-equivariant core: no view-index encoding anywhere)
    for fp, gp in zip(params["dec_frame"], params["dec_global"]):
        tok = _attn_block(fp, tok, cfg.dec_heads)               # per view
        tok = tok.reshape(b, n * ptoks, cfg.dec_dim)
        tok = _attn_block(gp, tok, cfg.dec_heads)               # all views
        tok = tok.reshape(b * n, ptoks, cfg.dec_dim)
    tok = _ln(tok, params["dec_norm"])

    # camera head: query-token attention pool per view -> quat+trans
    q = jnp.broadcast_to(params["cam_query"].astype(tok.dtype),
                         (b * n, 1, cfg.dec_dim))
    pooled = _attn_block(params["cam_pool"], q, cfg.dec_heads,
                         context=tok)[:, 0]                     # [B*N, D]
    qt = linear(_gelu(linear(pooled.astype(jnp.float32),
                             _f32(params["cam_fc1"]))),
                _f32(params["cam_fc2"]))
    poses = _quat_trans_to_c2w(qt).reshape(b, n, 4, 4)

    # point head: per-token patch of (xyz, conf)
    pt = linear(_gelu(linear(tok, params["pt_fc1"])), params["pt_fc2"])
    ps = cfg.patch_size
    pt = pt.reshape(b * n, h0, w0, ps, ps, 4)
    pt = pt.transpose(0, 1, 3, 2, 4, 5).reshape(b, n, h0 * ps, w0 * ps, 4)
    return {
        "camera_poses": poses.astype(jnp.float32),
        "points": pt[..., :3].astype(jnp.float32),
        "conf": jax.nn.sigmoid(pt[..., 3:4]).astype(jnp.float32),
    }


def _f32(lin):
    out = {"weight": lin["weight"].astype(jnp.float32)}
    if "bias" in lin:
        out["bias"] = lin["bias"].astype(jnp.float32)
    return out


class Pi3:
    """Reference call surface (`pipelines.py:276-290`)."""

    def __init__(self, cfg: Optional[Pi3Config] = None, seed: int = 0):
        self.cfg = cfg or Pi3Config()
        self.params = pi3_init(jax.random.key(seed), self.cfg)
        self.load_report = None
        self.load_ok = False
        self._jit = jax.jit(lambda p, x: pi3_forward(p, self.cfg, x))

    # torch-API shims (the reference does .to(device).eval())
    def to(self, *a, **k):
        return self

    def eval(self):
        return self

    def cuda(self):
        return self

    @classmethod
    def from_pretrained(cls, name_or_path: str = "yyfz233/Pi3",
                        cfg: Optional[Pi3Config] = None) -> "Pi3":
        path = None
        if os.path.exists(str(name_or_path)):
            path = str(name_or_path)
        elif os.environ.get("FLEXAM_PI3_CKPT"):
            path = os.environ["FLEXAM_PI3_CKPT"]
        model = cls(cfg)
        if path:
            load_pi3(path, model)
        else:
            print("WARNING: no Pi3 weights found (set FLEXAM_PI3_CKPT) — "
                  "random-weight Pi3 emits near-identity poses; the "
                  "track-based Kabsch solver (perception.pose_solver) is "
                  "the better no-checkpoint fallback")
        return model

    def __call__(self, imgs) -> dict:
        x = jnp.asarray(np.asarray(imgs), jnp.float32)
        if x.ndim == 4:
            x = x[None]
        if x.ndim != 5:
            raise ValueError("imgs must be [N, 3, H, W] or [B, N, 3, H, W]")
        return {k: np.asarray(v) for k, v in
                self._jit(self.params, x).items()}


def load_pi3(path: str, model: Optional[Pi3] = None,
             coverage_threshold: float = 0.9) -> Pi3:
    """Shape-signature checkpoint mapping with coverage gating (the Pi3
    source is absent from the snapshot, so names are unknowable — same
    policy as `load_densetrack3d`/`load_moge`)."""
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
    model = model or Pi3()
    model.params, report = map_torch_state_dict(model.params, sd)
    model.load_report = report
    model.load_ok = check_mapping(report, quiet=True,
                                  threshold=coverage_threshold)
    print(f"pi3: mapped {len(report['loaded'])} tensors, "
          f"{len(report['missed'])} unmatched (best-effort)")
    if not model.load_ok:
        check_mapping(report, name=f"pi3[{path}]",
                      threshold=coverage_threshold)
        print("WARNING: pi3 checkpoint mapping is LOW-COVERAGE — "
              "unmatched modules stay at random init")
    return model


def load_images_as_tensor(path: str, interval: int = 1,
                          target_hw: Optional[Tuple[int, int]] = None
                          ) -> np.ndarray:
    """Video file -> [N, 3, H, W] float32 in 0..1, every `interval`-th
    frame, resized to a patch-multiple target (the Pi3 loader surface,
    `pipelines.py:281`)."""
    import cv2

    hw = target_hw or Pi3Config().infer_hw
    # utils.media.save_video falls back to .npz raw frames when no video
    # encoder exists in the environment; accept those transparently
    npz = path if path.endswith(".npz") else (
        path + ".npz" if os.path.exists(path + ".npz")
        and not os.path.exists(path) else None)
    if npz and os.path.exists(npz):
        raw = np.load(npz)["video"]                     # [T, H, W, 3] u8
        frames = [cv2.resize(f, (hw[1], hw[0]),
                             interpolation=cv2.INTER_AREA)
                  for f in raw[::interval]]
        arr = np.stack(frames).astype(np.float32) / 255.0
        return arr.transpose(0, 3, 1, 2)
    cap = cv2.VideoCapture(path)
    frames = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % interval == 0:
            frame = cv2.resize(frame, (hw[1], hw[0]),
                               interpolation=cv2.INTER_AREA)
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        i += 1
    cap.release()
    if not frames:
        # cv2 codec coverage varies; fall back to imageio (the backend
        # utils.media.save_video writes with)
        try:
            import imageio
            for i, frame in enumerate(imageio.mimread(path, memtest=False)):
                if i % interval == 0:
                    frames.append(cv2.resize(np.asarray(frame)[..., :3],
                                             (hw[1], hw[0]),
                                             interpolation=cv2.INTER_AREA))
        except Exception:
            pass
    if not frames:
        raise ValueError(f"no frames read from {path}")
    arr = np.stack(frames).astype(np.float32) / 255.0
    return arr.transpose(0, 3, 1, 2)


def pi3_video_poses(video: np.ndarray, model: Optional[Pi3] = None,
                    chunk: int = 8) -> np.ndarray:
    """[T, H, W, 3] (or [T, 3, H, W]) 0..1 -> c2w poses [T, 4, 4].

    Views are processed in ONE forward (global attention needs all views
    jointly); `chunk` resizes long clips by striding frames to bound the
    N*P global-attention cost, then interpolates poses back — the
    track-based solver is the precision path, this is the learned one."""
    v = np.asarray(video, np.float32)
    if v.ndim == 4 and v.shape[-1] == 3:
        v = v.transpose(0, 3, 1, 2)
    t = v.shape[0]
    model = model or Pi3.from_pretrained()
    hw = model.cfg.infer_hw
    import cv2
    resized = np.stack([
        cv2.resize(f.transpose(1, 2, 0), (hw[1], hw[0]),
                   interpolation=cv2.INTER_AREA).transpose(2, 0, 1)
        for f in v])
    stride = max(1, int(np.ceil(t / (chunk * 4))))
    idx = np.arange(0, t, stride)
    if idx[-1] != t - 1:
        idx = np.concatenate([idx, [t - 1]])
    pred = model(resized[idx])
    poses = pred["camera_poses"][0]                    # [len(idx), 4, 4]
    if len(idx) == t:
        return poses
    # nearest rotation + linearly interpolated translation per frame
    out = np.empty((t, 4, 4), np.float32)
    for i in range(t):
        j = np.searchsorted(idx, i, side="right") - 1
        out[i] = poses[min(j, len(idx) - 1)]
    for a in range(3):
        out[:, a, 3] = np.interp(np.arange(t), idx, poses[:, a, 3])
    return out
