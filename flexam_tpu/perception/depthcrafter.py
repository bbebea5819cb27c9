"""DepthCrafter video-depth surface (reference `pipelines.py:1307-1360`,
`predict_depthcrafter`) — the LAST §2.6 inventory item.

The reference keeps this branch DISABLED (`use_depthcrafter=False`,
`pipelines.py:1407`) and the model itself — a video-diffusion (SVD-family
UNet) checkpoint from the external DepthCrafter release — is neither
vendored in the snapshot nor loadable here (external weights, like FLUX).
What IS in the snapshot, and what this module ports exactly, is the full
calling surface around that external pipe:

  * the 64-multiple resize rules with the `max_res` cap,
  * the windowed diffusion driver contract (`window_size=110, overlap=25,
    guidance_scale=1.2, num_inference_steps=25`),
  * the three-channel -> mono reduction, whole-video min-max
    normalization, and nearest-neighbor restore to the original size.

The denoiser slot is injectable: pass the real DepthCrafter pipeline's
forward (or any callable mapping frames [T,h,w,3] in [0,1] -> [T,h,w,C]
diffusion output) and you get the reference behavior byte-for-byte
(oracle-tested against the actual reference method with a shared fake
pipe). Without one, a documented SUBSTITUTE denoiser renders depth from
the repo's native depth stack (UniDepth/ZoeDepth/...) so the
"depthcrafter" backend remains runnable end-to-end; it prints what it is.

Windows larger than `window_size` are split with `overlap` frames of
linear cross-fade — the external pipe's published overlap-blend behavior
— so arbitrarily long clips run in bounded memory.
"""

from __future__ import annotations

import sys
from typing import Callable, Optional

import numpy as np


def _resize_dims(orig_h: int, orig_w: int, max_res: int) -> tuple:
    """The reference's exact sizing rules (`pipelines.py:1311-1327`):
    round each side to a 64-multiple; if that exceeds `max_res`, rescale
    from the ORIGINAL size before rounding."""
    height = round(orig_h / 64) * 64
    width = round(orig_w / 64) * 64
    if max(height, width) > max_res:
        scale = max_res / max(orig_h, orig_w)
        height = round(orig_h * scale / 64) * 64
        width = round(orig_w * scale / 64) * 64
    if width <= 0 or height <= 0:
        raise ValueError(f"Invalid dimensions: {width}x{height}")
    return height, width


def _substitute_denoiser(frames: np.ndarray, guidance_scale: float,
                         num_inference_steps: int) -> np.ndarray:
    """Stand-in for the external DepthCrafter pipe: the repo's native
    depth stack, tiled to the pipe's 3-channel output contract."""
    from flexam_tpu.perception.depth import estimate_depth
    print("WARNING: DepthCrafter checkpoint is external (the reference "
          "ships it as a disabled branch); using the native depth stack "
          "as the denoiser substitute", file=sys.stderr)
    d = estimate_depth(frames)
    d = d.astype(np.float32)
    return np.repeat(d[..., None], 3, axis=-1)


def predict_depthcrafter(
    video: np.ndarray,
    denoiser: Optional[Callable] = None,
    max_res: int = 1024,
    guidance_scale: float = 1.2,
    num_inference_steps: int = 25,
    window_size: int = 110,
    overlap: int = 25,
) -> np.ndarray:
    """Reference-exact DepthCrafter surface (`pipelines.py:1307-1360`).

    video: [T, 3, H, W] (the reference contract) or [T, H, W, 3], any
    range ([0,255] or [0,1] floats both fine — the /255 happens only for
    inputs that look like pixel bytes, matching the reference which
    always receives 0..255 tensors). Returns depth [T, H, W] float32 in
    [0, 1], nearest-resized to the original geometry.
    """
    import cv2

    v = np.asarray(video)
    if v.ndim != 4:
        raise ValueError(f"expected 4D video, got {v.shape}")
    if v.shape[1] == 3 and v.shape[-1] != 3:
        v = v.transpose(0, 2, 3, 1)
    ori_h, ori_w = v.shape[1], v.shape[2]
    height, width = _resize_dims(ori_h, ori_w, max_res)

    frames = np.empty((v.shape[0], height, width, 3), np.float32)
    for i, frame in enumerate(np.asarray(v, np.float32)):
        frames[i] = cv2.resize(frame, (width, height))
    if frames.max() > 1.5:            # pixel-byte input, as the reference
        frames = frames / 255.0       # always has (`frame.astype/255`)

    fn = denoiser if denoiser is not None else _substitute_denoiser

    t = frames.shape[0]
    if t <= window_size:
        res = np.asarray(fn(frames, guidance_scale=guidance_scale,
                            num_inference_steps=num_inference_steps),
                         np.float32)
    else:
        # overlap-blend windows: linear cross-fade over the shared frames
        # (the external pipe's published latent-overlap behavior, run
        # here in output space so any denoiser composes)
        res = None
        start = 0
        while True:
            end = min(start + window_size, t)
            piece = np.asarray(
                fn(frames[start:end], guidance_scale=guidance_scale,
                   num_inference_steps=num_inference_steps), np.float32)
            if res is None:
                res = piece
            else:
                ov = res.shape[0] - start          # shared frame count
                w_new = (np.arange(1, ov + 1, dtype=np.float32)
                         / (ov + 1))[:, None, None, None]
                res[start:] = res[start:] * (1 - w_new) + piece[:ov] * w_new
                res = np.concatenate([res, piece[ov:]], axis=0)
            if end == t:
                break
            start = end - overlap
    # three-channel -> mono, whole-video min-max, nearest restore
    # (`pipelines.py:1353-1358`)
    res = res.sum(-1) / res.shape[-1]
    res = (res - res.min()) / (res.max() - res.min())
    # torch F.interpolate(mode="nearest") semantics exactly: floor index
    # (cv2's INTER_NEAREST rounds differently on even scale boundaries)
    ih = np.minimum((np.arange(ori_h) * (height / ori_h)).astype(np.int64),
                    height - 1)
    iw = np.minimum((np.arange(ori_w) * (width / ori_w)).astype(np.int64),
                    width - 1)
    return np.ascontiguousarray(res[:, ih[:, None], iw[None, :]]
                                ).astype(np.float32)


def _depthcrafter_backend(video: np.ndarray, **kw) -> np.ndarray:
    """Registry adapter: video [T,H,W,3] float 0..1 -> depth [T,H,W].

    With FLEXAM_DEPTHCRAFTER_CKPT + FLEXAM_SVD_VAE set, the denoiser is
    the NATIVE SVD spatio-temporal UNet diffusion loop
    (`perception/depthcrafter_model.py`); otherwise the documented
    depth-stack substitute."""
    import os
    if (kw.get("denoiser") is None
            and os.environ.get("FLEXAM_DEPTHCRAFTER_CKPT")):
        from flexam_tpu.perception.depthcrafter_model import (
            load_depthcrafter_denoiser)
        kw["denoiser"] = load_depthcrafter_denoiser()
    return predict_depthcrafter(video, **kw)
