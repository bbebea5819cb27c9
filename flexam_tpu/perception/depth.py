"""Depth-estimation backends for video-input conditioning.

The reference runs UniDepth V2 / Depth-Anything-V2 / MoGe here — external
CUDA checkpoints (empty submodules in the snapshot, SURVEY.md §2.6). This
module gives the camera/tracking path a RUNNABLE seam:

  * `register_depth_backend(name, fn)` — plug a real port (a JAX model or
    a host-side ONNX session). fn(video [T,H,W,3] float 0..1, **kw) ->
    depth [T,H,W] float (metric or relative);
  * "onnx" — documented host-side hook: set FLEXAM_DEPTH_ONNX to an ONNX
    depth model path (used only if onnxruntime is importable; it is NOT
    bundled in this image);
  * "luminance" — geometry-free placeholder (inverse luminance as
    pseudo-depth) so smoke paths run end-to-end; clearly NOT a depth
    estimate, prints a warning.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Dict

import numpy as np

DEPTH_BACKENDS: Dict[str, Callable] = {}


def register_depth_backend(name: str, fn: Callable) -> None:
    DEPTH_BACKENDS[name] = fn


def _luminance_depth(video: np.ndarray, **kw) -> np.ndarray:
    print("WARNING: 'luminance' pseudo-depth backend (placeholder; "
          "register a real depth model for geometric accuracy)",
          file=sys.stderr)
    lum = video @ np.array([0.299, 0.587, 0.114], np.float32)
    return 1.0 / (lum + 0.5)


def _onnx_depth(video: np.ndarray, size: int = 384, **kw) -> np.ndarray:
    """Host-side ONNX hook (e.g. a MiDaS/Depth-Anything export)."""
    import cv2
    import onnxruntime as ort   # gated: not bundled; user-provided
    path = os.environ.get("FLEXAM_DEPTH_ONNX")
    if not path:
        raise RuntimeError("set FLEXAM_DEPTH_ONNX=<model.onnx>")
    sess = ort.InferenceSession(path)
    name = sess.get_inputs()[0].name
    t, h, w, _ = video.shape
    out = np.zeros((t, h, w), np.float32)
    for i, frame in enumerate(video):
        x = cv2.resize(frame, (size, size)).transpose(2, 0, 1)[None]
        d = sess.run(None, {name: x.astype(np.float32)})[0][0]
        out[i] = cv2.resize(np.squeeze(d), (w, h))
    return out


def _unidepth_lazy(video: np.ndarray, **kw) -> np.ndarray:
    """UniDepth V2 — the reference's actual depth model
    (`pipelines.py:1393-1405`), ported natively in
    flexam_tpu.perception.unidepth; lazy so the registry import stays
    light. Weights: FLEXAM_UNIDEPTH_CKPT."""
    from flexam_tpu.perception.unidepth import _unidepth_backend
    return _unidepth_backend(video, **kw)


def _zoe_lazy(video: np.ndarray, **kw) -> np.ndarray:
    """ZoeDepth (ZoeD_M12_N) — the `VideoToDepth` annotator's actual
    model (`annotator/nodes.py:153-233`), ported natively in
    flexam_tpu.perception.zoedepth. Weights: FLEXAM_ZOE_CKPT."""
    from flexam_tpu.perception.zoedepth import zoe_depth_video
    return zoe_depth_video(video, **kw)


def _depthcrafter_lazy(video: np.ndarray, **kw) -> np.ndarray:
    """DepthCrafter surface (`pipelines.py:1307-1360`, disabled branch):
    reference-exact pre/post + windowed driver around an injectable
    denoiser (external weights; substitute denoiser by default). See
    flexam_tpu.perception.depthcrafter."""
    from flexam_tpu.perception.depthcrafter import _depthcrafter_backend
    return _depthcrafter_backend(video, **kw)


def _dav2_lazy(video: np.ndarray, **kw) -> np.ndarray:
    """Depth-Anything-V2-Large — the reference repaint's DEFAULT depth
    model ("dav", `pipelines.py:158-161`) and the `VideoToDepth`
    annotator family; native port in
    flexam_tpu.perception.depth_anything. Weights: FLEXAM_DAV2_CKPT."""
    from flexam_tpu.perception.depth_anything import _dav2_backend
    return _dav2_backend(video, **kw)


register_depth_backend("luminance", _luminance_depth)
register_depth_backend("onnx", _onnx_depth)
register_depth_backend("unidepth", _unidepth_lazy)
register_depth_backend("zoe", _zoe_lazy)
register_depth_backend("depthcrafter", _depthcrafter_lazy)
register_depth_backend("dav2", _dav2_lazy)
register_depth_backend("dav", _dav2_lazy)      # the reference's name


def estimate_depth(video: np.ndarray, backend: str = None, **kw
                   ) -> np.ndarray:
    """video [T,H,W,3] float 0..1 (or [1,3,T,H,W]) -> depth [T,H,W]."""
    v = np.asarray(video, np.float32)
    if v.ndim == 5:
        v = v[0].transpose(1, 2, 3, 0)
    if backend is None:
        backend = os.environ.get("FLEXAM_DEPTH_BACKEND") or None
    if backend is None:
        # prefer a real model when its checkpoint is available: UniDepth
        # (the reference pipeline's depth model) first, then ZoeDepth
        # (the VideoToDepth annotator's model)
        uni = os.environ.get("FLEXAM_UNIDEPTH_CKPT")
        zoe = os.environ.get("FLEXAM_ZOE_CKPT")
        dav = os.environ.get("FLEXAM_DAV2_CKPT")
        if uni and os.path.exists(uni):
            backend = "unidepth"
        elif dav and os.path.exists(dav):
            backend = "dav2"
        elif zoe and os.path.exists(zoe):
            backend = "zoe"
        else:
            backend = "luminance"
    if backend not in DEPTH_BACKENDS:
        raise KeyError(f"unknown depth backend {backend!r}; "
                       f"have {sorted(DEPTH_BACKENDS)}")
    return np.asarray(DEPTH_BACKENDS[backend](v, **kw), np.float32)
