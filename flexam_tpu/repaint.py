"""First-frame repainting interface.

Behavioral reference: `pipelines.py:108-193` (`FirstFrameRepainter`):
depth from MoGe / ZoeDepth / Depth-Anything-V2 conditions a
FLUX.1-Depth-dev run (30 steps, cfg 7.5, `:166-173`) to regenerate the
first frame under a new prompt. FLUX and the depth models are external
checkpoints (consumed-as-dependency in the reference too, SURVEY.md §2.6);
here they plug in as callables, and the CLI accepts a precomputed
repainted image (`--repaint img.png`, matching `demo.py:154-155`).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


class FirstFrameRepainter:
    """Orchestrates depth -> repaint. Both stages are injectable:

    depth_fn(image [H, W, 3] uint8) -> depth [H, W] float
    repaint_fn(prompt, control_depth [H, W] float, height, width)
        -> image [H, W, 3] uint8  (the FLUX.1-Depth call, 30 steps cfg 7.5)
    """

    def __init__(self, height: int = 480, width: int = 720,
                 output_dir: str = "outputs",
                 depth_fn: Optional[Callable] = None,
                 repaint_fn: Optional[Callable] = None):
        self.height, self.width = height, width
        self.output_dir = output_dir
        self.depth_fn = depth_fn
        self.repaint_fn = repaint_fn
        os.makedirs(output_dir, exist_ok=True)

    def estimate_depth(self, image: np.ndarray,
                       depth_path: Optional[str] = None) -> np.ndarray:
        """Depth for conditioning: a precomputed map (`depth_path`,
        mirroring `pipelines.py:144-150`) or the injected estimator."""
        if depth_path is not None:
            from PIL import Image
            d = np.array(Image.open(depth_path).convert("L"),
                         np.float32) / 255.0
            if d.shape != (self.height, self.width):
                d = np.array(Image.fromarray(
                    (d * 255).astype(np.uint8)).resize(
                        (self.width, self.height)), np.float32) / 255.0
            return d
        if self.depth_fn is None:
            raise RuntimeError(
                "no depth estimator: pass depth_path, or inject depth_fn "
                "(MoGe/ZoeDepth/Depth-Anything-V2 are external models)")
        return np.asarray(self.depth_fn(image), np.float32)

    def repaint(self, first_frame: np.ndarray, prompt: str,
                depth_path: Optional[str] = None,
                num_inference_steps: int = 30,
                guidance_scale: float = 7.5) -> np.ndarray:
        """first_frame: [3, H, W] float in [0,1] -> repainted [1,3,1,H,W].
        Saves `temp_repainted.png` like the reference (`:176`)."""
        img_u8 = (np.clip(first_frame.transpose(1, 2, 0), 0, 1)
                  * 255).astype(np.uint8)
        depth = self.estimate_depth(img_u8, depth_path)
        if self.repaint_fn is None:
            raise RuntimeError(
                "no repaint backend: inject repaint_fn (FLUX.1-Depth-dev "
                "is an external model) or pass --repaint <image> upstream")
        out = np.asarray(self.repaint_fn(
            prompt, depth, self.height, self.width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale), np.uint8)
        try:
            from PIL import Image
            Image.fromarray(out).save(
                os.path.join(self.output_dir, "temp_repainted.png"))
        except Exception:
            pass
        return (out.astype(np.float32) / 255.0
                ).transpose(2, 0, 1)[None, :, None]


def make_flexam_repaint_fn(pipe, seed: int = 1234):
    """Native repaint backend: depth-conditioned SINGLE-FRAME generation
    with the FlexAM model itself.

    The reference reaches for FLUX.1-Depth-dev (an external image model,
    `pipelines.py:137-173`) because it has no depth-conditioned generator
    of its own — but this stack does: the FlexAM DiT takes a depth
    control stream natively. A 1-frame clip generated with only the
    depth channel active (no tracking, everything masked as "generate")
    is a depth-conditioned image generation using the checkpoints the
    user already has — zero external models.

    Returns a `repaint_fn(prompt, depth, h, w, num_inference_steps=30,
    guidance_scale=7.5) -> uint8 [H, W, 3]` for FirstFrameRepainter.
    """
    def fn(prompt, depth, height, width, num_inference_steps=30,
           guidance_scale=7.5):
        d = np.asarray(depth, np.float32)
        d = (d - d.min()) / max(d.max() - d.min(), 1e-6)
        d3 = np.repeat(d[None], 3, axis=0)[None, :, None]  # [1,3,1,H,W]
        zeros = np.zeros((1, 3, 1, height, width), np.float32)
        out = pipe.generate(
            zeros, prompt,
            mask_video=np.ones((1, 1, 1, height, width), np.float32),
            control_video=zeros, depth_video=d3,
            cos_videos=[zeros] * 4,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, seed=seed, density=0.0)
        frame = np.asarray(out)[0, :, 0].transpose(1, 2, 0)
        return (np.clip(frame, 0, 1) * 255).astype(np.uint8)
    return fn
