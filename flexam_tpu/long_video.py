"""Long-video generation via overlapped sliding windows.

Behavioral reference: the Gradio "Long Video Generation" mode
(`FlexAM/ui/cogvideox_fun_ui.py:214-270`, parameters `partial_video_length`
/ `overlap_video_length` exposed at `ui/controller.py:324-325`): generate
`partial` frames per window; each later window is seeded with the previous
window's last `overlap` frames (known-frame conditioning) and the overlap
region is linearly cross-faded.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def generate_long_video(
    generate_window: Callable[..., np.ndarray],
    total_frames: int,
    partial_video_length: int,
    overlap_video_length: int,
    temporal_compression: int = 4,
    start_frames: Optional[np.ndarray] = None,   # [1, 3, k, H, W] in [0,1]
    **window_kwargs,
) -> np.ndarray:
    """Drive `generate_window(video, mask_video, num_frames, **kw)` across
    overlapping windows. `video`/`mask_video` follow the pipeline layout
    ([1,3,T,H,W] in [0,1]; mask 1 = generate). Returns [1,3,total,H,W]."""
    assert overlap_video_length < partial_video_length
    out = None
    init_frames = 0
    seed_frames = start_frames
    while init_frames < total_frames:
        # a window that would reach past the end is the FINAL one: snap
        # it to 4k+1 and stop after it, even when the snap leaves it
        # short of total_frames (`cogvideox_fun_ui.py:216-262` exactly —
        # also what keeps a snapped window <= overlap from stalling the
        # advance, which steps by window - overlap otherwise)
        final = init_frames + partial_video_length >= total_frames
        if final:
            window = ((total_frames - init_frames - 1)
                      // temporal_compression * temporal_compression) + 1
            if window <= 0:
                break
        else:
            window = partial_video_length

        sample = generate_window(
            start_frames=seed_frames, num_frames=window,
            frame_offset=init_frames, **window_kwargs)
        sample = np.array(sample, copy=True)

        if out is None:
            out = sample
        else:
            ov = overlap_video_length
            mix = (np.arange(ov, dtype=np.float32) / ov
                   )[None, None, :, None, None]
            out[:, :, -ov:] = out[:, :, -ov:] * (1 - mix) \
                + sample[:, :, :ov] * mix
            out = np.concatenate([out, sample[:, :, ov:]], axis=2)

        if final:
            break
        seed_frames = out[:, :, -overlap_video_length:]
        init_frames += window - overlap_video_length
    return out


def window_inputs_from_seed(seed_frames: Optional[np.ndarray],
                            num_frames: int, height: int, width: int):
    """Build (video, mask) for one window: the seed frames are known
    (mask 0), the rest generated (mask 1) — the multi-start-image branch
    of `get_image_to_video_latent` (`utils.py:318-331`)."""
    video = np.zeros((1, 3, num_frames, height, width), np.float32)
    mask = np.ones((1, 1, num_frames, height, width), np.float32)
    if seed_frames is not None:
        k = seed_frames.shape[2]
        video[:, :, :k] = seed_frames
        video[:, :, k:] = seed_frames[:, :, -1:]
        mask[:, :, :k] = 0.0
    return video, mask
