"""Media IO: video/image <-> numpy tensors, saving, audio mux.

Behavioral reference: `FlexAM/utils/utils.py` (`get_video_to_video_latent`
:399-470, `get_image_to_video_latent` :303-397, `get_maskvideo_to_video_latent`
:473-517, `get_image_latent` :548-568, `save_videos_grid` :59-88,
`merge_video_audio` :243-301, `color_transfer` :31-57).

All tensors are numpy [B, C, T, H, W] float32 in [0, 1] (the torch-free
counterpart of the reference's layout). sample_size is (height, width).
"""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np


def _read_video_cv2(path: str, sample_size, video_length: Optional[int],
                    fps: Optional[float]) -> np.ndarray:
    import cv2
    cap = cv2.VideoCapture(path)
    frames = []
    original_fps = cap.get(cv2.CAP_PROP_FPS)
    frame_skip = 1 if fps is None else max(1, int(original_fps // fps))
    count = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if count % frame_skip == 0:
            frame = cv2.resize(frame, (sample_size[1], sample_size[0]))
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        count += 1
    cap.release()
    if video_length is not None:
        frames = frames[:video_length]
    return np.stack(frames)


def get_video_input(
    input_video: Union[str, np.ndarray, None],
    video_length: Optional[int],
    sample_size: Tuple[int, int],
    fps: Optional[float] = None,
    validation_video_mask: Optional[str] = None,
    ref_image: Union[str, np.ndarray, None] = None,
):
    """`get_video_to_video_latent` equivalent. Returns
    (video [1,3,T,H,W] in [0,1] | None, mask [1,1,T,H,W] in {0,255} | None,
    ref [1,3,1,H,W] | None)."""
    video = mask = ref = None
    if input_video is not None:
        if isinstance(input_video, str):
            arr = _read_video_cv2(input_video, sample_size, video_length, fps)
        else:
            arr = np.asarray(input_video)[:video_length]
        video = (arr.transpose(3, 0, 1, 2)[None].astype(np.float32) / 255.0)
        if validation_video_mask is not None:
            from PIL import Image
            m = Image.open(validation_video_mask).convert("L").resize(
                (sample_size[1], sample_size[0]))
            m = np.where(np.array(m) < 240, 0, 255).astype(np.float32)
            mask = np.tile(m[None, None, None], (1, 1, video.shape[2], 1, 1))
        else:
            mask = np.full((1, 1) + video.shape[2:], 255.0, np.float32)
    if ref_image is not None:
        ref = get_image_latent(ref_image, sample_size)
    return video, mask, ref


def get_image_to_video_input(
    image_start: Union[str, np.ndarray],
    video_length: int,
    sample_size: Tuple[int, int],
    image_end: Union[str, np.ndarray, None] = None,
):
    """`get_image_to_video_latent` (single-image branch): tile the start
    frame, mask = 0 on frame 0 / 255 after (generate everything else)."""
    start = _load_image(image_start, sample_size)      # [H, W, 3] uint8
    video = np.tile(start.transpose(2, 0, 1)[None, :, None],
                    (1, 1, video_length, 1, 1)).astype(np.float32) / 255.0
    mask = np.zeros((1, 1, video_length) + start.shape[:2], np.float32)
    mask[:, :, 1:] = 255.0
    if image_end is not None:
        end = _load_image(image_end, sample_size)
        video[:, :, -1] = end.transpose(2, 0, 1).astype(np.float32) / 255.0
        mask[:, :, -1] = 0.0
    return video, mask


def get_maskvideo_input(mask_path: str, video_length: int,
                        sample_size: Tuple[int, int],
                        fps: Optional[float] = None) -> np.ndarray:
    """`get_maskvideo_to_video_latent`: read a mask video -> [T, 3, H, W]
    float in [0, 1]."""
    arr = _read_video_cv2(mask_path, sample_size, video_length, fps)
    return arr.transpose(0, 3, 1, 2).astype(np.float32) / 255.0


def _load_image(img, sample_size) -> np.ndarray:
    from PIL import Image
    if isinstance(img, str):
        im = Image.open(img).convert("RGB")
    else:
        im = Image.fromarray(np.asarray(img, np.uint8))
    im = im.resize((sample_size[1], sample_size[0]))
    return np.array(im)


def get_image_latent(ref_image, sample_size,
                     padding: bool = False) -> np.ndarray:
    """`get_image_latent` (:548-568): -> [1, 3, 1, H, W] in [0, 1]."""
    from PIL import Image
    if isinstance(ref_image, str):
        im = Image.open(ref_image).convert("RGB")
    else:
        im = Image.fromarray(np.asarray(np.asarray(ref_image), np.uint8))
    if padding:
        im = _pad_image(im, sample_size[1], sample_size[0])
    im = im.resize((sample_size[1], sample_size[0]))
    arr = np.array(im).astype(np.float32) / 255.0
    return arr.transpose(2, 0, 1)[None, :, None]


def _pad_image(im, new_width, new_height):
    """`padding_image` (:520-546): aspect-preserving letterbox."""
    from PIL import Image
    w, h = im.size
    ratio = min(new_width / w, new_height / h)
    resized = im.resize((int(w * ratio), int(h * ratio)))
    canvas = Image.new("RGB", (new_width, new_height), (255, 255, 255))
    canvas.paste(resized, ((new_width - resized.width) // 2,
                           (new_height - resized.height) // 2))
    return canvas


def save_video(video: np.ndarray, path: str, fps: int = 16):
    """Save [1, 3, T, H, W] or [3, T, H, W] float [0,1] -> mp4.
    Tries imageio (the reference's backend, `utils.py:84-88`), then cv2
    VideoWriter, then falls back to a .npz dump so artifacts are never lost."""
    v = np.asarray(video)
    if v.ndim == 5:
        v = v[0]
    frames = (np.clip(v.transpose(1, 2, 3, 0), 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import imageio
        imageio.mimsave(path, list(frames), fps=fps)
        return path
    except Exception:
        pass
    try:
        import cv2
        h, w = frames.shape[1:3]
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for fr in frames:
            writer.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        writer.release()
        return path
    except Exception as e:
        alt = path + ".npz"
        np.savez_compressed(alt, video=frames, fps=fps)
        print(f"video encoders unavailable ({e}); saved raw frames to {alt}")
        return alt


def save_video_yuv420(luma: np.ndarray, uv: np.ndarray, path: str,
                      fps: int = 16):
    """Write a video straight from the streamed decoder's YUV 4:2:0
    fetch (`vae_decode_streamed_yuv420`: Y [B,T,H,W], UV planar
    [B,T,2,H/2,W/2], limited-range BT.601) with a SINGLE I420->BGR
    conversion per frame — skipping the YUV->RGB->BGR double pass the
    RGB route pays. Falls back to `save_video` via `yuv420_to_rgb`."""
    luma = np.asarray(luma)
    uv = np.asarray(uv)
    if luma.ndim == 4:
        luma, uv = luma[0], uv[0]
    t, h, w = luma.shape
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import cv2
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        buf = np.empty((h + h // 2, w), np.uint8)
        half = uv.reshape(t, 2, -1)
        for i in range(t):
            buf[:h] = luma[i]
            buf[h:h + h // 4] = half[i, 0].reshape(h // 4, w)
            buf[h + h // 4:] = half[i, 1].reshape(h // 4, w)
            writer.write(cv2.cvtColor(buf, cv2.COLOR_YUV2BGR_I420))
        writer.release()
        return path
    except Exception:
        from flexam_tpu.models.vae_stream import yuv420_to_rgb
        rgb = yuv420_to_rgb(luma[None], uv[None])[0]      # [T,H,W,3] u8
        return save_video(rgb.transpose(3, 0, 1, 2).astype(np.float32)
                          / 255.0, path, fps=fps)


def save_videos_grid(videos: np.ndarray, path: str, n_rows: int = 6,
                     fps: int = 12, rescale: bool = False):
    """`save_videos_grid` (:59-88): [B, C, T, H, W] -> tiled grid video."""
    v = np.asarray(videos)
    b, c, t, h, w = v.shape
    if rescale:
        v = (v + 1.0) / 2.0
    cols = min(n_rows, b)
    rows = (b + cols - 1) // cols
    grid = np.zeros((c, t, rows * h, cols * w), v.dtype)
    for i in range(b):
        r, cc = divmod(i, cols)
        grid[:, :, r * h:(r + 1) * h, cc * w:(cc + 1) * w] = v[i]
    save_video(grid[None], path, fps=fps)


def save_videos_comparison(videos, path: str, fps: int = 16,
                           labels=None):
    """Side-by-side comparison grid (`save_videos_comparison`,
    `utils.py:90-241`): stack [1,3,T,H,W]-shaped videos horizontally
    (tracking | original | generated | ...)."""
    vs = [np.asarray(v) for v in videos]
    t = min(v.shape[2] for v in vs)
    h = max(v.shape[3] for v in vs)

    def fit(v):
        if v.shape[3] != h:
            import cv2
            scale = h / v.shape[3]
            w = int(v.shape[4] * scale)
            frames = np.stack([
                cv2.resize(v[0, :, i].transpose(1, 2, 0), (w, h))
                for i in range(t)])
            return frames.transpose(3, 0, 1, 2)[None]
        return v[:, :, :t]

    grid = np.concatenate([fit(v) for v in vs], axis=4)
    return save_video(grid, path, fps=fps)


def merge_video_audio(video_path: str, audio_path: str):
    """ffmpeg mux (`utils.py:243-301`); best-effort host-side."""
    out = video_path.replace(".mp4", "_with_audio.mp4")
    cmd = ["ffmpeg", "-y", "-i", video_path, "-i", audio_path, "-c:v",
           "copy", "-c:a", "aac", "-shortest", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"audio mux failed ({e}); keeping silent video")
        return video_path


def color_transfer(source: np.ndarray, target: np.ndarray) -> np.ndarray:
    """LAB-space mean/std transfer (`utils.py:31-57`). [H,W,3] uint8."""
    import cv2
    sc = cv2.cvtColor(source, cv2.COLOR_RGB2LAB).astype(np.float32)
    dc = cv2.cvtColor(target, cv2.COLOR_RGB2LAB).astype(np.float32)
    s_mean, s_std = sc.mean((0, 1)), sc.std((0, 1))
    d_mean, d_std = dc.mean((0, 1)), dc.std((0, 1))
    out = (sc - s_mean) / (s_std + 1e-6) * d_std + d_mean
    out = np.clip(out, 0, 255).astype(np.uint8)
    return cv2.cvtColor(out, cv2.COLOR_LAB2RGB)
