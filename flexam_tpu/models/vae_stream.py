"""Memory-bounded streamed VAE encode/decode (Wan2.2 3.8).

Why: the whole-clip decode in `flexam_tpu.models.vae` needs ~46 GB of HBM
at the flagship 512x896x97f workload (full-resolution 512-channel
activations over 97 frames) — the v5e has 16 GB. The reference streams
frame-by-frame with per-conv feature caches (`wan_vae3_8.py:819-849`,
CACHE_T=2) which is hostile to XLA (a long chain of tiny convs with
dynamic python state).

TPU-native middle ground — GROUP streaming: process G latent frames (or
1+4k pixel frames for encode) per step, carrying an explicit cache pytree
(the trailing causal-conv history at every layer's rate). Each group is
one jit with static shapes; groups after the first share one compiled
executable. Peak memory scales with G instead of T. The math is identical
to the whole-clip path (zero-initialized caches ARE the causal padding),
which in turn is parity-tested against the reference's streaming.

Cache contents per op:
  * CausalConv3d k_t=3: last 2 input frames at that layer's rate;
  * decoder upsample3d time_conv: last 2 frames of its (post-first-frame)
    input stream — the first output frame bypasses the conv and the
    history starts at zeros ("Rep" semantics, `wan_vae3_8.py:118-155`);
  * encoder downsample3d time_conv: last 1 spatially-resampled frame
    (`:160-173`); stride-2 window parity is preserved because groups are
    1+4k / 4k input frames.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.config import VAEConfig
from flexam_tpu.models.vae import (_silu, attention_block, avg_down3d,
                                   causal_conv3d, channel_rms_norm, conv2d,
                                   dup_up3d, patchify, unpatchify,
                                   _upsample_nearest2x, latent_stats)
from flexam_tpu.utils.aot_cache import aot_call


# ---------------------------------------------------------------------------
# Streaming primitive ops: (x, cache) -> (y, new_cache)
# ---------------------------------------------------------------------------

def _cconv_stream(x, p, cache):
    """Causal conv (k_t=3): consume 2 cached frames instead of zero pad."""
    ext = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    y = causal_conv3d(ext, p, time_pad=(0, 0))
    return y, ext[:, -2:]


def _res_stream(x, p, caches: List):
    """`ResidualBlock` with streamed convs; caches = [c_conv1, c_conv2]."""
    if "shortcut" in p:
        h = causal_conv3d(x, p["shortcut"])
    else:
        h = x
    y = _silu(channel_rms_norm(x, p["norm1"]))
    y, c1 = _cconv_stream(y, p["conv1"], caches[0])
    y = _silu(channel_rms_norm(y, p["norm2"]))
    y, c2 = _cconv_stream(y, p["conv2"], caches[1])
    return y + h, [c1, c2]


def _upsample3d_stream(x, p, cache, first: bool):
    """Decoder temporal x2 + spatial x2 (see module docstring)."""
    if first:
        head, tail = x[:, :1], x[:, 1:]
    else:
        head, tail = None, x
    ext = jnp.concatenate([cache.astype(x.dtype), tail], axis=1)
    y = causal_conv3d(ext, p["time_conv"], time_pad=(0, 0))
    b, tm, h, w, c2 = y.shape
    c = c2 // 2
    y = y.reshape(b, tm, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
    y = y.reshape(b, 2 * tm, h, w, c)
    if head is not None:
        y = jnp.concatenate([head, y], axis=1)
    y = _upsample_nearest2x(y)
    return conv2d(y, p["resample_conv"]), ext[:, -2:]


def _downsample3d_stream(x, p, cache, first: bool):
    """Encoder spatial stride-2 conv, then temporal stride-2 valid conv."""
    x = conv2d(x, p["resample_conv"], stride=2, padding=((0, 1), (0, 1)))
    if first:
        head = x[:, :1]
        ext = x
    else:
        head = None
        ext = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    y = causal_conv3d(ext, p["time_conv"], stride=(2, 1, 1), time_pad=(0, 0))
    if head is not None:
        y = jnp.concatenate([head, y], axis=1)
    return y, ext[:, -1:]


# ---------------------------------------------------------------------------
# Decoder groups
# ---------------------------------------------------------------------------

def _decoder_group(params, cfg: VAEConfig, x, caches, first: bool):
    """One latent group through the decoder; x: [B, G, h, w, z] (post
    conv2). Returns ([B, ~4G, H, W, 12], new_caches)."""
    p = params["decoder"]
    dim_mult = tuple(cfg.dim_mult)
    temporal_up = tuple(reversed(cfg.temporal_downsample))
    nc: Dict = {"res": {}, "up": {}}
    ci = 0

    def res(x, rp, key):
        nonlocal ci
        y, c = _res_stream(x, rp, caches["res"][key])
        nc["res"][key] = c
        return y

    x, nc["conv1"] = _cconv_stream(x, p["conv1"], caches["conv1"])
    x = res(x, p["middle"][0], "mid0")
    x = attention_block(x, p["middle"][1])
    x = res(x, p["middle"][2], "mid2")

    dims = [cfg.dec_dim * u for u in (dim_mult[-1],) + tuple(reversed(dim_mult))]
    for i in range(len(dim_mult)):
        x_in = x
        for j in range(cfg.num_res_blocks + 1):
            x = res(x, p["upsamples"][i]["res"][j], f"up{i}_{j}")
        up_flag = i != len(dim_mult) - 1
        if up_flag:
            t_up = temporal_up[i] if i < len(temporal_up) else False
            if t_up:
                x, nc["up"][i] = _upsample3d_stream(
                    x, p["upsamples"][i]["up"], caches["up"][i], first)
            else:
                x = _upsample_nearest2x(x)
                x = conv2d(x, p["upsamples"][i]["up"]["resample_conv"])
                nc["up"][i] = caches["up"].get(i, jnp.zeros(()))
            shortcut = dup_up3d(x_in, dims[i + 1],
                                factor_t=2 if t_up else 1, factor_s=2,
                                first_chunk=first)
            x = x + shortcut
    x = _silu(channel_rms_norm(x, p["head_norm"]))
    x, nc["head"] = _cconv_stream(x, p["head_conv"], caches["head"])
    return x, nc


def _decoder_cache_shapes(cfg: VAEConfig, b, lh, lw, dtype):
    """Zero caches for the decoder stream (shapes at each layer's rate)."""
    dim_mult = tuple(cfg.dim_mult)
    temporal_up = tuple(reversed(cfg.temporal_downsample))
    dims = [cfg.dec_dim * u for u in (dim_mult[-1],) + tuple(reversed(dim_mult))]
    z = jnp.zeros
    caches = {"res": {}, "up": {}}
    caches["conv1"] = z((b, 2, lh, lw, cfg.latent_channels), dtype)
    caches["res"]["mid0"] = [z((b, 2, lh, lw, dims[0]), dtype)] * 2
    caches["res"]["mid2"] = [z((b, 2, lh, lw, dims[0]), dtype)] * 2
    h, w = lh, lw
    for i in range(len(dim_mult)):
        cin = dims[i] if i == 0 else dims[i]
        for j in range(cfg.num_res_blocks + 1):
            c_in = cin if j == 0 else dims[i + 1]
            caches["res"][f"up{i}_{j}"] = [
                z((b, 2, h, w, c_in), dtype),
                z((b, 2, h, w, dims[i + 1]), dtype)]
        if i != len(dim_mult) - 1:
            t_up = temporal_up[i] if i < len(temporal_up) else False
            if t_up:
                caches["up"][i] = z((b, 2, h, w, dims[i + 1]), dtype)
            else:
                caches["up"][i] = z(())
            h, w = h * 2, w * 2
    caches["head"] = z((b, 2, h, w, dims[-1]), dtype)
    return caches


# Steady-state caches are donated: each call consumes the previous
# group's carried conv caches and returns the next — aliasing them
# shrinks the streamed decoder's footprint by the cache size (measured
# 2026-08-17: flagship group-4 decode was 16.34 G with output sharing
# 0 B with arguments, 607 M over the 15.75 G HBM). The FIRST group
# cannot donate: its caches come from host-built `jnp.zeros` whose
# identical constants may be deduped into one buffer ("donate the same
# buffer twice"); it compiles a separate executable anyway (first=True
# is a static arg), so nothing extra is compiled.
@partial(jax.jit, static_argnums=(1, 4))
def _decode_group_jit_first(params, cfg, x, caches, first):
    return _decoder_group(params, cfg, x, caches, first)


@partial(jax.jit, static_argnums=(1, 4), donate_argnums=(3,))
def _decode_group_jit(params, cfg, x, caches, first):
    return _decoder_group(params, cfg, x, caches, first)


def _decode_groups(params: dict, cfg: VAEConfig, zlat: jnp.ndarray,
                   group_size: int):
    """Shared streamed-decode loop: latent de-normalization + causal
    group iteration. Yields pre-unpatchify pixel groups [B, gt, H/2,
    W/2, 12]; both output flavors below consume this, so the grouping
    rules (first group >= 2, equal steady-state sizes for compile reuse,
    remainder gets its own compile) live in ONE place."""
    b, zc, lt, lh, lw = zlat.shape
    dt = zlat.dtype
    z = zlat.transpose(0, 2, 3, 4, 1)
    mean = params["latents_mean"].astype(dt)
    inv_std = params["latents_inv_std"].astype(dt)
    z = z / inv_std + mean
    x = causal_conv3d(z, params["conv2"])     # 1x1x1, stateless

    caches = _decoder_cache_shapes(cfg, b, lh, lw, dt)
    g = min(group_size, lt)
    first_g = min(max(g, 2), lt)
    idx = 0
    first = True
    while idx < lt:
        take = first_g if first else min(g, lt - idx)
        chunk = x[:, idx:idx + take]
        fn = _decode_group_jit_first if first else _decode_group_jit
        # the group executable is the bulk of a cold decode's compile
        # bill (~50 s at flagship) — route through the serialized-
        # executable cache when FLEXAM_AOT_CACHE is configured
        y, caches = aot_call(fn, (params, cfg, chunk, caches, first),
                             static_argnums=(1, 4), tag="vae_decode_group")
        yield y
        idx += take
        first = False


def vae_decode_streamed(params: dict, cfg: VAEConfig, zlat: jnp.ndarray,
                        group_size: int = 4) -> jnp.ndarray:
    """Drop-in replacement for `vae_decode` with bounded memory.
    zlat: [B, z, T', H', W'] -> [B, 3, T, H*16, W*16]."""
    outs = list(_decode_groups(params, cfg, zlat, group_size))
    out = jnp.concatenate(outs, axis=1)
    out = unpatchify(out, 2)
    out = jnp.clip(out, -1.0, 1.0)
    return out.transpose(0, 4, 1, 2, 3)


@jax.jit
def _group_to_u8(y: jnp.ndarray) -> jnp.ndarray:
    """Pre-unpatchify decoder group -> uint8 pixels [B, t, H, W, 3]."""
    up = unpatchify(y, 2)
    x = (jnp.clip(up.astype(jnp.float32), -1.0, 1.0) + 1.0) * (255.0 / 2.0)
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def vae_decode_streamed_u8(params: dict, cfg: VAEConfig, zlat: jnp.ndarray,
                           group_size: int = 4) -> "np.ndarray":
    """Streamed decode returning HOST uint8 video [B, T, H, W, 3].

    Each group's pixels are converted to uint8 on device and copied to the
    host ASYNCHRONOUSLY while later groups are still decoding. Over the
    slow axon host link the flagship fetch (~11 s at 97fx512x896 uint8)
    otherwise serializes after the decode compute (~7 s); overlapping them
    bounds the decode phase by max(compute, fetch) instead of their sum.
    Identical bytes to `uint8(vae_decode_streamed(...))` (tested).
    """
    import numpy as np
    outs = []
    for y in _decode_groups(params, cfg, zlat, group_size):
        u8 = _group_to_u8(y)
        try:
            u8.copy_to_host_async()
        except Exception:        # backend without async D2H: np.asarray
            pass                 # below still fetches correctly
        outs.append(u8)
    return np.concatenate([np.asarray(o) for o in outs], axis=1)


@jax.jit
def _group_to_yuv420(y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-unpatchify decoder group -> LIMITED-range (studio-swing)
    BT.601 YUV 4:2:0 uint8: (Y [B, t, H, W], UV PLANAR [B, t, 2, H/2,
    W/2]).

    Limited range on purpose: it is the yuv420p video convention the
    planes would be piped into an h264 encoder as, AND what cv2's I420
    inverse assumes — emitting JPEG/full-range planes here measured a
    ~4 dB avoidable PSNR loss through the cv2 reassembly path.

    The UV planes are channel-FIRST on purpose: a trailing dim of 2 would
    sit in the TPU lane (minor-most) dimension, padding every tile 2->128
    and making the D2H fetch/linearization pathologically slow (measured
    ~65 s vs ~9 s for the whole u8 path at flagship scale); planar keeps
    W/2 minor. Planar is also what I420 media encoders consume."""
    up = unpatchify(y, 2)
    rgb = (jnp.clip(up.astype(jnp.float32), -1.0, 1.0) + 1.0) * (255.0 / 2.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    luma = 16.0 + 0.256788 * r + 0.504129 * g + 0.097906 * b
    u = 128.0 - 0.148223 * r - 0.290993 * g + 0.439216 * b
    v = 128.0 + 0.439216 * r - 0.367788 * g - 0.071427 * b
    uv = jnp.stack([u, v], axis=2)                    # [B, t, 2, H, W]
    bb, t, _, h, w = uv.shape
    uv = uv.reshape(bb, t, 2, h // 2, 2, w // 2, 2).mean(axis=(4, 6))
    to_u8 = lambda x: jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
    return to_u8(luma), to_u8(uv)


def yuv420_to_rgb(luma: "np.ndarray", uv: "np.ndarray") -> "np.ndarray":
    """Host inverse of `_group_to_yuv420` (chroma upsampled nearest/bilinear):
    (Y [B, T, H, W], UV planar [B, T, 2, H/2, W/2]) -> uint8 RGB
    [B, T, H, W, 3]. Uses cv2's SIMD I420 converter when available (the
    numpy path costs tens of seconds at flagship scale on one core)."""
    import numpy as np
    bb, t, h, w = luma.shape
    try:
        import cv2
        out = np.empty((bb, t, h, w, 3), np.uint8)
        buf = np.empty((h + h // 2, w), np.uint8)
        half = uv.reshape(bb, t, 2, -1)               # U rows then V rows
        for bi in range(bb):
            for ti in range(t):
                buf[:h] = luma[bi, ti]
                buf[h:h + h // 4] = half[bi, ti, 0].reshape(h // 4, w)
                buf[h + h // 4:] = half[bi, ti, 1].reshape(h // 4, w)
                cv2.cvtColor(buf, cv2.COLOR_YUV2RGB_I420, dst=out[bi, ti])
        return out
    except ImportError:
        yf = (luma.astype(np.float32) - 16.0) * 1.164383
        uvf = uv.astype(np.float32) - 128.0
        uvf = uvf.repeat(2, axis=-2).repeat(2, axis=-1)
        u, v = uvf[:, :, 0], uvf[:, :, 1]
        r = yf + 1.596027 * v
        g = yf - 0.391762 * u - 0.812968 * v
        b = yf + 2.017232 * u
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def vae_decode_streamed_yuv420(params: dict, cfg: VAEConfig,
                               zlat: jnp.ndarray, group_size: int = 4
                               ) -> Tuple["np.ndarray", "np.ndarray"]:
    """Streamed decode fetching YUV 4:2:0 instead of RGB: HOST uint8
    (Y [B, T, H, W], UV planar [B, T, 2, H/2, W/2]) — 1.5 bytes/pixel vs 3.

    The delivered video is h264-encoded to yuv420p anyway, so subsampling
    chroma ON DEVICE loses nothing the media encoder wouldn't discard,
    while halving the bytes crossing the (tens-of-MB/s) axon tunnel — the
    flagship decode phase is fetch-bound (~11 s of its 11.6 s is the uint8
    copy). Same group-overlapped async fetch as the u8 path. NOT
    byte-identical to `vae_decode_streamed_u8` (4:2:0 chroma); opt-in via
    FLEXAM_DECODE_FETCH=yuv420 in the pipeline.
    """
    import numpy as np
    ys, uvs = [], []
    for y in _decode_groups(params, cfg, zlat, group_size):
        luma, uv = _group_to_yuv420(y)
        for a in (luma, uv):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        ys.append(luma)
        uvs.append(uv)
    return (np.concatenate([np.asarray(a) for a in ys], axis=1),
            np.concatenate([np.asarray(a) for a in uvs], axis=1))


# ---------------------------------------------------------------------------
# Encoder groups
# ---------------------------------------------------------------------------

def _encoder_group(params, cfg: VAEConfig, x, caches, first: bool):
    """One pixel group through the encoder; x: [B, g, H/2, W/2, 12]
    (post patchify), g = 1+4k for the first group, 4k after."""
    p = params["encoder"]
    dim_mult = tuple(cfg.dim_mult)
    nc: Dict = {"res": {}, "down": {}}

    def res(x, rp, key):
        y, c = _res_stream(x, rp, caches["res"][key])
        nc["res"][key] = c
        return y

    x, nc["conv1"] = _cconv_stream(x, p["conv1"], caches["conv1"])
    dims = [cfg.c_dim * u for u in (1,) + dim_mult]
    for i in range(len(dim_mult)):
        x_in = x
        for j in range(cfg.num_res_blocks):
            x = res(x, p["downsamples"][i]["res"][j], f"down{i}_{j}")
        down_flag = i != len(dim_mult) - 1
        t_down = (cfg.temporal_downsample[i]
                  if i < len(cfg.temporal_downsample) else False)
        if down_flag:
            if t_down:
                x, nc["down"][i] = _downsample3d_stream(
                    x, p["downsamples"][i]["down"], caches["down"][i], first)
            else:
                x = conv2d(x, p["downsamples"][i]["down"]["resample_conv"],
                           stride=2, padding=((0, 1), (0, 1)))
                nc["down"][i] = caches["down"].get(i, jnp.zeros(()))
        shortcut = avg_down3d(x_in, dims[i + 1],
                              factor_t=2 if t_down else 1,
                              factor_s=2 if down_flag else 1)
        x = x + shortcut
    x = res(x, p["middle"][0], "mid0")
    x = attention_block(x, p["middle"][1])
    x = res(x, p["middle"][2], "mid2")
    x = _silu(channel_rms_norm(x, p["head_norm"]))
    x, nc["head"] = _cconv_stream(x, p["head_conv"], caches["head"])
    return x, nc


def _encoder_cache_shapes(cfg: VAEConfig, b, h2, w2, dtype):
    dim_mult = tuple(cfg.dim_mult)
    dims = [cfg.c_dim * u for u in (1,) + dim_mult]
    z = jnp.zeros
    caches = {"res": {}, "down": {}}
    caches["conv1"] = z((b, 2, h2, w2, 12), dtype)
    h, w = h2, w2
    for i in range(len(dim_mult)):
        cin = dims[i]
        for j in range(cfg.num_res_blocks):
            c_in = cin if j == 0 else dims[i + 1]
            caches["res"][f"down{i}_{j}"] = [
                z((b, 2, h, w, c_in), dtype),
                z((b, 2, h, w, dims[i + 1]), dtype)]
        down_flag = i != len(dim_mult) - 1
        t_down = (cfg.temporal_downsample[i]
                  if i < len(cfg.temporal_downsample) else False)
        if down_flag:
            h, w = h // 2, w // 2
            if t_down:
                caches["down"][i] = z((b, 1, h, w, dims[i + 1]), dtype)
            else:
                caches["down"][i] = z(())
    mid = dims[-1]
    caches["res"]["mid0"] = [z((b, 2, h, w, mid), dtype)] * 2
    caches["res"]["mid2"] = [z((b, 2, h, w, mid), dtype)] * 2
    caches["head"] = z((b, 2, h, w, mid), dtype)
    return caches


@partial(jax.jit, static_argnums=(1, 4))
def _encode_group_jit_first(params, cfg, x, caches, first):
    return _encoder_group(params, cfg, x, caches, first)


@partial(jax.jit, static_argnums=(1, 4), donate_argnums=(3,))
def _encode_group_jit(params, cfg, x, caches, first):
    return _encoder_group(params, cfg, x, caches, first)


@jax.jit
def _patchify_group_jit(chunk):
    """[B, 3, g, H, W] -> patchified [B, g, H/2, W/2, 12]."""
    return patchify(chunk.transpose(0, 2, 3, 4, 1), 2)


def vae_encode_stream_fn(params: dict, cfg: VAEConfig, frame_fn,
                         num_frames: int, b: int = 1,
                         group_size: int = 8
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streamed encode from a FRAME PRODUCER: `frame_fn(start, count)`
    returns pixel frames [B, 3, count, H, W] in [-1, 1]. The full-res clip
    never materializes in HBM — groups are produced (e.g. rasterized from
    tracks on device, conditioning.rasterize_device), patchified, and
    consumed by the causal encoder one group at a time. This is what lets
    prepare run next to the resident 10 GB DiT on a 16 GB chip."""
    g = max(4, (group_size // 4) * 4)
    caches = None
    outs = []
    idx = 0
    first = True
    while idx < num_frames:
        take = (min(g + 1, num_frames) if first
                else min(g, num_frames - idx))
        x = _patchify_group_jit(frame_fn(idx, take))
        if caches is None:
            caches = _encoder_cache_shapes(cfg, b, x.shape[2], x.shape[3],
                                           x.dtype)
        efn = _encode_group_jit_first if first else _encode_group_jit
        y, caches = aot_call(efn, (params, cfg, x, caches, first),
                             static_argnums=(1, 4), tag="vae_encode_group")
        outs.append(y)
        idx += take
        first = False
    out = jnp.concatenate(outs, axis=1)
    out = causal_conv3d(out, params["conv1"])     # 1x1x1 stateless
    mu, log_var = jnp.split(out, 2, axis=-1)
    mean = params["latents_mean"].astype(mu.dtype)
    inv_std = params["latents_inv_std"].astype(mu.dtype)
    mu = (mu - mean) * inv_std
    return mu.transpose(0, 4, 1, 2, 3), log_var.transpose(0, 4, 1, 2, 3)


def vae_encode_streamed(params: dict, cfg: VAEConfig, video: jnp.ndarray,
                        group_size: int = 8
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for `vae_encode` with bounded memory.
    video: [B, 3, T, H, W] in [-1,1], T = 1+4k. group_size in PIXEL frames
    (rounded to 4k; first group adds the +1 frame)."""
    b, _, t = video.shape[:3]
    return vae_encode_stream_fn(
        params, cfg, lambda a, n: video[:, :, a:a + n],
        t, b=b, group_size=group_size)


def vae_encode_mode_streamed(params, cfg, video, group_size: int = 8):
    return vae_encode_streamed(params, cfg, video, group_size)[0]
