"""Wan2.2 (3.8) causal 3D video VAE, TPU-native.

Behavioral reference: `FlexAM/models/wan_vae3_8.py` (`AutoencoderKLWan2_2_`,
:740-881; diffusers wrapper `AutoencoderKLWan3_8`, :892-1010). 16x spatial
(2x2 pixel patchify + 3 strided conv downs), 4x temporal, 48 latent channels.

TPU-first redesign — whole-clip convolution instead of frame streaming
-----------------------------------------------------------------------
The reference never runs its modules on a full clip: `encode` feeds
[1, 4, 4, ...]-frame chunks and `decode` feeds one latent frame at a time,
carrying a per-conv `feat_cache` of the trailing 2 frames (CACHE_T=2,
`wan_vae3_8.py:19`, cache logic :219-240). That streaming exists to bound
GPU memory; on TPU it would force a long sequential chain of tiny convs.

Here every op is expressed as one whole-clip convolution whose output is
*mathematically identical* to the reference's streamed computation:

  * `CausalConv3d` (:22-47): conv with time padded 2*(kt//2) on the left —
    streaming a causal conv with a 2-frame cache equals the full causal conv.
  * encoder `downsample3d` (:106-113, stream :160-173): the first chunk
    (frame 0) bypasses `time_conv` and is cached; later chunks compute
    stride-2 valid windows starting at the cached frame. Globally:
    `concat([x[:, :1], valid_conv3_stride2(x)])` with windows (0,1,2),(2,3,4)...
  * decoder `upsample3d` (:95-103, stream :118-155): frame 0 is marked "Rep"
    and bypasses `time_conv` with the history reset to zeros, so the conv
    runs causally over frames 1.. only. Globally: keep frame 0, causal-conv
    frames 1.. with zero history, interleave the 2C output channels into
    2x frames (channel-major pairs, :153-155).
  * `AvgDown3D` (:319-367): time is left-padded to a multiple of factor_t —
    identical per chunk and on the whole clip for T = 1+4k inputs.
  * `DupUp3D` (:370-417): per-frame channel->time duplication; the
    first-chunk trim (:415-417) becomes dropping the first factor_t-1 output
    frames of the whole clip.

Equivalence is asserted in tests/test_vae.py against the *actual reference
module* (imported from /root/reference with stubbed diffusers symbols) run
in its chunked-streaming mode.

Layout: public API keeps the reference's [B, C, T, H, W]; internally all
compute is channels-last [B, T, H, W, C] (TPU-friendly). Parameter tree
mirrors the reference module tree so safetensors checkpoints map 1:1.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.config import VAEConfig


# ---------------------------------------------------------------------------
# Primitive ops (channels-last)
# ---------------------------------------------------------------------------

def causal_conv3d(x: jnp.ndarray, p: dict,
                  stride: Tuple[int, int, int] = (1, 1, 1),
                  time_pad: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Causal 3D conv. x: [B, T, H, W, C]; weight torch layout [O, I, kt, kh, kw].

    Default padding: time left 2*(kt//2) (reference `CausalConv3d.__init__`,
    `wan_vae3_8.py:29-37`), spatial symmetric kh//2, kw//2.
    """
    w = p["weight"]
    kt, kh, kw = w.shape[2], w.shape[3], w.shape[4]
    if time_pad is None:
        time_pad = (2 * (kt // 2), 0)
    if kt == 1 and kh == 1 and kw == 1 and stride == (1, 1, 1):
        y = jnp.matmul(x, w[:, :, 0, 0, 0].astype(x.dtype).T)
        return y + p["bias"].astype(x.dtype)
    kern = w.transpose(2, 3, 4, 1, 0).astype(x.dtype)   # DHWIO
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=stride,
        padding=(time_pad, (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["bias"].astype(x.dtype)


def conv2d(x: jnp.ndarray, p: dict, stride: int = 1,
           padding=((1, 1), (1, 1))) -> jnp.ndarray:
    """Per-frame 2D conv. x: [B, T, H, W, C]; weight [O, I, kh, kw]."""
    b, t, h, w_, c = x.shape
    kern = p["weight"].transpose(2, 3, 1, 0).astype(x.dtype)  # HWIO
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w_, c), kern, window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, t, *y.shape[1:]) + p["bias"].astype(x.dtype)


def channel_rms_norm(x: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """`RMS_norm` (`wan_vae3_8.py:49-64`): F.normalize over channels * sqrt(C)
    * gamma. Channels-last input; fp32 accumulation."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # F.normalize clamps ||x|| at eps=1e-12. The fp32 copy of x must only
    # exist inside the reduction (XLA fuses convert+mul into the reduce);
    # applying the scale in fp32 materializes a whole-activation fp32 temp
    # that OOMs flagship-resolution decode (measured 2026-08-17: +3.5 GB
    # HLO temp per group under a toolchain that stopped fusing it).
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    norm = jnp.maximum(norm, 1e-12)
    inv = (math.sqrt(x.shape[-1]) / norm).astype(dtype)
    return x * inv * gamma.astype(dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def residual_block(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """`ResidualBlock` (`wan_vae3_8.py:198-240`): RMS-SiLU-conv x2 + shortcut."""
    if "shortcut" in p:
        h = causal_conv3d(x, p["shortcut"])
    else:
        h = x
    y = causal_conv3d(_silu(channel_rms_norm(x, p["norm1"])), p["conv1"])
    y = causal_conv3d(_silu(channel_rms_norm(y, p["norm2"])), p["conv2"])
    return y + h


def attention_block(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """`AttentionBlock` (`wan_vae3_8.py:243-283`): per-frame single-head
    spatial self-attention, qkv/proj as 1x1 convs."""
    b, t, h, w, c = x.shape
    identity = x
    xn = channel_rms_norm(x, p["norm"])
    qkv = jnp.matmul(xn, p["to_qkv"]["weight"][:, :, 0, 0].astype(x.dtype).T)
    qkv = qkv + p["to_qkv"]["bias"].astype(x.dtype)
    qkv = qkv.reshape(b * t, h * w, 3 * c)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = c ** -0.5
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v,
                   preferred_element_type=jnp.float32,
                   precision=prec).astype(x.dtype)
    o = o.reshape(b, t, h, w, c)
    o = jnp.matmul(o, p["proj"]["weight"][:, :, 0, 0].astype(x.dtype).T)
    o = o + p["proj"]["bias"].astype(x.dtype)
    return o + identity


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Pixel patchify on [B, T, H, W, C]: channel order (c, w-offset, h-offset)
    matching einops 'b c f (h q) (w r) -> b (c r q) f h w' (`wan_vae3_8.py:285`)."""
    if patch == 1:
        return x
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // patch, patch, w // patch, patch, c)
    # -> [B, T, H', W', C, r(w-off), q(h-off)]
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)
    return x.reshape(b, t, h // patch, w // patch, c * patch * patch)


def unpatchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Inverse of `patchify` ('b (c r q) h w -> b c (h q) (w r)', :306)."""
    if patch == 1:
        return x
    b, t, h, w, cp = x.shape
    c = cp // (patch * patch)
    x = x.reshape(b, t, h, w, c, patch, patch)    # [..., C, r, q]
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)          # [B,T,H,q,W,r,C]
    return x.reshape(b, t, h * patch, w * patch, c)


def avg_down3d(x: jnp.ndarray, out_channels: int, factor_t: int,
               factor_s: int = 1) -> jnp.ndarray:
    """`AvgDown3D` (`wan_vae3_8.py:319-367`): left-pad T to a multiple of
    factor_t, fold (t, h, w) factors into channels (order c, ft, fsh, fsw),
    mean over groups of in_c*factor/out_c."""
    b, t, h, w, c = x.shape
    pad_t = (factor_t - t % factor_t) % factor_t
    if pad_t:
        x = jnp.concatenate(
            [jnp.zeros((b, pad_t, h, w, c), x.dtype), x], axis=1)
        t = t + pad_t
    factor = factor_t * factor_s * factor_s
    group = c * factor // out_channels
    x = x.reshape(b, t // factor_t, factor_t, h // factor_s, factor_s,
                  w // factor_s, factor_s, c)
    # channel layout (c, it, ih, iw) — torch flattens C*factor with c major
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    x = x.reshape(b, t // factor_t, h // factor_s, w // factor_s,
                  out_channels, group)
    return jnp.mean(x, axis=-1)


def dup_up3d(x: jnp.ndarray, out_channels: int, factor_t: int,
             factor_s: int = 1, first_chunk: bool = False) -> jnp.ndarray:
    """`DupUp3D` (`wan_vae3_8.py:370-417`): channel-duplicate then unfold
    channels into (t, h, w) factors; `first_chunk` drops the leading
    factor_t-1 frames (:415-417)."""
    b, t, h, w, c = x.shape
    factor = factor_t * factor_s * factor_s
    repeats = out_channels * factor // c
    x = jnp.repeat(x, repeats, axis=-1)
    x = x.reshape(b, t, h, w, out_channels, factor_t, factor_s, factor_s)
    # -> [B, T, ft, H, fsh, W, fsw, C]
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(b, t * factor_t, h * factor_s, w * factor_s, out_channels)
    if first_chunk and factor_t > 1:
        x = x[:, factor_t - 1:]
    return x


def _upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """nearest-exact 2x spatial upsample == pixel repeat for integer scale."""
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


def resample(x: jnp.ndarray, p: dict, mode: str) -> jnp.ndarray:
    """`Resample.forward` (`wan_vae3_8.py:117-173`), whole-clip equivalents.

    upsample3d: time_conv FIRST (frames 1.. causally with zero history, 2x
    channel->frame interleave, frame 0 passthrough), then spatial 2x + conv.
    downsample3d: spatial pad+strided conv first, then stride-2 valid
    temporal conv windows (0,1,2),(2,3,4)..., frame 0 passthrough.
    """
    if mode == "upsample3d":
        head = x[:, :1]
        tail = x[:, 1:]
        if tail.shape[1] > 0:
            y = causal_conv3d(tail, p["time_conv"])      # [B,T-1,H,W,2C]
            b, tm1, h, w, c2 = y.shape
            c = c2 // 2
            # channel-major pair -> frames (2t, 2t+1)  (:153-155)
            y = y.reshape(b, tm1, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
            y = y.reshape(b, 2 * tm1, h, w, c)
            x = jnp.concatenate([head, y], axis=1)
        x = _upsample_nearest2x(x)
        return conv2d(x, p["resample_conv"])
    if mode == "upsample2d":
        x = _upsample_nearest2x(x)
        return conv2d(x, p["resample_conv"])
    if mode in ("downsample2d", "downsample3d"):
        # ZeroPad2d((0,1,0,1)) + 3x3 stride-2 (:104-113)
        x = conv2d(x, p["resample_conv"], stride=2, padding=((0, 1), (0, 1)))
        if mode == "downsample3d":
            head = x[:, :1]
            y = causal_conv3d(x, p["time_conv"], stride=(2, 1, 1),
                              time_pad=(0, 0))
            x = jnp.concatenate([head, y], axis=1)
        return x
    return x


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def _down_residual_block(x: jnp.ndarray, p: dict, out_channels: int,
                         temporal_down: bool, down_flag: bool) -> jnp.ndarray:
    """`Down_ResidualBlock` (`wan_vae3_8.py:423-459`)."""
    shortcut = avg_down3d(x, out_channels,
                          factor_t=2 if temporal_down else 1,
                          factor_s=2 if down_flag else 1)
    y = x
    for rp in p["res"]:
        y = residual_block(y, rp)
    if down_flag:
        mode = "downsample3d" if temporal_down else "downsample2d"
        y = resample(y, p["down"], mode)
    return y + shortcut


def _up_residual_block(x: jnp.ndarray, p: dict, out_channels: int,
                       temporal_up: bool, up_flag: bool,
                       first_chunk: bool) -> jnp.ndarray:
    """`Up_ResidualBlock` (`wan_vae3_8.py:462-508`)."""
    y = x
    for rp in p["res"]:
        y = residual_block(y, rp)
    if up_flag:
        mode = "upsample3d" if temporal_up else "upsample2d"
        y = resample(y, p["up"], mode)
        shortcut = dup_up3d(x, out_channels,
                            factor_t=2 if temporal_up else 1,
                            factor_s=2, first_chunk=first_chunk)
        return y + shortcut
    return y


def encoder3d(x: jnp.ndarray, p: dict, cfg: VAEConfig) -> jnp.ndarray:
    """`Encoder3d.forward` (`wan_vae3_8.py:505-618`). x: [B,T,H,W,12] after
    patchify; returns [B,T',H',W',2*z]."""
    dims = [cfg.c_dim * u for u in (1,) + tuple(cfg.dim_mult)]
    x = causal_conv3d(x, p["conv1"])
    for i in range(len(cfg.dim_mult)):
        t_down = (cfg.temporal_downsample[i]
                  if i < len(cfg.temporal_downsample) else False)
        down_flag = i != len(cfg.dim_mult) - 1
        x = _down_residual_block(x, p["downsamples"][i], dims[i + 1],
                                 t_down, down_flag)
    x = residual_block(x, p["middle"][0])
    x = attention_block(x, p["middle"][1])
    x = residual_block(x, p["middle"][2])
    x = _silu(channel_rms_norm(x, p["head_norm"]))
    return causal_conv3d(x, p["head_conv"])


def decoder3d(x: jnp.ndarray, p: dict, cfg: VAEConfig) -> jnp.ndarray:
    """`Decoder3d.forward` (`wan_vae3_8.py:621-729`). x: [B,T,H,W,z];
    returns [B,T_out,H*8,W*8,12] (then unpatchify 2 -> 16x)."""
    dim_mult = tuple(cfg.dim_mult)
    temporal_up = tuple(reversed(cfg.temporal_downsample))
    dims = [cfg.dec_dim * u for u in (dim_mult[-1],) + tuple(reversed(dim_mult))]
    x = causal_conv3d(x, p["conv1"])
    x = residual_block(x, p["middle"][0])
    x = attention_block(x, p["middle"][1])
    x = residual_block(x, p["middle"][2])
    for i in range(len(dim_mult)):
        t_up = temporal_up[i] if i < len(temporal_up) else False
        up_flag = i != len(dim_mult) - 1
        x = _up_residual_block(x, p["upsamples"][i], dims[i + 1], t_up,
                               up_flag, first_chunk=True)
    x = _silu(channel_rms_norm(x, p["head_norm"]))
    return causal_conv3d(x, p["head_conv"])


# ---------------------------------------------------------------------------
# Full autoencoder
# ---------------------------------------------------------------------------

def vae_encode(params: dict, cfg: VAEConfig, x: jnp.ndarray,
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode video [B, C=3, T, H, W] in [-1, 1] -> (mu, log_var), each
    [B, z, T', H/16, W/16]; mu normalized by the hardcoded per-channel stats
    (`AutoencoderKLWan2_2_.encode`, `wan_vae3_8.py:788-818`)."""
    x = x.transpose(0, 2, 3, 4, 1)          # channels-last
    x = patchify(x, 2)
    out = encoder3d(x, params["encoder"], cfg)
    out = causal_conv3d(out, params["conv1"])
    mu, log_var = jnp.split(out, 2, axis=-1)
    mean = params["latents_mean"].astype(mu.dtype)
    inv_std = params["latents_inv_std"].astype(mu.dtype)
    mu = (mu - mean) * inv_std
    return (mu.transpose(0, 4, 1, 2, 3), log_var.transpose(0, 4, 1, 2, 3))


def vae_decode(params: dict, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Decode latents [B, z, T', H', W'] -> video [B, 3, T, H*16, W*16] in
    [-1, 1] (`AutoencoderKLWan2_2_.decode`, :820-849; clamp :991)."""
    z = z.transpose(0, 2, 3, 4, 1)
    mean = params["latents_mean"].astype(z.dtype)
    inv_std = params["latents_inv_std"].astype(z.dtype)
    z = z / inv_std + mean
    x = causal_conv3d(z, params["conv2"])
    x = decoder3d(x, params["decoder"], cfg)
    x = unpatchify(x, 2)
    x = jnp.clip(x, -1.0, 1.0)
    return x.transpose(0, 4, 1, 2, 3)


def vae_encode_mode(params: dict, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Deterministic encode (posterior mode), the pipeline's `.mode()` path."""
    return vae_encode(params, cfg, x)[0]


# ---------------------------------------------------------------------------
# Parameter init (random; checkpoint loading maps the same tree)
# ---------------------------------------------------------------------------

def _cconv_init(key, out_c, in_c, k: Tuple[int, int, int], dtype):
    fan_in = in_c * int(np.prod(k))
    limit = math.sqrt(1.0 / fan_in)   # torch conv default: U(-1/sqrt(fi),..)
    k1, k2 = jax.random.split(key)
    return {
        "weight": jax.random.uniform(k1, (out_c, in_c, *k), jnp.float32,
                                     -limit, limit).astype(dtype),
        "bias": jax.random.uniform(k2, (out_c,), jnp.float32,
                                   -limit, limit).astype(dtype),
    }


def _res_init(key, in_c, out_c, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": jnp.ones((in_c,), dtype),
        "conv1": _cconv_init(ks[0], out_c, in_c, (3, 3, 3), dtype),
        "norm2": jnp.ones((out_c,), dtype),
        "conv2": _cconv_init(ks[1], out_c, out_c, (3, 3, 3), dtype),
    }
    if in_c != out_c:
        p["shortcut"] = _cconv_init(ks[2], out_c, in_c, (1, 1, 1), dtype)
    return p


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 2)
    p = {
        "norm": jnp.ones((c,), dtype),
        "to_qkv": {
            "weight": _cconv_init(ks[0], 3 * c, c, (1, 1), dtype)["weight"
                ].reshape(3 * c, c, 1, 1),
            "bias": jnp.zeros((3 * c,), dtype),
        },
        # reference zero-inits proj weight (:258)
        "proj": {"weight": jnp.zeros((c, c, 1, 1), dtype),
                 "bias": jnp.zeros((c,), dtype)},
    }
    return p


def _resample_init(key, dim, mode, dtype):
    ks = jax.random.split(key, 2)
    p = {}
    if mode in ("upsample2d", "upsample3d", "downsample2d", "downsample3d"):
        w = _cconv_init(ks[0], dim, dim, (3, 3), dtype)
        p["resample_conv"] = {"weight": w["weight"].reshape(dim, dim, 3, 3),
                              "bias": w["bias"]}
    if mode == "upsample3d":
        p["time_conv"] = _cconv_init(ks[1], dim * 2, dim, (3, 1, 1), dtype)
    if mode == "downsample3d":
        p["time_conv"] = _cconv_init(ks[1], dim, dim, (3, 1, 1), dtype)
    return p


def init_vae_params(key, cfg: VAEConfig, dtype=jnp.float32) -> dict:
    """Random-initialized parameter tree (layout mirrors the reference)."""
    z = cfg.latent_channels
    keys = iter(jax.random.split(key, 256))
    dim_mult = tuple(cfg.dim_mult)

    # encoder
    enc_dims = [cfg.c_dim * u for u in (1,) + dim_mult]
    enc = {"conv1": _cconv_init(next(keys), enc_dims[0], 12, (3, 3, 3), dtype)}
    enc["downsamples"] = []
    for i, (din, dout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        blk = {"res": []}
        cur = din
        for _ in range(cfg.num_res_blocks):
            blk["res"].append(_res_init(next(keys), cur, dout, dtype))
            cur = dout
        if i != len(dim_mult) - 1:
            t_down = (cfg.temporal_downsample[i]
                      if i < len(cfg.temporal_downsample) else False)
            mode = "downsample3d" if t_down else "downsample2d"
            blk["down"] = _resample_init(next(keys), dout, mode, dtype)
        enc["downsamples"].append(blk)
    mid = enc_dims[-1]
    enc["middle"] = [_res_init(next(keys), mid, mid, dtype),
                     _attn_init(next(keys), mid, dtype),
                     _res_init(next(keys), mid, mid, dtype)]
    enc["head_norm"] = jnp.ones((mid,), dtype)
    enc["head_conv"] = _cconv_init(next(keys), z * 2, mid, (3, 3, 3), dtype)

    # decoder
    temporal_up = tuple(reversed(cfg.temporal_downsample))
    dec_dims = [cfg.dec_dim * u
                for u in (dim_mult[-1],) + tuple(reversed(dim_mult))]
    dec = {"conv1": _cconv_init(next(keys), dec_dims[0], z, (3, 3, 3), dtype)}
    dec["middle"] = [_res_init(next(keys), dec_dims[0], dec_dims[0], dtype),
                     _attn_init(next(keys), dec_dims[0], dtype),
                     _res_init(next(keys), dec_dims[0], dec_dims[0], dtype)]
    dec["upsamples"] = []
    for i, (din, dout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        blk = {"res": []}
        cur = din
        for _ in range(cfg.num_res_blocks + 1):
            blk["res"].append(_res_init(next(keys), cur, dout, dtype))
            cur = dout
        if i != len(dim_mult) - 1:
            t_up = temporal_up[i] if i < len(temporal_up) else False
            mode = "upsample3d" if t_up else "upsample2d"
            blk["up"] = _resample_init(next(keys), dout, mode, dtype)
        dec["upsamples"].append(blk)
    dec["head_norm"] = jnp.ones((dec_dims[-1],), dtype)
    dec["head_conv"] = _cconv_init(next(keys), 12, dec_dims[-1], (3, 3, 3), dtype)

    mean, inv_std = latent_stats(z)
    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _cconv_init(next(keys), z * 2, z * 2, (1, 1, 1), dtype),
        "conv2": _cconv_init(next(keys), z, z, (1, 1, 1), dtype),
        "latents_mean": jnp.asarray(mean, jnp.float32),
        "latents_inv_std": jnp.asarray(inv_std, jnp.float32),
    }


def latent_stats(z_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Hardcoded 48-channel latent mean / 1/std (`wan_vae3_8.py:906-1010`).
    For tiny test configs (z != 48) returns zeros/ones."""
    if z_dim != 48:
        return np.zeros((z_dim,), np.float32), np.ones((z_dim,), np.float32)
    mean = np.array([
        -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
        -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
        -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
        -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
        -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
        0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
    ], np.float32)
    std = np.array([
        0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
        0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
        0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
        0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
        0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
        0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
    ], np.float32)
    return mean, 1.0 / std
