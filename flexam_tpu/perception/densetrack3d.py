"""DELTA DenseTrack3D — TPU-native dense 3D point tracker.

Call surface matches the reference's consumption exactly
(`pipelines.py:1374-1494`, `comfyui/annotator/nodes.py:296-434`):

    model = DenseTrack3D(stride=4, window_len=16, add_space_attn=True,
                         num_virtual_tracks=64, model_resolution=(384, 512),
                         upsample_factor=4)
    out = DensePredictor3D(model)(video [B,T,3,H,W] 0..1,
                                  videodepth [B,T,1,H,W],
                                  grid_query_frame=0)
    out: {"trajs_uv": [B,T,N,2] input-pixel coords,
          "vis":      [B,T,N]   visibility in 0..1,
          "trajs_depth": [B,T,N,1] metric depth,
          "dense_reso": (h, w) of the dense output grid}

The DELTA source itself is NOT in the reference snapshot (its submodule
dir is empty — SURVEY.md §2.6), so this is an original implementation of
the published architecture family (DELTA, arXiv 2410.24211: a
CoTracker-style windowed iterative dense tracker with a learned
upsampler), re-designed TPU-first rather than translated:

  * CNN feature encoder at `stride` over `model_resolution`;
  * every stride-4 grid cell of each window's FIRST frame is a query
    track (dense tracking), plus `num_virtual_tracks` learned global
    tokens for O(N*K) spatial attention (`add_space_attn`);
  * per sliding `window_len`-frame window (stride window_len//2),
    `iters` transformer updates refine per-frame (u, v, log-depth
    residual, visibility) from multi-scale LOCAL correlation, flow and
    depth embeddings;
  * long tracks are formed by CHAINING: each window tracks its own
    regular grid, and the frame-0 dense tracks are advanced by
    bilinear-sampling the window's dense fields at their current
    positions (how dense trackers compose; keeps every window's
    correlation support centered on a regular grid);
  * a RAFT-style convex upsampler (weights predicted ONCE from the
    query-frame features) lifts the composed coarse fields to
    `model_resolution` (x `upsample_factor`), giving `dense_reso`.

TPU-first design notes (why this is not a CUDA translation):
  * correlation volumes are DIAGONAL shifted products on the regular
    query grid — built with a lax.scan over static shifts as
    multiply-reduce einsums, then sampled per track as a bilinear
    lookup inside each track's OWN (2R+1)^2 slice. Zero scattered
    gathers in the hot loop; everything is MXU/VPU-shaped.
  * windows advance under lax.scan with carried (positions, residual
    log-depth, visibility) buffers; all shapes static.
  * attention reuses the shared dispatch (`core.attention.xla_attention`).

Correlation support: at pyramid level l the volume spans +-R_v cells, so
displacement WITHIN one window of up to (R_v - r) * 2^l coarse cells
(~96 model-px at the default geometry) keeps full correlation signal;
faster motion degrades to the clamped boundary (the attention prior
still propagates). Chaining re-centers every window, so long videos are
not limited by this radius.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.core.attention import xla_attention
from flexam_tpu.core.layers import layer_norm, linear, linear_init


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DenseTrack3DConfig:
    """Constructor surface of the reference model (`pipelines.py:1374-1381`)
    plus the internals the (absent) source fixes."""
    stride: int = 4
    window_len: int = 16
    add_space_attn: bool = True
    num_virtual_tracks: int = 64
    model_resolution: Tuple[int, int] = (384, 512)   # (H, W)
    upsample_factor: int = 4
    # internals
    latent_dim: int = 128          # feature-encoder output channels
    dim: int = 384                 # update-transformer width
    num_heads: int = 8
    num_blocks: int = 6            # temporal attention blocks
    iters: int = 4                 # refinement iterations per window
    corr_levels: int = 4           # feature-pyramid levels
    corr_radius: int = 3           # sample radius r (7x7 taps per level)
    corr_volume_radius: int = 6    # volume half-extent R_v (13x13 cells)
    flow_bands: int = 10           # sincos bands for the flow embedding
    depth_bands: int = 8
    compute: str = "float32"       # transformer/encoder compute dtype
    iters_per_launch: int = 2      # host-chunked launches per window
    # convergence early-exit (VERDICT r2 item 3b): a window whose last
    # launch moved tracks less than `early_exit_tol` coarse cells on
    # average skips its remaining iteration launches — at reference
    # scale each skipped launch is a multi-second transformer pass. The
    # decision costs ONE scalar fetch per non-final launch.
    early_exit: bool = True
    early_exit_tol: float = 0.05

    @property
    def grid_hw(self) -> Tuple[int, int]:
        return (self.model_resolution[0] // self.stride,
                self.model_resolution[1] // self.stride)

    @property
    def dense_reso(self) -> Tuple[int, int]:
        return (self.grid_hw[0] * self.upsample_factor,
                self.grid_hw[1] * self.upsample_factor)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute == "bfloat16" else jnp.float32

    @property
    def token_dim(self) -> int:
        corr = self.corr_levels * (2 * self.corr_radius + 1) ** 2
        flow = 4 * self.flow_bands + 2
        depth = 2 * (2 * self.depth_bands + 1)
        return corr + flow + depth + self.latent_dim + 1

    def validate(self):
        h, w = self.grid_hw
        div = 2 ** (self.corr_levels - 1)
        if h % div or w % div:
            raise ValueError(
                f"grid {h}x{w} must divide 2^(corr_levels-1)={div} "
                f"(model_resolution multiple of {self.stride * div})")
        if self.window_len % 2:
            raise ValueError("window_len must be even")


# ---------------------------------------------------------------------------
# small numerics helpers
# ---------------------------------------------------------------------------


def _sincos(x: jnp.ndarray, bands: int) -> jnp.ndarray:
    """[..., C] -> [..., C * 2 * bands] with frequencies 2^0..2^(bands-1)."""
    freqs = jnp.asarray([2.0 ** i for i in range(bands)], x.dtype)
    ang = x[..., None] * freqs                      # [..., C, bands]
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return out.reshape(*x.shape[:-1], -1)


def bilinear_sample(field: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Sample `field` [H, W, C] (or [H, W]) at `pts` [..., 2] = (x, y) in
    cell coordinates (integer value = cell center), edge-clamped."""
    squeeze = field.ndim == 2
    if squeeze:
        field = field[..., None]
    h, w = field.shape[:2]
    x = jnp.clip(pts[..., 0], 0.0, w - 1.0)
    y = jnp.clip(pts[..., 1], 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    a = field[y0, x0]
    b = field[y0, x0 + 1]
    c = field[y0 + 1, x0]
    d = field[y0 + 1, x0 + 1]
    out = (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
           + c * (1 - fx) * fy + d * fx * fy)
    return out[..., 0] if squeeze else out


def _conv2d(x: jnp.ndarray, p: dict, stride: int = 1) -> jnp.ndarray:
    """NHWC conv, weight [kh, kw, cin, cout], SAME padding."""
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32) -> dict:
    fan = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    w = w * math.sqrt(2.0 / fan)
    return {"weight": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free instance norm over spatial dims of [N, H, W, C]."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


# ---------------------------------------------------------------------------
# feature encoder (RAFT/CoTracker BasicEncoder family, stride 4)
# ---------------------------------------------------------------------------


def encoder_init(key, cfg: DenseTrack3DConfig) -> dict:
    keys = jax.random.split(key, 16)
    c1, c2, c3 = 64, 96, cfg.latent_dim
    p = {"stem": _conv_init(keys[0], 7, 7, 3, c1)}
    p["res1"] = [_res_init(keys[1], c1, c1), _res_init(keys[2], c1, c1)]
    p["res2"] = [_res_init(keys[3], c1, c2), _res_init(keys[4], c2, c2)]
    p["res3"] = [_res_init(keys[5], c2, c3), _res_init(keys[6], c3, c3)]
    p["out"] = _conv_init(keys[7], 1, 1, c3, cfg.latent_dim)
    return p


def _res_init(key, cin, cout) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": _conv_init(k1, 3, 3, cin, cout),
         "conv2": _conv_init(k2, 3, 3, cout, cout)}
    if cin != cout:
        p["skip"] = _conv_init(k3, 1, 1, cin, cout)
    return p


def _res_block(p: dict, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    h = jax.nn.relu(_instance_norm(_conv2d(x, p["conv1"], stride)))
    h = jax.nn.relu(_instance_norm(_conv2d(h, p["conv2"])))
    if "skip" in p:
        x = _conv2d(x, p["skip"], stride)
    elif stride != 1:
        x = x[:, ::stride, ::stride]
    return x + h


def encode_frames(p: dict, frames: jnp.ndarray) -> jnp.ndarray:
    """frames [N, H, W, 3] (normalized) -> fmap [N, H/stride, W/stride, C]."""
    x = jax.nn.relu(_instance_norm(_conv2d(frames, p["stem"], 2)))
    x = _res_block(p["res1"][0], x)
    x = _res_block(p["res1"][1], x)
    x = _res_block(p["res2"][0], x, stride=2)
    x = _res_block(p["res2"][1], x)
    x = _res_block(p["res3"][0], x)
    x = _res_block(p["res3"][1], x)
    return _conv2d(x, p["out"])


# ---------------------------------------------------------------------------
# correlation: diagonal shifted-product volumes on the regular grid
# ---------------------------------------------------------------------------


def build_corr_volumes(f0: jnp.ndarray, fmaps: jnp.ndarray,
                       cfg: DenseTrack3DConfig) -> list:
    """f0 [h, w, C] (window's query-frame features), fmaps [Tw, h, w, C].

    Returns per level l a volume [Tw, h, w, S, S] with
    V[t, y, x, sy, sx] = <f0[y, x], pool_l(fmaps)[t, y + sy*2^l, x + sx*2^l]>
    (shift indices centered: s in [-R_v, R_v]). Built as a lax.scan over
    the S*S static shifts — each step one multiply-reduce, no gathers.
    """
    tw, h, w, c = fmaps.shape
    rv = cfg.corr_volume_radius
    s_side = 2 * rv + 1
    scale = 1.0 / math.sqrt(c)
    vols = []
    cur = fmaps
    for lvl in range(cfg.corr_levels):
        if lvl > 0:
            cur = jax.lax.reduce_window(
                cur, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") * 0.25
        step = 2 ** lvl
        # nearest-upsample back to the level-0 grid so a shift of one
        # level-l cell is a shift of `step` level-0 cells
        up = jnp.repeat(jnp.repeat(cur, step, axis=1), step, axis=2)
        pad = rv * step
        upp = jnp.pad(up, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                      mode="edge")
        shifts = jnp.asarray(
            [(sy * step, sx * step)
             for sy in range(-rv, rv + 1) for sx in range(-rv, rv + 1)],
            jnp.int32)

        def shift_dot(carry, sh, upp=upp, pad=pad):
            sl = jax.lax.dynamic_slice(
                upp, (0, pad + sh[0], pad + sh[1], 0), (tw, h, w, c))
            # fp32 accumulation regardless of the (possibly bf16) fmap
            # compute dtype; volumes are kept fp32
            v = jnp.einsum("yxc,tyxc->tyx", f0, sl,
                           preferred_element_type=jnp.float32) * scale
            return carry, v.astype(jnp.float32)

        _, vol = jax.lax.scan(shift_dot, 0, shifts)     # [S*S, Tw, h, w]
        vol = vol.transpose(1, 2, 3, 0).reshape(tw, h, w, s_side, s_side)
        vols.append(vol)
    return vols


def sample_corr(vols: list, disp: jnp.ndarray,
                cfg: DenseTrack3DConfig) -> jnp.ndarray:
    """disp [Tw, h, w, 2] = (dx, dy) offset from own grid cell, in level-0
    cells. Returns [Tw, h, w, corr_levels * (2r+1)^2].

    Each track reads a (2r+1)^2 neighborhood around its CURRENT offset by
    bilinear interpolation inside its own volume slice — pure arithmetic
    over the per-track [S, S] tile, no cross-track indexing.
    """
    r = cfg.corr_radius
    rv = cfg.corr_volume_radius
    taps = jnp.asarray([(dy, dx) for dy in range(-r, r + 1)
                        for dx in range(-r, r + 1)], jnp.float32)
    outs = []
    for lvl, vol in enumerate(vols):
        d = disp / (2.0 ** lvl)                          # level-l cells
        # sample coords in the volume's shift grid, origin at center
        sx = d[..., 0:1] + taps[None, None, None, :, 1] + rv
        sy = d[..., 1:2] + taps[None, None, None, :, 0] + rv
        s_side = 2 * rv + 1
        sx = jnp.clip(sx, 0.0, s_side - 1.0)
        sy = jnp.clip(sy, 0.0, s_side - 1.0)
        x0 = jnp.clip(jnp.floor(sx), 0, s_side - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(sy), 0, s_side - 2).astype(jnp.int32)
        fx = sx - x0
        fy = sy - y0
        g = jnp.take_along_axis  # over flattened [S*S] last axis
        vflat = vol.reshape(*vol.shape[:3], -1)          # [Tw,h,w,S*S]
        idx = lambda yy, xx: (yy * s_side + xx)
        a = g(vflat, idx(y0, x0), axis=-1)
        b = g(vflat, idx(y0, x0 + 1), axis=-1)
        c_ = g(vflat, idx(y0 + 1, x0), axis=-1)
        e = g(vflat, idx(y0 + 1, x0 + 1), axis=-1)
        out = (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
               + c_ * (1 - fx) * fy + e * fx * fy)
        outs.append(out)
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# update transformer
# ---------------------------------------------------------------------------


def transformer_init(key, cfg: DenseTrack3DConfig) -> dict:
    d = cfg.dim
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_blocks))
    p = {
        "in_proj": linear_init(next(keys), cfg.token_dim, d),
        "time_embed": jax.random.normal(next(keys),
                                        (cfg.window_len, d)) * 0.02,
        "virtual": jax.random.normal(
            next(keys), (cfg.num_virtual_tracks, d)) * 0.02,
        "head_delta": linear_init(next(keys), d, 4, scale=1e-3),
        "head_feat": linear_init(next(keys), d, cfg.latent_dim, scale=1e-3),
        "head_vis": linear_init(next(keys), d, 1),
        "time_blocks": [],
        "space_blocks": [],
    }
    for _ in range(cfg.num_blocks):
        p["time_blocks"].append(_attn_block_init(next(keys), d))
    n_space = cfg.num_blocks // 2 if cfg.add_space_attn else 0
    for _ in range(n_space):
        p["space_blocks"].append({
            "v_from_x": _attn_block_init(next(keys), d),
            "x_from_v": _attn_block_init(next(keys), d),
        })
    return p


def _attn_block_init(key, d: int) -> dict:
    k = jax.random.split(key, 6)
    return {
        "ln1_w": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "lnkv_w": jnp.ones((d,)), "lnkv_b": jnp.zeros((d,)),
        "qkv": linear_init(k[0], d, 3 * d),
        "proj": linear_init(k[1], d, d, scale=0.02),
        "ln2_w": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        "fc1": linear_init(k[2], d, 4 * d),
        "fc2": linear_init(k[3], 4 * d, d, scale=0.02),
    }


def _mha(bp: dict, xq: jnp.ndarray, xkv: jnp.ndarray, heads: int,
         ) -> jnp.ndarray:
    """Pre-norm residual attention; xq [B, Lq, D], xkv [B, Lk, D]."""
    b, lq, d = xq.shape
    hq = layer_norm(xq, bp["ln1_w"], bp["ln1_b"])
    hkv = hq if xkv is xq else layer_norm(xkv, bp["lnkv_w"], bp["lnkv_b"])
    dh = d // heads
    wq, wk, wv = jnp.split(bp["qkv"]["weight"], 3, axis=0)
    bq, bk, bv = jnp.split(bp["qkv"]["bias"], 3, axis=0)
    q = (hq @ wq.astype(hq.dtype).T + bq.astype(hq.dtype))
    k = (hkv @ wk.astype(hq.dtype).T + bk.astype(hq.dtype))
    v = (hkv @ wv.astype(hq.dtype).T + bv.astype(hq.dtype))
    q = q.reshape(b, lq, heads, dh)
    k = k.reshape(b, xkv.shape[1], heads, dh)
    v = v.reshape(b, xkv.shape[1], heads, dh)
    o = xla_attention(q, k, v).reshape(b, lq, d)
    x = xq + linear(o, bp["proj"])
    h = layer_norm(x, bp["ln2_w"], bp["ln2_b"])
    return x + linear(jax.nn.gelu(linear(h, bp["fc1"])), bp["fc2"])


def run_transformer(p: dict, tokens: jnp.ndarray,
                    cfg: DenseTrack3DConfig) -> jnp.ndarray:
    """tokens [Tw, N, token_dim] -> refined features [Tw, N, dim]."""
    tw, n, _ = tokens.shape
    x = linear(tokens.astype(cfg.dtype), p["in_proj"])
    x = x + p["time_embed"][:tw, None, :].astype(x.dtype)
    virt = jnp.broadcast_to(p["virtual"][None].astype(x.dtype),
                            (tw, cfg.num_virtual_tracks, cfg.dim))
    virt = virt + p["time_embed"][:tw, None, :].astype(x.dtype)
    si = 0
    for i, tb in enumerate(p["time_blocks"]):
        # temporal attention: each track attends over the window
        xt = x.transpose(1, 0, 2)                  # [N, Tw, D]
        xt = _mha(tb, xt, xt, cfg.num_heads)
        x = xt.transpose(1, 0, 2)
        if cfg.add_space_attn and i % 2 == 1 and si < len(p["space_blocks"]):
            sb = p["space_blocks"][si]
            si += 1
            # virtual tokens summarize all tracks (per frame), then
            # broadcast global context back: O(N*K) instead of O(N^2)
            virt = _mha(sb["v_from_x"], virt, x, cfg.num_heads)
            x = _mha(sb["x_from_v"], x, virt, cfg.num_heads)
    return x


# ---------------------------------------------------------------------------
# convex upsampler (weights from the query frame only)
# ---------------------------------------------------------------------------


def upsampler_init(key, cfg: DenseTrack3DConfig) -> dict:
    k1, k2 = jax.random.split(key)
    k2_ = cfg.upsample_factor ** 2
    return {"conv1": _conv_init(k1, 3, 3, cfg.latent_dim, 128),
            "conv2": _conv_init(k2, 1, 1, 128, 9 * k2_)}


def upsample_weights(p: dict, f0: jnp.ndarray,
                     cfg: DenseTrack3DConfig) -> jnp.ndarray:
    """f0 [h, w, C] -> convex weights [h, w, 9, k, k] (softmax over 9)."""
    h, w, _ = f0.shape
    k = cfg.upsample_factor
    m = _conv2d(jax.nn.relu(_conv2d(f0[None], p["conv1"])), p["conv2"])[0]
    m = m.reshape(h, w, 9, k, k)
    return jax.nn.softmax(m.astype(jnp.float32), axis=2)


def convex_upsample(field: jnp.ndarray, weights: jnp.ndarray,
                    k: int) -> jnp.ndarray:
    """field [h, w, F], weights [h, w, 9, k, k] -> [h*k, w*k, F].

    Each fine pixel is a convex combination of its coarse cell's 3x3
    neighborhood (RAFT-style), so upsampled values stay inside the local
    coarse range — tested as an invariant.
    """
    h, w, f = field.shape
    fp = jnp.pad(field, ((1, 1), (1, 1), (0, 0)), mode="edge")
    nb = jnp.stack([fp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                   axis=2)                                  # [h, w, 9, F]
    up = jnp.einsum("hwnab,hwnf->hawbf", weights,
                    nb.astype(jnp.float32))
    return up.reshape(h * k, w * k, f)


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------


def densetrack3d_init(key, cfg: DenseTrack3DConfig) -> dict:
    cfg.validate()
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"encoder": encoder_init(k1, cfg),
            "transformer": transformer_init(k2, cfg),
            "upsampler": upsampler_init(k3, cfg),
            "feat_proj": linear_init(k4, cfg.latent_dim, cfg.latent_dim)}


def _grid(h: int, w: int) -> jnp.ndarray:
    gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    return jnp.stack([gx, gy], axis=-1)                    # [h, w, 2]


@partial(jax.jit, static_argnums=(2,))
def _window_setup_jit(params, fmaps_w, cfg: DenseTrack3DConfig):
    """Per-window precompute: correlation volumes + initial track
    features from the window's first frame."""
    f0 = fmaps_w[0]
    vols = tuple(build_corr_volumes(f0, fmaps_w, cfg))
    tfeat0 = linear(f0.astype(jnp.float32), params["feat_proj"])
    return vols, tfeat0


@partial(jax.jit, static_argnums=(4, 5))
def _window_iters_jit(params, vols, dgrid_w, state,
                      cfg: DenseTrack3DConfig, n_iters: int):
    """`n_iters` refinement iterations over one window (a host-chunked
    launch: a full window at flagship scale exceeds the axon runtime's
    ~60 s single-executable watchdog, the same constraint that chunks
    the denoise scan — CLAUDE.md)."""
    pos, logr, tfeat, _ = state
    tw, h, w = dgrid_w.shape
    c = cfg.latent_dim
    grid = _grid(h, w)
    logd0 = dgrid_w[0]
    upd_mask = (jnp.arange(tw) > 0).astype(jnp.float32)[:, None, None]
    vis = jnp.zeros((tw, h, w), jnp.float32)
    for _ in range(n_iters):
        disp = pos - grid[None]
        corr = sample_corr(list(vols), disp, cfg)          # [Tw,h,w,L*49]
        flow_emb = jnp.concatenate(
            [disp, _sincos(disp * 0.25, cfg.flow_bands)], axis=-1)
        # scene log-depth under the current position, per frame
        dsamp = jax.vmap(bilinear_sample)(dgrid_w, pos)    # [Tw, h, w]
        dlog = (dsamp - logd0[None]) + logr
        demb = jnp.concatenate(
            [dlog[..., None], _sincos(dlog[..., None], cfg.depth_bands),
             logr[..., None], _sincos(logr[..., None], cfg.depth_bands)],
            axis=-1)[..., :2 * (2 * cfg.depth_bands + 1)]
        tokens = jnp.concatenate(
            [corr, flow_emb, demb,
             jnp.broadcast_to(tfeat[None], (tw, h, w, c)),
             jnp.zeros((tw, h, w, 1), jnp.float32)],
            axis=-1).reshape(tw, h * w, cfg.token_dim)
        y = run_transformer(params["transformer"], tokens, cfg)
        y = y.reshape(tw, h, w, cfg.dim)
        delta = linear(y, params["transformer"]["head_delta"]
                       ).astype(jnp.float32)
        pos = pos + delta[..., :2] * upd_mask[..., None]
        logr = logr + delta[..., 2] * upd_mask
        dfeat = linear(y, params["transformer"]["head_feat"]
                       ).astype(jnp.float32).mean(axis=0)
        tfeat = tfeat + dfeat
        vis = linear(y, params["transformer"]["head_vis"]
                     ).astype(jnp.float32)[..., 0]
    # mean |position delta| of the LAST iteration, in coarse cells — the
    # early-exit convergence signal (one scalar crosses the link)
    last_delta = jnp.mean(jnp.abs(delta[..., :2]))
    return (pos, logr, tfeat, vis), last_delta


@jax.jit
def _window_chain_jit(wpos, wlogr, wvis, dgrid_w, cur_pos, cur_lr):
    """Advance the frame-0 grid tracks through this window by sampling
    its dense fields at their position at the window's first frame; also
    returns absolute log-depth for the chained frames."""
    tw, h, w = wlogr.shape
    cur_flat = cur_pos.reshape(h * w, 2)

    def per_frame(fld):
        return bilinear_sample(fld, cur_flat).reshape(h, w, -1)

    opos = jax.vmap(per_frame)(wpos)                       # [Tw, h, w, 2]
    olr = jax.vmap(per_frame)(wlogr[..., None])[..., 0] + cur_lr[None]
    ovis = jax.vmap(per_frame)(wvis[..., None])[..., 0]
    dsamp = jax.vmap(bilinear_sample)(dgrid_w, opos)
    return opos, olr, ovis, dsamp + olr


def _window_starts(t: int, cfg: DenseTrack3DConfig) -> np.ndarray:
    wl, stp = cfg.window_len, cfg.window_len // 2
    starts = list(range(0, max(t - wl, 0) + 1, stp))
    if starts[-1] + wl < t:
        starts.append(t - wl)
    return np.asarray(starts, np.int32)


@partial(jax.jit, static_argnums=(2,))
def _precompute_jit(params, video_depth, cfg: DenseTrack3DConfig):
    video, videodepth = video_depth
    frames = ((video.astype(jnp.float32) - 0.5) / 0.5).astype(cfg.dtype)
    fmaps = encode_frames(params["encoder"], frames)       # [T, h, w, C]
    dlog = jnp.log(jnp.maximum(videodepth.astype(jnp.float32), 1e-4))
    dgrid = jax.lax.reduce_window(
        dlog, 0.0, jax.lax.add,
        (1, cfg.stride, cfg.stride), (1, cfg.stride, cfg.stride),
        "VALID") / float(cfg.stride ** 2)                  # [T, h, w]
    return fmaps, dgrid


def dense_track(params: dict, video: jnp.ndarray, videodepth: jnp.ndarray,
                cfg: DenseTrack3DConfig, t_real: int = 0):
    """Core tracker at model resolution — host-chunked over windows and
    iteration groups (each launch stays under the runtime's ~60 s
    single-executable watchdog at flagship scale; compiles are shared
    across windows because every launch has identical shapes).

    video [T, Hm, Wm, 3] in 0..1; videodepth [T, Hm, Wm] metric.
    Returns coarse buffers over the frame-0 dense grid:
      pos  [T, h, w, 2] (x, y) level-0 cell coords
      logd [T, h, w]    absolute log-depth of each track
      vis  [T, h, w]    logits
    plus fmap0 [h, w, C] for the upsampler.
    """
    del t_real
    t = video.shape[0]
    h, w = cfg.grid_hw
    wl = cfg.window_len
    fmaps, dgrid = _precompute_jit(params, (video, videodepth), cfg)

    # buffers stay ON DEVICE across windows (the host loop never inspects
    # values; per-window host round-trips would ship ~50 MB fp32 over the
    # slow link for nothing) — window starts are python ints, so the
    # updates are static slices sharing one compile
    grid_dev = _grid(h, w)
    pos_buf = jnp.broadcast_to(grid_dev[None], (t, h, w, 2))
    logd_buf = jnp.zeros((t, h, w), jnp.float32)
    vis_buf = jnp.full((t, h, w), 3.0, jnp.float32)
    logr_buf = jnp.zeros((t, h, w), jnp.float32)

    ipl = max(1, int(cfg.iters_per_launch))
    for s in _window_starts(t, cfg):
        s = int(s)
        fm_w = fmaps[s:s + wl]
        dg_w = dgrid[s:s + wl]
        vols, tfeat0 = _window_setup_jit(params, fm_w, cfg)
        state = (jnp.broadcast_to(grid_dev[None], (wl, h, w, 2)),
                 jnp.zeros((wl, h, w), jnp.float32), tfeat0,
                 jnp.zeros((wl, h, w), jnp.float32))
        done = 0
        while done < cfg.iters:
            k = min(ipl, cfg.iters - done)
            state, last_delta = _window_iters_jit(params, vols, dg_w,
                                                  state, cfg, k)
            done += k
            if (cfg.early_exit and done < cfg.iters
                    and float(last_delta) < cfg.early_exit_tol):
                break                 # converged: skip remaining launches
        wpos, wlogr, _, wvis = state
        opos, olr, ovis, ologd = _window_chain_jit(
            wpos, wlogr, wvis, dg_w, pos_buf[s], logr_buf[s])
        pos_buf = jax.lax.dynamic_update_slice(pos_buf, opos,
                                               (s, 0, 0, 0))
        logr_buf = jax.lax.dynamic_update_slice(logr_buf, olr, (s, 0, 0))
        vis_buf = jax.lax.dynamic_update_slice(vis_buf, ovis, (s, 0, 0))
        logd_buf = jax.lax.dynamic_update_slice(logd_buf, ologd,
                                                (s, 0, 0))
    fmap0 = fmaps[0].astype(jnp.float32)
    return pos_buf, logd_buf, vis_buf, fmap0


@partial(jax.jit, static_argnums=(4,))
def densify(params: dict, pos: jnp.ndarray, logd: jnp.ndarray,
            vis: jnp.ndarray, cfg: DenseTrack3DConfig, fmap0: jnp.ndarray):
    """Lift coarse buffers to the dense output grid via convex upsampling.

    Returns (uv [T, Hd*Wd, 2] model-res pixels, depth [T, Hd*Wd],
    vis [T, Hd*Wd] in 0..1) with Hd, Wd = cfg.dense_reso.
    """
    t, h, w, _ = pos.shape
    k = cfg.upsample_factor
    weights = upsample_weights(params["upsampler"], fmap0, cfg)
    gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    grid = jnp.stack([gx, gy], axis=-1)
    # upsample displacements (smooth), then re-add the fine pixel grid
    px_per_cell = float(cfg.stride)
    fine_scale = px_per_cell / k
    hd, wd = h * k, w * k
    fx, fy = jnp.meshgrid(jnp.arange(wd, dtype=jnp.float32),
                          jnp.arange(hd, dtype=jnp.float32), indexing="xy")
    fine = jnp.stack([(fx + 0.5) * fine_scale - 0.5,
                      (fy + 0.5) * fine_scale - 0.5], axis=-1)

    def per_frame(args):
        p, ld, v = args
        disp_px = (p - grid) * px_per_cell                 # [h, w, 2]
        field = jnp.concatenate(
            [disp_px, ld[..., None], v[..., None]], axis=-1)
        up = convex_upsample(field, weights, k)            # [hd, wd, 4]
        uv = up[..., :2] + fine
        return (uv.reshape(-1, 2), jnp.exp(up[..., 2]).reshape(-1),
                jax.nn.sigmoid(up[..., 3]).reshape(-1))

    return jax.lax.map(per_frame, (pos, logd, vis))


class DenseTrack3D:
    """Reference-constructor-compatible wrapper holding config + params.

    `DenseTrack3D(stride=4, window_len=16, ...)` mirrors
    `pipelines.py:1374-1381`; weights start random (the reference loads
    `densetrack3d.pth` with strict=False — see `load_densetrack3d`).
    """

    def __init__(self, stride=4, window_len=16, add_space_attn=True,
                 num_virtual_tracks=64, model_resolution=(384, 512),
                 upsample_factor=4, seed: int = 0,
                 compute: str = "bfloat16", **internals):
        # production default bf16: halves the per-launch time of the
        # transformer iterations (fp32 accumulation everywhere that
        # matters); tests pin float32 for tight tolerances
        self.cfg = DenseTrack3DConfig(
            stride=stride, window_len=window_len,
            add_space_attn=add_space_attn,
            num_virtual_tracks=num_virtual_tracks,
            model_resolution=tuple(model_resolution),
            upsample_factor=upsample_factor, compute=compute, **internals)
        self.params = densetrack3d_init(jax.random.key(seed), self.cfg)
        self.load_report = None    # set by load_densetrack3d
        self.load_ok = False       # random init until a checkpoint maps

    def load_state_dict(self, state_dict, strict: bool = False):
        self.params, report = map_torch_state_dict(
            self.params, state_dict, strict=strict)
        return report


class DensePredictor3D:
    """`DensePredictor3D(model)(video, videodepth, grid_query_frame=0)` —
    the exact call surface of `pipelines.py:1390,1456-1460`."""

    def __init__(self, model: DenseTrack3D):
        self.model = model

    def to(self, *a, **k):     # torch-API shims: device placement is jax's
        return self

    def eval(self):
        return self

    def cuda(self):
        return self

    def __call__(self, video, videodepth, grid_query_frame: int = 0,
                 downsample: Optional[int] = None):
        if grid_query_frame != 0:
            raise NotImplementedError(
                "grid_query_frame != 0 (the reference always passes 0: "
                "pipelines.py:1460, annotator/nodes.py:399)")
        cfg = self.model.cfg
        v = jnp.asarray(np.asarray(video), jnp.float32)
        d = jnp.asarray(np.asarray(videodepth), jnp.float32)
        if v.ndim != 5:
            raise ValueError("video must be [B, T, C, H, W]")
        b, t, _, h_in, w_in = v.shape
        if b != 1:
            raise NotImplementedError("batch 1 only (like the reference)")
        hm, wm = cfg.model_resolution
        frames = v[0].transpose(0, 2, 3, 1)                # [T, H, W, 3]
        # contract: 0..1 input like the reference predictor call
        # (`pipelines.py:1455-1460` passes the 0..1 video tensor); no
        # max() heuristic — it would mis-scale near-black clips
        frames = jax.image.resize(frames, (t, hm, wm, 3), "bilinear")
        dep = d.reshape(t, 1, *d.shape[-2:])[:, 0]
        dep = jax.image.resize(dep, (t, hm, wm), "bilinear")

        t_pad = max(t, cfg.window_len)
        if t_pad > t:
            frames = jnp.concatenate(
                [frames, jnp.repeat(frames[-1:], t_pad - t, 0)], 0)
            dep = jnp.concatenate(
                [dep, jnp.repeat(dep[-1:], t_pad - t, 0)], 0)

        pos, logd, vis, fmap0 = dense_track(
            self.model.params, frames, dep, cfg, t_pad)
        uv, depth, visp = densify(
            self.model.params, pos, logd, vis, cfg, fmap0=fmap0)
        uv, depth, visp = uv[:t], depth[:t], visp[:t]

        hd, wd = cfg.dense_reso
        if downsample and downsample > 1:
            uv = uv.reshape(t, hd, wd, 2)[:, ::downsample, ::downsample]
            depth = depth.reshape(t, hd, wd)[:, ::downsample, ::downsample]
            visp = visp.reshape(t, hd, wd)[:, ::downsample, ::downsample]
            hd, wd = uv.shape[1], uv.shape[2]
            uv = uv.reshape(t, hd * wd, 2)
            depth = depth.reshape(t, hd * wd)
            visp = visp.reshape(t, hd * wd)
        # rescale to input pixel coordinates
        uv = uv * jnp.asarray([w_in / wm, h_in / hm], jnp.float32)
        return {
            "trajs_uv": uv[None],                          # [1, T, N, 2]
            "vis": visp[None],                             # [1, T, N]
            "trajs_depth": depth[None, ..., None],         # [1, T, N, 1]
            "dense_reso": (hd, wd),
        }


# ---------------------------------------------------------------------------
# torch checkpoint mapping (best-effort)
# ---------------------------------------------------------------------------


def map_torch_state_dict(params: dict, state_dict: dict,
                         strict: bool = False):
    """Best-effort densetrack3d.pth -> params mapping.

    The DELTA source is absent from the reference snapshot, so the exact
    module names in `densetrack3d.pth` are unknowable here; this matches
    tensors by SHAPE signature in declaration order (conv kernels are
    transposed from torch OIHW to HWIO, linears kept [out, in]) and
    reports what did not match. The reference itself loads this
    checkpoint with strict=False (`pipelines.py:1388`).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    used = set()
    items = [(k, np.asarray(v)) for k, v in state_dict.items()
             if hasattr(v, "shape")]
    loaded, missed = [], []
    new_leaves = []
    for path, leaf in flat:
        leaf = np.asarray(leaf)
        want = leaf.shape
        found = None
        for k, v in items:
            if k in used:
                continue
            if v.shape == want:
                found = (k, v)
            elif (v.ndim == 4 and len(want) == 4
                  and v.transpose(2, 3, 1, 0).shape == want):
                found = (k, v.transpose(2, 3, 1, 0))
            if found:
                used.add(k)
                break
        if found:
            loaded.append(jax.tree_util.keystr(path))
            new_leaves.append(jnp.asarray(found[1], leaf.dtype))
        else:
            missed.append(jax.tree_util.keystr(path))
            new_leaves.append(jnp.asarray(leaf))
    report = {"loaded": loaded, "missed": missed,
              "unused": [k for k, _ in items if k not in used]}
    if strict and (missed or report["unused"]):
        raise ValueError(f"strict load failed: {report}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves), report


def load_densetrack3d(path: str, model: Optional[DenseTrack3D] = None,
                      verify: bool = True, coverage_threshold: float = 0.9,
                      **cfg_kwargs) -> DenseTrack3D:
    """Load `densetrack3d.pth` (torch, optionally {"model": ...}-wrapped,
    `pipelines.py:1383-1388`) into a DenseTrack3D, best-effort.

    The mapping is shape-signature based (the DELTA source is absent from
    the snapshot), so the result carries a verdict: `model.load_report`
    (the raw loaded/missed/unused lists) and `model.load_ok` (per-module
    coverage >= threshold with no module left entirely random — see
    `flexam_tpu.io.verify_load`). Callers like
    `tracking.dispatch_tracking` gate the learned path on `load_ok`
    instead of trusting file existence."""
    import torch

    from flexam_tpu.io.verify_load import check_mapping

    with open(path, "rb") as f:
        sd = torch.load(f, map_location="cpu", weights_only=False)
    if "model" in sd:
        sd = sd["model"]
    sd = {k: v.float().numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    model = model or DenseTrack3D(**cfg_kwargs)
    report = model.load_state_dict(sd, strict=False)
    model.load_report = report
    model.load_ok = check_mapping(report, quiet=True,
                                  threshold=coverage_threshold)
    n_l, n_m = len(report["loaded"]), len(report["missed"])
    print(f"densetrack3d: mapped {n_l} tensors, {n_m} unmatched "
          f"(strict=False, like the reference)")
    if verify and not model.load_ok:
        check_mapping(report, name=f"densetrack3d[{path}]",
                      threshold=coverage_threshold)
        print("WARNING: densetrack3d checkpoint mapping is LOW-COVERAGE — "
              "unmatched modules stay at random init")
    return model
