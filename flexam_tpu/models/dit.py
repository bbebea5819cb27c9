"""Wan2.2 FlexAM DiT, TPU-native.

Behavioral reference: `FlexAM/models/wan_transformer3d_FlexAM.py`
(`WanTransformer3DModel_FlexAM`, class at :526, forward at :818).

TPU-first design decisions (vs the CUDA/torch reference):
  * dense batched tensors instead of per-sample python lists; one jit trace;
  * transformer blocks run under `jax.lax.scan` over stacked block params
    (30 layers compile as one loop body — fast compiles, weight streaming);
  * patch embedding / ref conv / unpatchify are reshapes + a single MXU
    matmul instead of strided conv3d;
  * RoPE applied from precomputed fp32 (cos, sin) tables; AdaLN modulation,
    time/density embeddings in fp32 (matching the reference's
    amp.autocast(float32) islands at :927-955);
  * attention is injected (`attn_fn`) so the parallel layer can substitute a
    sequence-parallel wrapper without touching model code.

FlexAM additions faithfully reproduced:
  * density embedding -> 2 extra AdaLN terms per block + 1 in head
    (`:634-636, 449-452, 505-506`);
  * 5-conv residual CNN fusing control+depth+cos latents (`:680-711`,
    fusion in forward `:869-881`);
  * reference-frame token prepend via `ref_conv` (`:895-904`) and strip
    (`:1106-1109`), with the +1 temporal RoPE frame;
  * per-token timestep support (TI2V spatial timestep masking,
    `pipeline_wan2_2_fun_control_FlexAM.py:891-898`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from flexam_tpu.config import DiTConfig
from flexam_tpu.core.attention import attention as default_attention
from flexam_tpu.core.layers import (
    gelu_tanh,
    group_norm,
    layer_norm,
    linear,
    linear_init,
    rms_norm,
    silu,
    sinusoidal_embedding_1d,
)
from flexam_tpu.core.rope import apply_rope, build_video_rope, make_rope_tables
from flexam_tpu.ops.fused import fused_enabled, ln_modulation, rmsnorm_rope
from flexam_tpu.parallel.sharding import token_constraint


def _use_fused(head_dim: int) -> bool:
    """Fused Pallas elementwise kernels (ops/fused.py — the paifuser
    RMSNorm/RoPE fusions, `FlexAM/models/__init__.py:23-103`) engage on
    real TPU at production head dims; everything else takes the unfused
    XLA path the oracle-parity tests pin down."""
    return head_dim % 128 == 0 and fused_enabled()


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _mlp2_init(key, d_in, d_mid, d_out, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, d_in, d_mid, dtype=dtype),
            "fc2": linear_init(k2, d_mid, d_out, dtype=dtype)}


def _attn_init(key, dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], dim, dim, dtype=dtype),
        "k": linear_init(ks[1], dim, dim, dtype=dtype),
        "v": linear_init(ks[2], dim, dim, dtype=dtype),
        "o": linear_init(ks[3], dim, dim, dtype=dtype),
        "norm_q": jnp.ones((dim,), dtype=dtype),
        "norm_k": jnp.ones((dim,), dtype=dtype),
    }


def _block_init(key, cfg: DiTConfig, dtype):
    dim, ffn = cfg.dim, cfg.ffn_dim
    ks = jax.random.split(key, 6)
    p = {
        "self_attn": _attn_init(ks[0], dim, dtype),
        "cross_attn": _attn_init(ks[1], dim, dtype),
        "ffn": _mlp2_init(ks[2], dim, ffn, dim, dtype),
        # AdaLN modulation tables (`:419-420`), kept fp32
        "modulation": (jax.random.normal(ks[3], (1, 6, dim)) / dim ** 0.5
                       ).astype(jnp.float32),
        "modulation_density": (jax.random.normal(ks[4], (1, 2, dim)) / dim ** 0.5
                               ).astype(jnp.float32),
    }
    if cfg.cross_attn_norm:
        p["norm3"] = {"weight": jnp.ones((dim,), dtype),
                      "bias": jnp.zeros((dim,), dtype)}
    return p


def _conv_init(key, shape_oihw, dtype, fan_in=None):
    """Conv weight in torch layout [O, I, *K]; xavier-uniform over flat fan."""
    o = shape_oihw[0]
    fi = fan_in if fan_in is not None else int(
        math.prod(shape_oihw[1:]))
    limit = math.sqrt(6.0 / (fi + o))
    w = jax.random.uniform(key, shape_oihw, jnp.float32, -limit, limit)
    return {"weight": w.astype(dtype), "bias": jnp.zeros((o,), dtype)}


def init_dit_params(key, cfg: DiTConfig, dtype=jnp.bfloat16):
    """Full parameter pytree. Block params are stacked on a leading
    num_layers axis for `lax.scan`."""
    keys = jax.random.split(key, 16)
    dim = cfg.dim
    pt, ph, pw = cfg.patch_size

    params = {
        "patch_embedding": _conv_init(
            keys[0], (dim, cfg.in_dim, pt, ph, pw), dtype),
        "text_embedding": _mlp2_init(keys[1], cfg.text_dim, dim, dim, dtype),
        "time_embedding": _mlp2_init(keys[2], cfg.freq_dim, dim, dim, dtype),
        "time_projection": {"fc": linear_init(keys[3], dim, dim * 6, dtype=dtype)},
        "density_embedding": _mlp2_init(keys[4], cfg.freq_dim, dim, dim, dtype),
        "density_projection": {"fc": linear_init(keys[5], dim, dim * 2, dtype=dtype)},
        "head": {
            "head": linear_init(keys[6], dim, math.prod(cfg.patch_size) * cfg.out_dim,
                                dtype=dtype),
            "modulation": (jax.random.normal(keys[7], (1, 2, dim)) / dim ** 0.5
                           ).astype(jnp.float32),
            "modulation_density": (jax.random.normal(keys[8], (1, 1, dim)) / dim ** 0.5
                                   ).astype(jnp.float32),
        },
    }

    block_keys = jax.random.split(keys[9], cfg.num_layers)
    blocks = [_block_init(k, cfg, dtype) for k in block_keys]
    params["blocks"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *blocks)

    if cfg.add_ref_conv:
        params["ref_conv"] = _conv_init(
            keys[10], (dim, cfg.in_dim_ref_conv, ph, pw), dtype)

    if cfg.add_control_adapter:
        ks = jax.random.split(keys[12], 3)
        ph_, pw_ = cfg.patch_size[1], cfg.patch_size[2]
        cin = (cfg.in_dim_control_adapter
               * cfg.downscale_factor_control_adapter ** 2)
        params["control_adapter"] = {
            "conv": _conv_init(ks[0], (dim, cin, ph_, pw_), dtype),
            "res_conv1": _conv_init(ks[1], (dim, dim, 3, 3), dtype),
            "res_conv2": _conv_init(ks[2], (dim, dim, 3, 3), dtype),
        }

    if cfg.add_cnn_block:
        c1, c2 = cfg.cnn_block_dims
        ks = jax.random.split(keys[11], 5)
        params["cnn"] = {
            "conv1": _conv_init(ks[0], (c1, cfg.in_dim_cnn_block, 1, 3, 3), dtype),
            "gn1": {"weight": jnp.ones((c1,), dtype), "bias": jnp.zeros((c1,), dtype)},
            "conv2": _conv_init(ks[1], (c1, c1, 1, 3, 3), dtype),
            "gn2": {"weight": jnp.ones((c1,), dtype), "bias": jnp.zeros((c1,), dtype)},
            "conv3": _conv_init(ks[2], (c2, c1, 1, 3, 3), dtype),
            "gn3": {"weight": jnp.ones((c2,), dtype), "bias": jnp.zeros((c2,), dtype)},
            "conv4": _conv_init(ks[3], (c2, c2, 1, 3, 3), dtype),
            "gn4": {"weight": jnp.ones((c2,), dtype), "bias": jnp.zeros((c2,), dtype)},
            "conv5": _conv_init(ks[4], (cfg.out_dim_cnn_block, c2, 1, 1, 1), dtype),
        }
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _patch_embed(x: jnp.ndarray, p: dict, patch: Tuple[int, int, int]):
    """Conv3d(stride=kernel=patch) as rearrange + matmul.

    x: [B, C, F, H, W] -> tokens [B, F*(H/ph)*(W/pw), dim], grid (F/pt, ...).
    Weight layout follows torch Conv3d: [dim, C, pt, ph, pw].
    """
    b, c, f, h, w = x.shape
    pt, ph, pw = patch
    fo, ho, wo = f // pt, h // ph, w // pw
    xt = x.reshape(b, c, fo, pt, ho, ph, wo, pw)
    # -> [B, fo, ho, wo, C, pt, ph, pw]
    xt = xt.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, fo * ho * wo, -1)
    wmat = p["weight"].reshape(p["weight"].shape[0], -1)   # [dim, C*pt*ph*pw]
    out = jnp.matmul(xt, wmat.astype(xt.dtype).T) + p["bias"].astype(xt.dtype)
    return out, (fo, ho, wo)


def _ref_embed(ref: jnp.ndarray, p: dict, patch_hw: Tuple[int, int]):
    """Conv2d(stride=kernel=(ph,pw)) for the reference frame latent.

    ref: [B, C, H, W] -> tokens [B, (H/ph)*(W/pw), dim]  (`ref_conv`, :676).
    """
    b, c, h, w = ref.shape
    ph, pw = patch_hw
    ho, wo = h // ph, w // pw
    xt = ref.reshape(b, c, ho, ph, wo, pw).transpose(0, 2, 4, 1, 3, 5)
    xt = xt.reshape(b, ho * wo, -1)
    wmat = p["weight"].reshape(p["weight"].shape[0], -1)
    return jnp.matmul(xt, wmat.astype(xt.dtype).T) + p["bias"].astype(xt.dtype)


def _camera_adapter(p: dict, y_camera: jnp.ndarray,
                    patch_hw: Tuple[int, int],
                    downscale: int) -> jnp.ndarray:
    """`SimpleAdapter` (`wan_camera_adapter.py:5-41`): PixelUnshuffle(8) +
    strided conv to the patch grid + one ReLU residual block. Input
    [B, C, F, H, W] (Plucker-embed camera video folded 4-frames-to-
    channels by the pipeline); returns tokens [B, F*h'*w', dim]."""
    b, c, f, h, w = y_camera.shape
    x = y_camera.transpose(0, 2, 3, 4, 1).reshape(b * f, h, w, c)
    d = downscale
    # PixelUnshuffle: channel order (c, dy, dx)
    x = x.reshape(b * f, h // d, d, w // d, d, c)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b * f, h // d, w // d,
                                              c * d * d)
    ph, pw = patch_hw
    kern = p["conv"]["weight"].transpose(2, 3, 1, 0).astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, kern, window_strides=(ph, pw), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p["conv"]["bias"].astype(x.dtype)

    def conv3(xx, pp):
        k = pp["weight"].transpose(2, 3, 1, 0).astype(xx.dtype)
        y = jax.lax.conv_general_dilated(
            xx, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + pp["bias"].astype(xx.dtype)

    res = conv3(jax.nn.relu(conv3(x, p["res_conv1"])), p["res_conv2"])
    x = x + res
    hh, ww = x.shape[1], x.shape[2]
    return x.reshape(b, f * hh * ww, -1)


def _conv3d_1x3x3(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Conv3d kernel (1,3,3) pad (0,1,1) on channels-last [B, F, H, W, C]."""
    kw = p["weight"]  # [O, I, 1, 3, 3]
    o, i = kw.shape[0], kw.shape[1]
    k2d = kw[:, :, 0].transpose(2, 3, 1, 0)        # HWIO
    b, f, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(b * f, h, w, c), k2d.astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, f, h, w, o) + p["bias"].astype(x.dtype)


def _conv3d_1x1x1(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    kw = p["weight"][:, :, 0, 0, 0]                 # [O, I]
    return jnp.matmul(x, kw.astype(x.dtype).T) + p["bias"].astype(x.dtype)


def _cnn_fusion(cnn: dict, cnn_input: jnp.ndarray, groups: Tuple[int, int]):
    """The FlexAM control-fusion CNN (`:869-881`): 5 convs, two residual
    hops. Input/out: channels-last [B, F, H, W, C]."""
    g1, g2 = groups
    x1 = silu(group_norm(_conv3d_1x3x3(cnn_input, cnn["conv1"]),
                         cnn["gn1"]["weight"], cnn["gn1"]["bias"], g1))
    x2 = silu(group_norm(_conv3d_1x3x3(x1, cnn["conv2"]),
                         cnn["gn2"]["weight"], cnn["gn2"]["bias"], g1))
    x2 = x2 + x1
    x3 = silu(group_norm(_conv3d_1x3x3(x2, cnn["conv3"]),
                         cnn["gn3"]["weight"], cnn["gn3"]["bias"], g2))
    x4 = silu(group_norm(_conv3d_1x3x3(x3, cnn["conv4"]),
                         cnn["gn4"]["weight"], cnn["gn4"]["bias"], g2))
    x4 = x4 + x3
    return _conv3d_1x1x1(x4, cnn["conv5"])


def _self_attention(p, x, cos, sin, num_heads, eps, attn_fn, k_len=None):
    """`WanSelfAttention.forward` (`:230-262`): q/k RMS-norm, 3D RoPE, attn."""
    b, s, _ = x.shape
    d = x.shape[-1] // num_heads
    if _use_fused(d):
        # one pass per tensor instead of rms-norm + rope round trips
        q = rmsnorm_rope(linear(x, p["q"]), p["norm_q"], cos, sin,
                         num_heads, eps)
        k = rmsnorm_rope(linear(x, p["k"]), p["norm_k"], cos, sin,
                         num_heads, eps)
        v = linear(x, p["v"]).reshape(b, s, num_heads, d)
        out = attn_fn(q, k, v, k_len=k_len)
        return linear(out.reshape(b, s, -1), p["o"])
    q = rms_norm(linear(x, p["q"]), p["norm_q"], eps).reshape(b, s, num_heads, d)
    k = rms_norm(linear(x, p["k"]), p["norm_k"], eps).reshape(b, s, num_heads, d)
    v = linear(x, p["v"]).reshape(b, s, num_heads, d)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    out = attn_fn(q, k, v, k_len=k_len)
    return linear(out.reshape(b, s, -1), p["o"])


def _cross_attention(p, x, context, num_heads, eps, attn_fn):
    """`WanT2VCrossAttention.forward` (`:265-293`); context_lens is None in
    the t2v path, so all (zero-embedded-pad) text tokens participate."""
    b, s, _ = x.shape
    d = x.shape[-1] // num_heads
    lk = context.shape[1]
    q = rms_norm(linear(x, p["q"]), p["norm_q"], eps).reshape(b, s, num_heads, d)
    k = rms_norm(linear(context, p["k"]), p["norm_k"], eps).reshape(b, lk, num_heads, d)
    v = linear(context, p["v"]).reshape(b, lk, num_heads, d)
    out = attn_fn(q, k, v, k_len=None)
    return linear(out.reshape(b, s, -1), p["o"])


def _block_forward(bp, x, e0, de0, cos, sin, context, cfg: DiTConfig,
                   attn_fn, k_len=None):
    """`WanAttentionBlock.forward` (`:422-472`).

    e0:  [B, Lm, 6, dim] fp32 (Lm in {1, L}) or the binary-timestep tuple
         ("binary", e0_pair [B, 2, 6, dim], mask [B, L])
    de0: [B, 1, 2, dim] fp32 density terms
    """
    dtype = x.dtype
    mod = bp["modulation"].astype(jnp.float32)[None]         # [1,1,6,dim]
    dmod = bp["modulation_density"].astype(jnp.float32)[None]
    de = dmod + de0                                           # [B,1,2,dim]

    if isinstance(e0, tuple):
        _, pair, mask = e0
        e_pair = mod + pair                                   # [B,2,6,dim]
        m = mask[:, :, None]                                  # [B,L,1]

        def term(i):
            ti = e_pair[:, :, i, :]                           # [B,2,dim]
            return (ti[:, 0:1] * m + ti[:, 1:2] * (1 - m)).astype(dtype)
    else:
        e = mod + e0                                          # [B,Lm,6,dim]

        def term(i):
            return e[:, :, i, :].astype(dtype)

    def dterm(i):
        return de[:, :, i, :].astype(dtype)

    # The two LN+AdaLN prologues fuse into single Pallas passes on TPU
    # (the density shift folds into the shift term in f32 pair space);
    # the per-token general mode (e0 [B, L, 6, dim]) keeps the XLA path.
    fuse_ln = _use_fused(cfg.dim // cfg.num_heads) and (
        isinstance(e0, tuple) or e0.shape[1] == 1)

    def prologue(i_shift, i_scale, i_density):
        if not fuse_ln:
            return (layer_norm(x, eps=1e-6) * (1.0 + term(i_scale))
                    + term(i_shift) + dterm(i_density)).astype(dtype)
        if isinstance(e0, tuple):
            _, _, mask = e0
            sh = e_pair[:, :, i_shift] + de[:, :, i_density]   # [B,2,dim]
            sc = e_pair[:, :, i_scale]
            return ln_modulation(x, sh, sc, mask=mask)
        sh = e[:, 0, i_shift] + de[:, 0, i_density]            # [B,dim]
        return ln_modulation(x, sh, e[:, 0, i_scale])

    # self-attention with AdaLN(shift,scale)+density shift (`:452-456`)
    tmp = prologue(0, 1, 0)
    y = _self_attention(bp["self_attn"], tmp, cos, sin, cfg.num_heads,
                        cfg.eps, attn_fn, k_len)
    x = x + y * term(2)

    # cross-attention (`:459-461`)
    if cfg.cross_attn_norm:
        xn = layer_norm(x, bp["norm3"]["weight"], bp["norm3"]["bias"], eps=1e-6)
    else:
        xn = x
    x = x + _cross_attention(bp["cross_attn"], xn, context, cfg.num_heads,
                             cfg.eps, attn_fn)

    # FFN with AdaLN + density (`:464-468`)
    tmp = prologue(3, 4, 1)
    y = linear(gelu_tanh(linear(tmp, bp["ffn"]["fc1"])), bp["ffn"]["fc2"])
    x = x + y * term(5)
    return x


def _head_forward(hp, x, e, de, patch: Tuple[int, int, int], out_dim: int):
    """`Head.forward` (`:493-507`). e: [B, dim] (scalar t) or [B, L, dim]
    (per-token t), fp32; de: [B, dim] fp32 density embedding."""
    dtype = x.dtype
    mod = hp["modulation"].astype(jnp.float32)           # [1, 2, dim]
    if e.ndim == 2:
        em = mod + e[:, None, :]                         # [B, 2, dim]
        shift = em[:, None, 0, :]                        # [B, 1, dim]
        scale = em[:, None, 1, :]
    else:
        em = mod[None] + e[:, :, None, :]                # [B, L, 2, dim]
        shift = em[:, :, 0, :]                           # [B, L, dim]
        scale = em[:, :, 1, :]
    dmod = hp["modulation_density"].astype(jnp.float32)  # [1, 1, dim]
    dshift = dmod[:, 0, :][None] + de[:, None, :]        # [B, 1, dim]

    xn = (layer_norm(x, eps=1e-6) * (1.0 + scale.astype(dtype))
          + shift.astype(dtype) + dshift.astype(dtype))
    return linear(xn.astype(dtype), hp["head"])


def _unpatchify(x, grid, patch, out_dim):
    """`unpatchify` (`:1126-1149`): [B, L, prod(patch)*c] -> [B, c, F, H, W]."""
    b = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch
    u = x[:, :f * h * w].reshape(b, f, h, w, pt, ph, pw, out_dim)
    u = jnp.einsum("bfhwpqrc->bcfphqwr", u)
    return u.reshape(b, out_dim, f * pt, h * ph, w * pw)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def _dit_prepare(
    params: dict,
    cfg: DiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    density: Optional[jnp.ndarray],
    y: Optional[jnp.ndarray],
    additional_control: Optional[jnp.ndarray],
    full_ref: Optional[jnp.ndarray],
    rope_tables: Optional[jnp.ndarray],
    y_camera: Optional[jnp.ndarray] = None,
    binary_t_mask: Optional[jnp.ndarray] = None,
):
    """Everything before the block stack (`:818-975`). Returns the token
    tensor plus all per-step conditioning tensors."""
    compute_dtype = x.dtype
    pt, ph, pw = cfg.patch_size

    # --- control fusion CNN + inpaint concat (`:868-883`)
    if y is not None:
        if cfg.add_cnn_block and additional_control is not None:
            c_lat = x.shape[1]
            control = y[:, :c_lat]
            inpaint = y[:, c_lat:]
            cnn_in = jnp.concatenate([control, additional_control], axis=1)
            # to channels-last [B, F, H, W, C] for TPU convs
            cnn_in = cnn_in.transpose(0, 2, 3, 4, 1)
            cnn_out = _cnn_fusion(params["cnn"], cnn_in, cfg.cnn_block_groups)
            cnn_out = cnn_out.transpose(0, 4, 1, 2, 3)
            y = jnp.concatenate([cnn_out, inpaint], axis=1)
        x = jnp.concatenate([x, y], axis=1)

    # --- patch embedding (`:885`)
    tokens, grid = _patch_embed(x, params["patch_embedding"], cfg.patch_size)
    b, l_vid, _ = tokens.shape
    f, gh, gw = grid

    # --- camera control adapter added to patch embeddings (`:887-889`)
    if cfg.add_control_adapter and y_camera is not None:
        tokens = tokens + _camera_adapter(
            params["control_adapter"], y_camera.astype(tokens.dtype),
            (cfg.patch_size[1], cfg.patch_size[2]),
            cfg.downscale_factor_control_adapter)

    # --- reference tokens prepended (`:895-904`)
    has_ref = cfg.add_ref_conv and full_ref is not None
    if has_ref:
        ref_tok = _ref_embed(full_ref, params["ref_conv"], (ph, pw))
        l_ref = ref_tok.shape[1]
        tokens = jnp.concatenate([ref_tok, tokens], axis=1)
        grid = (f + 1, gh, gw)
        if t.ndim == 2:
            pad = jnp.repeat(t[:, -1:], l_ref, axis=1)
            t = jnp.concatenate([pad, t], axis=1)   # prepend (`:900-904`)
    else:
        l_ref = 0
    seq_len = tokens.shape[1]

    # --- RoPE tables for this grid
    if rope_tables is None:
        rope_tables = jnp.asarray(make_rope_tables(cfg.head_dim, cfg.rope_max_seq))
    cos, sin = build_video_rope(rope_tables, grid, cfg.head_dim)

    # --- time embeddings, fp32 (`:927-944`)
    def time_mlp(pos):
        emb = sinusoidal_embedding_1d(cfg.freq_dim, pos)
        h1 = silu(linear(emb, _f32(params["time_embedding"]["fc1"])))
        return linear(h1, _f32(params["time_embedding"]["fc2"]))

    if binary_t_mask is not None:
        # Binary-timestep fast path: the TI2V per-token pattern has only
        # two values — t on generated tokens, 0 on known ones
        # (`pipeline...FlexAM.py:891-898`). Run the time MLP on the two
        # scalars and select per token downstream instead of carrying a
        # [B, L, 6, dim] fp32 tensor (~1.7 GB at the default workload).
        assert t.ndim == 1
        pair = jnp.stack([t.astype(jnp.float32),
                          jnp.zeros_like(t, jnp.float32)], axis=1)  # [B,2]
        e_pair = time_mlp(pair)                                # [B, 2, dim]
        e0_pair = linear(silu(e_pair), _f32(params["time_projection"]["fc"]))
        e0_pair = e0_pair.reshape(b, 2, 6, cfg.dim)
        mask = binary_t_mask.astype(jnp.float32)               # [B, L_video]
        if mask.shape[1] < seq_len:   # ref + tail tokens use t (mask=1)
            padn = seq_len - mask.shape[1]
            if l_ref:
                mask = jnp.concatenate(
                    [jnp.ones((b, l_ref), mask.dtype), mask,
                     jnp.ones((b, padn - l_ref), mask.dtype)], axis=1)
            else:
                mask = jnp.concatenate(
                    [mask, jnp.ones((b, padn), mask.dtype)], axis=1)
        e0 = ("binary", e0_pair, mask)       # resolved inside the blocks
        e_head = (e_pair[:, 0:1] * mask[:, :, None]
                  + e_pair[:, 1:2] * (1 - mask[:, :, None]))   # [B, L, dim]
    elif t.ndim == 2:   # general per-token
        if t.shape[1] < seq_len:   # pad tail with last element (`:929-934`)
            padn = seq_len - t.shape[1]
            t = jnp.concatenate([t, jnp.repeat(t[:, -1:], padn, axis=1)], axis=1)
        e = time_mlp(t.astype(jnp.float32))                   # [B, L, dim]
        e0 = linear(silu(e), _f32(params["time_projection"]["fc"]))
        e0 = e0.reshape(b, seq_len, 6, cfg.dim)               # [B, L, 6, dim]
        e_head = e                                            # [B, L, dim]
    else:
        e = time_mlp(t.astype(jnp.float32))                   # [B, dim]
        e0 = linear(silu(e), _f32(params["time_projection"]["fc"]))
        e0 = e0.reshape(b, 1, 6, cfg.dim)
        e_head = e                                            # [B, dim]

    # --- density embeddings, fp32 (`:950-955`)
    if density is not None:
        demb = sinusoidal_embedding_1d(cfg.freq_dim, density.astype(jnp.float32))
        de = linear(silu(linear(demb, _f32(params["density_embedding"]["fc1"]))),
                    _f32(params["density_embedding"]["fc2"]))
        de0 = linear(silu(de), _f32(params["density_projection"]["fc"]))
        de0 = de0.reshape(b, 1, 2, cfg.dim)
        de_head = de                                          # [B, dim]
    else:
        de0 = jnp.zeros((b, 1, 2, cfg.dim), jnp.float32)
        de_head = jnp.zeros((b, cfg.dim), jnp.float32)

    # --- text context MLP (`:957-964`)
    ctx = linear(context.astype(compute_dtype), params["text_embedding"]["fc1"])
    ctx = linear(gelu_tanh(ctx), params["text_embedding"]["fc2"])

    # sequence-parallel sharding of the token axis (replaces the reference's
    # manual chunk/all_gather over NCCL, `:971-975,1103-1104`); no-op
    # without an active mesh
    tokens = token_constraint(tokens, ("dp", "sp", None))

    return tokens, e0, de0, e_head, de_head, cos, sin, ctx, grid, l_ref


def _dit_blocks(params, cfg, tokens, e0, de0, cos, sin, ctx, attn_fn,
                remat: str = "none"):
    """The 30-block stack under `lax.scan` (`:1052-1089`).

    `remat` replaces the reference's selective activation checkpointing
    (`FlexAM/utils/ac_handle.py:16-64` wraps a fraction p of blocks):
      * "none"  — keep all activations (inference default);
      * "full"  — jax.checkpoint every block (p=1);
      * "dots"  — remat with the save-dots-except-small policy: matmul
        outputs are kept, elementwise chains recomputed — the XLA-idiomatic
        middle ground the torch fractional wrapper approximates.
    """
    def body(carry, bp):
        out = _block_forward(bp, carry, e0, de0, cos, sin, ctx, cfg, attn_fn)
        out = token_constraint(out, ("dp", "sp", None))
        return out, None

    if remat == "full":
        body = jax.checkpoint(body)
    elif remat == "dots":
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    tokens, _ = jax.lax.scan(body, tokens, params["blocks"])
    return tokens


def _dit_finish(params, cfg, tokens, e_head, de_head, grid, l_ref):
    """Head + ref-token strip + unpatchify (`:1091-1149`)."""
    tokens = _head_forward(params["head"], tokens, e_head, de_head,
                           cfg.patch_size, cfg.out_dim)
    if l_ref:
        tokens = tokens[:, l_ref:]
        grid = (grid[0] - 1, grid[1], grid[2])
    return _unpatchify(tokens, grid, cfg.patch_size, cfg.out_dim)


def dit_forward(
    params: dict,
    cfg: DiTConfig,
    x: jnp.ndarray,                     # [B, C_lat, F, H, W] noisy latent
    t: jnp.ndarray,                     # [B] or [B, L_video] timesteps
    context: jnp.ndarray,               # [B, text_len, text_dim] (zero-padded)
    density: Optional[jnp.ndarray] = None,     # [B]
    y: Optional[jnp.ndarray] = None,           # [B, C_y, F, H, W] cond latents
    additional_control: Optional[jnp.ndarray] = None,  # [B, C_ac, F, H, W]
    full_ref: Optional[jnp.ndarray] = None,    # [B, C_lat, H, W]
    rope_tables: Optional[jnp.ndarray] = None, # [max_seq, head_dim//2] angles
    attn_fn: Callable = default_attention,
    y_camera: Optional[jnp.ndarray] = None,    # [B, C*4, F, H, W] Plucker
    binary_t_mask: Optional[jnp.ndarray] = None,  # [B, L_video] 1=t, 0=zero
) -> jnp.ndarray:
    """Forward pass (`WanTransformer3DModel_FlexAM.forward`, `:818-1123`).
    Returns the velocity prediction [B, out_dim, F, H, W]."""
    tokens, e0, de0, e_head, de_head, cos, sin, ctx, grid, l_ref = \
        _dit_prepare(params, cfg, x, t, context, density, y,
                     additional_control, full_ref, rope_tables, y_camera,
                     binary_t_mask)
    tokens = _dit_blocks(params, cfg, tokens, e0, de0, cos, sin, ctx, attn_fn)
    return _dit_finish(params, cfg, tokens, e_head, de_head, grid, l_ref)


def init_teacache_state(batch: int, seq_len: int, dim: int,
                        dtype=jnp.bfloat16) -> dict:
    """Carryable TeaCache state (`FlexAM/models/cache_utils.py:21-77`)."""
    return {
        "prev_mod": jnp.zeros((batch, 6, dim), jnp.float32),
        "accum": jnp.zeros((), jnp.float32),
        "residual": jnp.zeros((batch, seq_len, dim), dtype),
        "computed": jnp.zeros((), jnp.float32),   # diagnostics: #computed
    }


# Fitted rescale polynomials per model family
# (`cache_utils.py:get_teacache_coefficients`)
TEACACHE_COEFFICIENTS = {
    "wan2.1-1.3b": (-5.21862437e+04, 9.23041404e+03, -5.28275948e+02,
                    1.36987616e+01, -4.99875664e-02),
    "wan2.1-t2v-14b": (-3.03318725e+05, 4.90537029e+04, -2.65530556e+03,
                       5.87365115e+01, -3.15583525e-01),
    "wan2.1-i2v-14b-480p": (2.57151496e+05, -3.54229917e+04, 1.40286849e+03,
                            -1.35890334e+01, 1.32517977e-01),
    "wan2.2": (8.10705460e+03, 2.13393892e+03, -3.72934672e+02,
               1.66203073e+01, -4.17769401e-02),
}


def get_teacache_coefficients(model_name: str):
    """Model-name keyed lookup (`cache_utils.py:4-18`)."""
    n = model_name.lower()
    if any(k in n for k in ("wan2.1-t2v-1.3b", "wan2.1-fun-1.3b",
                            "wan2.1-fun-v1.1-1.3b", "wan2.1-vace-1.3b")):
        return TEACACHE_COEFFICIENTS["wan2.1-1.3b"]
    if "wan2.1-t2v-14b" in n:
        return TEACACHE_COEFFICIENTS["wan2.1-t2v-14b"]
    if "wan2.1-i2v-14b-480p" in n:
        return TEACACHE_COEFFICIENTS["wan2.1-i2v-14b-480p"]
    if any(k in n for k in ("wan2.1-i2v-14b-720p", "wan2.1-fun-14b", "wan2.2",
                            "wan2.1-vace-14b")):
        return TEACACHE_COEFFICIENTS["wan2.2"]
    print(f"The model {model_name} is not supported by TeaCache.")
    return None


WAN22_TEACACHE_COEFFICIENTS = TEACACHE_COEFFICIENTS["wan2.2"]


def dit_forward_teacache(
    params: dict,
    cfg: DiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    tea_state: dict,
    step_index: jnp.ndarray,            # traced int32 step counter
    density: Optional[jnp.ndarray] = None,
    y: Optional[jnp.ndarray] = None,
    additional_control: Optional[jnp.ndarray] = None,
    full_ref: Optional[jnp.ndarray] = None,
    rope_tables: Optional[jnp.ndarray] = None,
    attn_fn: Callable = default_attention,
    coefficients: Tuple[float, ...] = WAN22_TEACACHE_COEFFICIENTS,
    rel_l1_thresh: float = 0.10,
    num_skip_start_steps: int = 5,
    binary_t_mask: Optional[jnp.ndarray] = None,
):
    """TeaCache forward (`wan_transformer3d_FlexAM.py:977-1008,1048-1051`):
    poly-rescaled rel-L1 of the modulated input accumulates across steps;
    below threshold the block stack is skipped and the cached residual is
    re-applied. Data-dependent -> `lax.cond` with both branches compiled.

    Returns (velocity, new_tea_state).
    """
    tokens, e0, de0, e_head, de_head, cos, sin, ctx, grid, l_ref = \
        _dit_prepare(params, cfg, x, t, context, density, y,
                     additional_control, full_ref, rope_tables, None,
                     binary_t_mask)

    # modulated input: e0 (scalar t) or the last token's e0 (per-token t,
    # `:981-983`). The last token is always a t-valued one, so in binary
    # mode this is the pair's t branch.
    if isinstance(e0, tuple):
        mod = e0[1][:, 0].astype(jnp.float32)
    else:
        mod = e0[:, -1].astype(jnp.float32)

    prev_mod = tea_state["prev_mod"]
    rel = jnp.mean(jnp.abs(mod - prev_mod)) / (jnp.mean(jnp.abs(prev_mod))
                                               + 1e-12)
    poly = jnp.polyval(jnp.asarray(coefficients, jnp.float32), rel)
    accum = tea_state["accum"] + poly

    in_warmup = step_index < num_skip_start_steps
    should_calc = jnp.logical_or(in_warmup, accum >= rel_l1_thresh)
    accum = jnp.where(should_calc, 0.0, accum)

    def run(tokens):
        out = _dit_blocks(params, cfg, tokens, e0, de0, cos, sin, ctx,
                          attn_fn)
        return out, (out - tokens)

    def skip(tokens):
        return tokens + tea_state["residual"].astype(tokens.dtype), \
            tea_state["residual"]

    tokens, residual = jax.lax.cond(should_calc, run, skip, tokens)

    new_state = {
        "prev_mod": mod,
        "accum": accum,
        "residual": residual.astype(tea_state["residual"].dtype),
        "computed": tea_state["computed"] + should_calc.astype(jnp.float32),
    }
    return _dit_finish(params, cfg, tokens, e_head, de_head, grid, l_ref), \
        new_state




def _f32(lin_params: dict) -> dict:
    """Cast a linear's params to fp32 (time/density paths run fp32)."""
    out = {"weight": lin_params["weight"].astype(jnp.float32)}
    if "bias" in lin_params:
        out["bias"] = lin_params["bias"].astype(jnp.float32)
    return out


def make_rope_tables_for(cfg: DiTConfig, riflex: Optional[dict] = None):
    """Host-side RoPE angle tables for a config (`:658-665`, riflex
    `:774-788`)."""
    return make_rope_tables(cfg.head_dim, cfg.rope_max_seq, riflex=riflex)
