"""Numerics substrate: norms, activations, embeddings, linear.

Semantics follow the reference Wan modules:
  * `rms_norm`     — `WanRMSNorm` (`wan_transformer3d_FlexAM.py:173-189`):
                     x * rsqrt(mean(x^2) + eps) * weight, mean in input dtype
                     but we accumulate in fp32 (TPU-safe) and cast back.
  * `layer_norm`   — `WanLayerNorm` (`:192-202`): LayerNorm, optionally affine.
  * `gelu_tanh`    — nn.GELU(approximate='tanh') used by DiT FFN (`:414-416`).
  * `sinusoidal_embedding_1d` — (`:31-41`): [cos | sin] halves (cos first).
  * `group_norm`   — nn.GroupNorm for the control-fusion CNN (`:680-705`).

All functions are pure; parameters are plain dicts of jnp arrays.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm over the last axis with learned scale (fp32 accumulation)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(dtype) * weight.astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm over last axis; affine only if weight/bias given (fp32 accum)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out.astype(dtype)
    if weight is not None:
        out = out * weight.astype(dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with tanh approximation (matches torch approximate='tanh').

    Computed in the input dtype like torch's bf16 path — upcasting the
    [B, 11648, 14336] FFN activation to fp32 costs ~2.7 GB of HBM traffic
    per block at the flagship scale."""
    c = x.dtype.type(math.sqrt(2.0 / math.pi))
    half = x.dtype.type(0.5)
    one = x.dtype.type(1.0)
    k = x.dtype.type(0.044715)
    return half * x * (one + jnp.tanh(c * (x + k * x * x * x)))


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def group_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
    num_groups: int, eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over channels-last input [..., C] (stats over group + all
    spatial dims except the leading batch dim).

    Input layout: [B, *spatial, C].
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    b = xf.shape[0]
    c = xf.shape[-1]
    spatial = xf.shape[1:-1]
    g = num_groups
    xg = xf.reshape(b, -1, g, c // g)           # [B, S, G, C/G]
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(b, *spatial, c)
    return (out * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """Sinusoidal embedding, [cos | sin] layout (cos half first).

    Matches `sinusoidal_embedding_1d` (`wan_transformer3d_FlexAM.py:31-41`):
    sinusoid[p, i] = p * 10000^(-i/half); output = concat([cos, sin], -1).
    Computed in fp32 (the reference uses fp64 then downcasts; for positions
    <= 1e4 and half <= 128 the fp32 error is < 1e-6 relative).
    """
    assert dim % 2 == 0
    import numpy as np
    half = dim // 2
    pos = position.astype(jnp.float32)
    # Frequencies in fp64 at trace time, split into hi+lo fp32 terms so the
    # angle pos*freq keeps ~fp32-ulp accuracy even at pos ~ 1000 (the
    # reference computes the whole product in fp64).
    freqs64 = np.power(10000.0, -np.arange(half, dtype=np.float64) / half)
    f_hi = freqs64.astype(np.float32)
    f_lo = (freqs64 - f_hi.astype(np.float64)).astype(np.float32)
    sinusoid = pos[..., None] * f_hi + pos[..., None] * f_lo
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)


def linear(x: jnp.ndarray, params: dict, precision=None) -> jnp.ndarray:
    """y = x @ W^T + b with torch Linear weight layout W: [out, in].

    Params holding {"weight_q", "w_scale"} (see `ops/qlinear.py`) take the
    int8 dynamic-quantized path — 2x MXU rate on v5e, opt-in via
    `convert_dit_to_int8`."""
    if "weight_q" in params:
        from flexam_tpu.ops.qlinear import qlinear
        return qlinear(x, params)
    y = jnp.matmul(x, params["weight"].astype(x.dtype).T, precision=precision)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(x.dtype)
    return y


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32, scale: Optional[float] = None) -> dict:
    """Xavier-uniform init (reference `init_weights`,
    `wan_transformer3d_FlexAM.py:1151-1161`)."""
    if scale is None:
        limit = math.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(key, (out_dim, in_dim), dtype=jnp.float32,
                               minval=-limit, maxval=limit)
    else:
        w = jax.random.normal(key, (out_dim, in_dim), dtype=jnp.float32) * scale
    p = {"weight": w.astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype=dtype)
    return p
