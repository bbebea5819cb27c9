"""INT8-quantized Pallas flash attention (SageAttention equivalent).

Behavioral reference: the reference's SageAttention path
(`FlexAM/models/attention_utils.py:18-41,195-202` — per-SM CUDA wheels
selected at runtime). SURVEY.md §2.4 lists the quantized variant as the
optional inference-speed kernel.

Design (SageAttention recipe, TPU-adapted):
  * k is smoothed by its per-(batch, head) sequence mean OUTSIDE the
    kernel — softmax is invariant to the induced per-row constant, and
    centering shrinks the quantization range;
  * q and k blocks are quantized IN-KERNEL to int8 with per-row absmax
    scales; the qk^T matmul runs on the MXU int8 path (2x bf16 rate on
    v5e) accumulating int32, then dequantizes with the outer product of
    the row scales;
  * softmax in fp32; p@v stays bf16 (the reference keeps pv high
    precision too).

Select with FLEXAM_ATTENTION=pallas_int8.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _quantize_rows(x):
    """[R, D] -> (int8 [R, D], fp32 scale [R, 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _int8_flash_kernel(klen_ref, q_ref, k_ref, v_ref, o_ref,
                       acc_ref, m_ref, l_ref, *, scale, blk):
    b = pl.program_id(0)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    q_i8, q_s = _quantize_rows(q)
    k_i8, k_s = _quantize_rows(k)
    s_i32 = jax.lax.dot_general(
        q_i8, k_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    s = s_i32.astype(jnp.float32) * (q_s * scale) * k_s[:, 0][None, :]

    k_len = klen_ref[b]
    col = j * blk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < k_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit,
                   static_argnames=("scale", "blq", "blk", "interpret"))
def _int8_flash_bhld(q, k, v, k_len, scale, blq, blk, interpret=False):
    B, H, Lq, D = q.shape
    S = k.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, Lq // blq, S // blk),
        in_specs=[
            pl.BlockSpec((1, 1, blq, D), lambda b, h, i, j, kl: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk, D), lambda b, h, i, j, kl: (b, h, j, 0)),
            pl.BlockSpec((1, 1, blk, D), lambda b, h, i, j, kl: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, blq, D),
                               lambda b, h, i, j, kl: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((blq, D), jnp.float32),
            pltpu.VMEM((blq, 128), jnp.float32),
            pltpu.VMEM((blq, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_int8_flash_kernel, scale=scale, blk=blk)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * S * D,
            bytes_accessed=2 * B * H * (Lq + 2 * S) * D,
            transcendentals=B * H * Lq * S,
        ),
    )(k_len, q, k, v)


def int8_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    k_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    blq: int = 1024, blk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, L, H, D] attention with int8 qk^T. k is mean-smoothed per
    (batch, head) before quantization (softmax-invariant)."""
    B, Lq, H, D = q.shape
    S = k.shape[1]
    if D % 128 != 0:
        raise NotImplementedError(f"head_dim % 128 != 0 ({D})")
    if scale is None:
        scale = D ** -0.5
    if k_len is None:
        k_len = jnp.full((B,), S, dtype=jnp.int32)
    else:
        k_len = k_len.astype(jnp.int32)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    # SageAttention k-smoothing: subtract the per-(b,h) sequence mean —
    # adds a per-row constant to the logits, cancelled by softmax
    kt = kt - jnp.mean(kt.astype(jnp.float32), axis=2,
                       keepdims=True).astype(kt.dtype)

    blq = min(blq, _ceil_to(Lq, 128))
    blk = min(blk, _ceil_to(S, 128))
    Lq_p, S_p = _ceil_to(Lq, blq), _ceil_to(S, blk)
    if Lq_p != Lq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Lq_p - Lq), (0, 0)))
    if S_p != S:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, S_p - S), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, S_p - S), (0, 0)))
        k_len = jnp.minimum(k_len, S)

    out = _int8_flash_bhld(qt, kt, vt, k_len, float(scale), blq, blk,
                           interpret)
    return jnp.transpose(out[:, :, :Lq, :], (0, 2, 1, 3))
