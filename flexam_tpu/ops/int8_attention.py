"""INT8-quantized Pallas flash attention (SageAttention equivalent).

Behavioral reference: the reference's SageAttention path
(`FlexAM/models/attention_utils.py:18-41,195-202` — per-SM CUDA wheels
selected at runtime). SURVEY.md §2.4 lists the quantized variant as the
inference-speed kernel; on v5e the int8 MXU path runs at 2x the bf16 rate
(394 vs 197 TOPS), halving the qk^T time.

Design (SageAttention recipe, TPU-adapted):
  * k is smoothed by its per-(batch, head) sequence mean OUTSIDE the
    kernel — softmax is invariant to the induced per-row constant, and
    centering shrinks the quantization range;
  * q and k are quantized OUTSIDE the kernel (one cheap XLA pass) to int8
    with per-(batch, head, block) absmax scales; the tiny [B, H, nblocks]
    scale tables ride the scalar-prefetch channel, so dequantization is a
    single scalar multiply folded into the softmax scale — the kernel body
    adds no VPU work over the bf16 kernel;
  * softmax in fp32 with exp2 (log2e folded into the scale); p@v stays
    bf16 (the reference keeps pv high precision too).

Select with FLEXAM_ATTENTION=pallas_int8 (or VIDEOX_ATTENTION_TYPE=sage).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexam_tpu.ops.pallas_util import out_sds as _out_sds

from flexam_tpu.ops.flash_attention import _auto_block, _ceil_to

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _int8_flash_kernel(klen_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref, o_ref,
                       acc_ref, m_ref, l_ref, *, scale, blk, masked):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
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

    s_i32 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
    # dequant = one scalar: per-block q/k scales * softmax scale * log2e
    deq = qs_ref[b, h, i] * ks_ref[b, h, j] * (scale * _LOG2E)
    s = s_i32.astype(jnp.float32) * deq

    if masked:
        k_len = klen_ref[b]
        col = j * blk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < k_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _quantize_blocks(x, blk):
    """[B, H, L, D] -> (int8 same shape, f32 scales [B, H, L//blk])
    with per-(batch, head, block) absmax scales."""
    B, H, L, D = x.shape
    xb = x.reshape(B, H, L // blk, blk * D).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xb), axis=-1)
    scale = jnp.maximum(absmax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(xb / scale[..., None]), -127, 127)
    return q.astype(jnp.int8).reshape(B, H, L, D), scale


@functools.partial(jax.jit,
                   static_argnames=("scale", "blq", "blk", "masked",
                                    "interpret"))
def _int8_flash_bhld(q, k, v, k_len, scale, blq, blk, masked,
                     interpret=False):
    B, H, Lq, D = q.shape
    S = k.shape[2]
    q_i8, q_s = _quantize_blocks(q, blq)
    k_i8, k_s = _quantize_blocks(k, blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, H, Lq // blq, S // blk),
        in_specs=[
            pl.BlockSpec((1, 1, blq, D),
                         lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk, D),
                         lambda b, h, i, j, *_: (b, h, j, 0)),
            pl.BlockSpec((1, 1, blk, D),
                         lambda b, h, i, j, *_: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, blq, D),
                               lambda b, h, i, j, *_: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((blq, D), jnp.float32),
            pltpu.VMEM((blq, 128), jnp.float32),
            pltpu.VMEM((blq, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_int8_flash_kernel, scale=scale, blk=blk,
                               masked=masked)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=_out_sds((B, H, Lq, D), v.dtype, v),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * S * D,
            bytes_accessed=B * H * (Lq + 3 * S) * D,
            transcendentals=B * H * Lq * S,
        ),
    )(k_len, q_s, k_s, q_i8, k_i8, v)


def int8_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    k_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    blq: Optional[int] = None, blk: Optional[int] = None,
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

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    # SageAttention k-smoothing: subtract the per-(b,h) sequence mean —
    # adds a per-row constant to the logits, cancelled by softmax
    kt = kt - jnp.mean(kt.astype(jnp.float32), axis=2,
                       keepdims=True).astype(kt.dtype)

    if blq is None:
        blq = _auto_block(Lq)
    if blk is None:
        blk = _auto_block(S)
    blq = min(blq, _ceil_to(Lq, 128))
    blk = min(blk, _ceil_to(S, 128))
    Lq_p, S_p = _ceil_to(Lq, blq), _ceil_to(S, blk)
    masked = (k_len is not None) or (S_p != S)
    if k_len is None:
        k_len = jnp.full((B,), S, dtype=jnp.int32)
    else:
        k_len = k_len.astype(jnp.int32)
    if Lq_p != Lq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Lq_p - Lq), (0, 0)))
    if S_p != S:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, S_p - S), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, S_p - S), (0, 0)))
        k_len = jnp.minimum(k_len, S)

    out = _int8_flash_bhld(qt, kt, vt, k_len, float(scale), blq, blk,
                           masked, interpret)
    return jnp.transpose(out[:, :, :Lq, :], (0, 2, 1, 3))
