"""Pallas TPU flash attention.

The centerpiece kernel of the rebuild (SURVEY.md §2.4): replaces the CUDA
FlashAttention-2/3 wheels consumed by the reference at
`FlexAM/models/attention_utils.py:43-171`.

Design (MXU-tiled online softmax):
  * layout [B, H, L, D]; grid (B, H, nq, nk) with the key axis innermost, so
    K/V blocks stream through VMEM double-buffered by the Pallas pipeline;
  * fp32 running max/denominator/accumulator in VMEM scratch persisting
    across the nk grid steps; output written on the last key block;
  * padded keys masked via a scalar-prefetched per-batch `k_len` (the
    reference's varlen `k_lens`/cu_seqlens path collapsed to static masking).

Constraints: D must be a multiple of 128 (MXU lane width); callers fall back
to XLA attention otherwise (tiny-test configs, CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexam_tpu.ops.pallas_util import out_sds as _out_sds

_NEG_INF = -1e30


def _flash_kernel(
    klen_ref,        # SMEM scalar prefetch: [B] int32
    q_ref,           # [1, 1, BLQ, D]
    k_ref,           # [1, 1, BLK, D]
    v_ref,           # [1, 1, BLK, D]
    o_ref,           # [1, 1, BLQ, D]
    acc_ref,         # VMEM [BLQ, D] f32
    m_ref,           # VMEM [BLQ, 128] f32
    l_ref,           # VMEM [BLQ, 128] f32
    *,
    scale: float,
    blk: int,
    kv_len: int,
    masked: bool,
):
    b = pl.program_id(0)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]                                   # [BLQ, D]
    k = k_ref[0, 0]                                   # [BLK, D]
    v = v_ref[0, 0]

    # log2(e) folded into the softmax scale so exp2 (the native VPU
    # transcendental) replaces exp — exact: exp2(x*log2e) == exp(x)
    # precision pinned to DEFAULT: the global jax_default_matmul_precision
    # ("highest" in test/debug setups) otherwise leaks into the kernel as
    # contract_precision<fp32> on bf16 operands, which Mosaic rejects on
    # v5e ("Bad lhs type" — found by the topology-AOT compile)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * (scale * 1.4426950408889634)                   # [BLQ, BLK]

    if masked:   # static: skipped entirely when tiling is exact & no k_len
        k_len = klen_ref[b]
        col = j * blk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < k_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]                              # [BLQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)         # [BLQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)                   # [BLQ, 1]
    p = jnp.exp2(s - m_new)                            # [BLQ, BLK] f32

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )                                                  # [BLQ, D]
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _finalize():
        denom = l_ref[:, :1]
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _single_kv_kernel(klen_ref, q_ref, k_ref, v_ref, o_ref, *,
                      scale: float, masked: bool):
    """One kv block covers the whole key sequence (cross-attention,
    kv = 512 text tokens): plain softmax, no online-softmax carry state —
    measured 1.5x the streaming kernel at the flagship cross-attn shape."""
    b = pl.program_id(0)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * (scale * 1.4426950408889634)
    if masked:
        k_len = klen_ref[b]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < k_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0, 0] = (pv / l).astype(o_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _auto_block(n: int, hi: int = 1456, lo: int = 512,
                default: int = 1024) -> int:
    """Largest exact divisor of n in [lo, hi] (16-aligned): exact tiling
    means zero padded FLOPs and no key masking. The flagship 11,648-token
    sequence tiles exactly at 1456 (measured 103 TF/s vs 87 at padded
    1024x1024 on v5e); hi is capped so the f32 [blq, blk] logits tile stays
    within the ~16 MB VMEM budget (1664^2 OOMs)."""
    if n >= lo:
        for b in range(hi - hi % 16, lo - 1, -16):
            if n % b == 0:
                return b
    return min(default, _ceil_to(n, 128))


@functools.partial(jax.jit, static_argnames=("scale", "blq", "blk",
                                             "masked", "interpret"))
def _flash_bhld(q, k, v, k_len, scale, blq, blk, masked, interpret=False):
    B, H, Lq, D = q.shape
    S = k.shape[2]
    nq = Lq // blq
    nk = S // blk

    if nk == 1:
        return pl.pallas_call(
            functools.partial(_single_kv_kernel, scale=scale, masked=masked),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, H, nq),
                in_specs=[
                    pl.BlockSpec((1, 1, blq, D), lambda b, h, i, kl: (b, h, i, 0)),
                    pl.BlockSpec((1, 1, blk, D), lambda b, h, i, kl: (b, h, 0, 0)),
                    pl.BlockSpec((1, 1, blk, D), lambda b, h, i, kl: (b, h, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, blq, D),
                                       lambda b, h, i, kl: (b, h, i, 0)),
            ),
            out_shape=_out_sds((B, H, Lq, D), q.dtype, q),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * Lq * S * D,
                bytes_accessed=2 * B * H * (2 * Lq + 2 * S) * D,
                transcendentals=B * H * Lq * S,
            ),
        )(k_len, q, k, v)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq, nk),
        in_specs=[
            # index maps receive the scalar-prefetch ref as an extra arg
            pl.BlockSpec((1, 1, blq, D), lambda b, h, i, j, klen: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk, D), lambda b, h, i, j, klen: (b, h, j, 0)),
            pl.BlockSpec((1, 1, blk, D), lambda b, h, i, j, klen: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, blq, D),
                               lambda b, h, i, j, klen: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((blq, D), jnp.float32),
            pltpu.VMEM((blq, 128), jnp.float32),
            pltpu.VMEM((blq, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_flash_kernel, scale=scale, blk=blk, kv_len=S,
                               masked=masked)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_out_sds((B, H, Lq, D), q.dtype, q),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # kv axis is a sequential reduction; the rest parallel — the
            # hint lets Mosaic pipeline across kv steps (+9% measured)
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * S * D,
            bytes_accessed=2 * B * H * (Lq + 2 * S) * D,
            transcendentals=B * H * Lq * S,
        ),
    )(k_len, q, k, v)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    blq: Optional[int] = None,
    blk: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over [B, L, H, D] tensors (same layout as the
    reference `attention()`, `attention_utils.py:174`).

    Block sizes default to exact divisors of L/S when one exists (zero
    padding + the key mask compiled out); otherwise pads to block
    multiples and masks padded keys via `k_len`.
    """
    B, Lq, H, D = q.shape
    S = k.shape[1]
    if D % 128 != 0:
        raise NotImplementedError(f"flash_attention requires head_dim % 128 == 0, got {D}")
    if scale is None:
        scale = D ** -0.5

    if blq is None:
        blq = _auto_block(Lq)
    if blk is None:
        blk = _auto_block(S)
    blq = min(blq, _ceil_to(Lq, 128))
    blk = min(blk, _ceil_to(S, 128))
    Lq_p = _ceil_to(Lq, blq)
    S_p = _ceil_to(S, blk)
    masked = (k_len is not None) or (S_p != S)

    if k_len is None:
        k_len = jnp.full((B,), S, dtype=jnp.int32)
    else:
        k_len = k_len.astype(jnp.int32)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if Lq_p != Lq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Lq_p - Lq), (0, 0)))
    if S_p != S:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, S_p - S), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, S_p - S), (0, 0)))
        k_len = jnp.minimum(k_len, S)

    out = _flash_bhld(qt, kt, vt, k_len, float(scale), blq, blk, masked,
                      interpret)
    out = out[:, :, :Lq, :]
    return jnp.transpose(out, (0, 2, 1, 3))
