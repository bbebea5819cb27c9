"""Ulysses sequence-parallel attention over the ICI mesh.

Behavioral reference: the reference's xDiT USP design —
`xFuserLongContextAttention` / `usp_attn_forward` bound onto every block
(`wan_transformer3d_FlexAM.py:22-24,801-815`), chunking the token axis
per rank and exchanging heads<->sequence inside attention (SURVEY.md
§5.7). The released repo ships only the interface (FlexAM/dist is absent).

TPU-native: one `shard_map` over the ("dp","sp") mesh axes. Tokens arrive
sharded on sp; two `lax.all_to_all`s swap sequence<->head sharding so each
chip runs FULL-sequence attention over H/sp heads with the local Pallas
flash kernel — the classic Ulysses schedule, with XLA lowering the
all-to-alls onto ICI.

Cross-attention (kv = 512 text tokens, replicated) needs no collectives:
each chip attends its token shard against the full kv locally.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from flexam_tpu.core.attention import attention as default_attention


def make_ulysses_attention(
    mesh: Mesh,
    seq_axis: str = "sp",
    batch_axis: Optional[str] = "dp",
    inner: Callable = default_attention,
) -> Callable:
    """Returns an attn_fn(q, k, v, k_len=None) for `dit_forward`.

    Layout [B, L, H, D]; self-attention (Lq == Lk) runs the Ulysses
    all-to-all schedule; cross-attention (Lk != Lq) runs locally against
    the replicated kv. num_heads must be divisible by the sp axis size
    (indivisible calls fall back to the inner dispatch).

    `inner` sees the FULL sequence with H/sp heads after the all-to-all,
    so the block-sparse video kernel composes directly:
    `make_ulysses_attention(mesh, inner=make_sparse_attn_fn(...))` runs
    the Pallas sparse kernel per shard — the sparse+SP stack the
    reference builds from paifuser under xDiT
    (`FlexAM/models/__init__.py:44-48` + `wan_transformer3d_FlexAM.py:
    801-815`). The sparse inner's own non-video calls (cross-attention)
    fall through to its dense dispatch unchanged.
    """
    sp = mesh.shape[seq_axis]
    dp = mesh.shape[batch_axis] if batch_axis else 1

    def attn(q, k, v, k_len=None, scale=None):
        if sp == 1:
            return inner(q, k, v, k_len=k_len, scale=scale)
        b, lq, h, d = q.shape
        lk = k.shape[1]
        # per-call shape guards: the cfg-skip tail drops the uncond half
        # (batch 1 under dp=2 — replicate batch for those chunks), and
        # geometries the mesh does not divide fall back to the inner
        # dispatch (GSPMD partitions the XLA path freely)
        bspec = batch_axis if (batch_axis and b % dp == 0) else None

        if lq == lk and lq % sp == 0 and h % sp == 0:   # Ulysses
            def local(q_l, k_l, v_l):
                # [B, L/sp, H, D] -> [B, L, H/sp, D]
                qh = jax.lax.all_to_all(q_l, seq_axis, split_axis=2,
                                        concat_axis=1, tiled=True)
                kh = jax.lax.all_to_all(k_l, seq_axis, split_axis=2,
                                        concat_axis=1, tiled=True)
                vh = jax.lax.all_to_all(v_l, seq_axis, split_axis=2,
                                        concat_axis=1, tiled=True)
                o = inner(qh, kh, vh, k_len=None, scale=scale)
                # back: [B, L, H/sp, D] -> [B, L/sp, H, D]
                return jax.lax.all_to_all(o, seq_axis, split_axis=1,
                                          concat_axis=2, tiled=True)

            spec = P(bspec, seq_axis, None, None)
            return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                             out_specs=spec)(q, k, v)

        if lq != lk and lq % sp == 0 and k_len is None:
            # cross-attention: kv replicated, tokens stay sp-sharded
            def local_cross(q_l, k_r, v_r):
                return inner(q_l, k_r, v_r, k_len=None, scale=scale)

            qspec = P(bspec, seq_axis, None, None)
            kvspec = P(bspec, None, None, None)
            return shard_map(local_cross, mesh=mesh,
                             in_specs=(qspec, kvspec, kvspec),
                             out_specs=qspec)(q, k, v)

        return inner(q, k, v, k_len=k_len, scale=scale)

    return attn
