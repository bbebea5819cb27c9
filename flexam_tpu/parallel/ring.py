"""Ring sequence-parallel attention over the ICI mesh.

Behavioral reference: the ring half of the reference's xDiT USP hybrid
(`ulysses_degree` x `ring_degree`, `ui/controller.py:63,89-95`;
implementation absent from the release — SURVEY.md §2.5/§5.7).

TPU-native: KV shards rotate around the sp ring with `lax.ppermute` while
each chip keeps its Q shard and accumulates exact online-softmax partials
(the flash-attention recurrence across chips). Collectives ride ICI;
compute on each hop overlaps the next permute under XLA's scheduler.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def ring_accumulate(q_l, k_l, v_l, axis: str, size: int, scale: float,
                    block_mask=None, blk: int = 0) -> jnp.ndarray:
    """Exact cross-chip online-softmax over a named ring axis, inside a
    shard_map body. q_l/k_l/v_l: local shards [B, Lq, H, D]; KV rotates
    `size` hops with ppermute. Shared by ring SP and the Ulysses x ring
    USP hybrid.

    Block-sparse mode (`block_mask` [nb, nb] bool over the FULL sequence
    in `blk`-token blocks): each hop applies the sub-mask between this
    rank's query slice and the hop's KV origin slice — the exact masked
    semantics of `ops.sparse_attention` distributed over the ring, the
    sparse half of the reference's paifuser + xDiT USP stack
    (`FlexAM/models/__init__.py:44-48` + `ui/controller.py:63,89-95`).
    Ranks hold CONTIGUOUS L/size token slices (the USP layout)."""
    qf = q_l.astype(jnp.float32) * scale
    # derive carries from qf so they inherit shard_map's varying
    # manual axes (fresh zeros are 'unvarying' and break the scan)
    qbh = jnp.swapaxes(qf, 1, 2)            # [B, H, Lq, D]
    m0 = qbh[..., :1] * 0.0 - 1e30
    l0 = qbh[..., :1] * 0.0
    acc0 = qbh * 0.0
    perm = [(i, (i + 1) % size) for i in range(size)]
    if block_mask is not None:
        lq, lk = q_l.shape[1], k_l.shape[1]
        assert blk > 0 and lq % blk == 0 and lk % blk == 0, (lq, lk, blk)
        nbl_q, nbl_k = lq // blk, lk // blk
        block_mask = jnp.asarray(block_mask, bool)
        my = jax.lax.axis_index(axis)

    def step(carry, s):
        k_blk, v_blk, m, l, acc = carry
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32))
        if block_mask is not None:
            # KV held at step s originated at rank (my - s) mod size
            origin = jax.lax.rem(my - s + size, size)
            sub = jax.lax.dynamic_slice(
                block_mask, (my * nbl_q, origin * nbl_k), (nbl_q, nbl_k))
            mask_tok = jnp.repeat(jnp.repeat(sub, blk, 0), blk, 1)
            logits = jnp.where(mask_tok[None, None], logits, -1e30)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(logits - m_new)
        if block_mask is not None:
            # a hop where a row sees NO keys leaves m_new at -1e30 and
            # exp(0)=1 would leak mass — zero the masked lanes explicitly
            p = jnp.where(mask_tok[None, None], p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32))
        k_nxt = jax.lax.ppermute(k_blk, axis, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis, perm)
        return (k_nxt, v_nxt, m_new, l, acc), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        step, (k_l, v_l, m0, l0, acc0), jnp.arange(size, dtype=jnp.int32))
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.einsum("bhqd->bqhd", out).astype(q_l.dtype)


def make_ring_attention(
    mesh: Mesh,
    seq_axis: str = "sp",
    batch_axis: Optional[str] = "dp",
) -> Callable:
    """Returns attn_fn(q, k, v, k_len=None, scale=None) for `dit_forward`.
    Self-attention rotates KV; cross-attention runs locally (kv
    replicated)."""
    sp = mesh.shape[seq_axis]

    def attn(q, k, v, k_len=None, scale=None):
        d = q.shape[-1]
        s = scale if scale is not None else d ** -0.5
        if sp == 1 or q.shape[1] != k.shape[1]:
            from flexam_tpu.parallel.ulysses import make_ulysses_attention
            return make_ulysses_attention(mesh, seq_axis, batch_axis)(
                q, k, v, k_len=k_len, scale=scale)

        def local(q_l, k_l, v_l):
            return ring_accumulate(q_l, k_l, v_l, seq_axis, sp, s)

        spec = P(batch_axis, seq_axis, None, None)
        return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)

    return attn
