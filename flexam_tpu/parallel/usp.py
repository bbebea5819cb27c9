"""USP: Ulysses x ring hybrid sequence parallelism.

Behavioral reference: the reference exposes `ulysses_degree x ring_degree`
(`ui/controller.py:63,89-95`, `set_multi_gpus_devices`) through xDiT's
`xFuserLongContextAttention` — the two schedules COMPOSE: the sequence
axis is factored over two mesh axes, heads are exchanged within each
Ulysses group (all-to-all), and KV shards rotate around the ring axis
between groups. The released repo ships only the interface (FlexAM/dist
absent, SURVEY.md §2.5).

TPU-native layout: tokens sharded over ("ring", "ulysses") jointly
(ring-major, so each ring rank holds a contiguous L/ring slice after the
Ulysses gather). Inside one shard_map:

  [B, L/(r*u), H, D]
    -- all_to_all over ulysses (heads<->seq) --> [B, L/r, H/u, D]
    -- ring_accumulate over ring (ppermute KV, online softmax) -->
    -- all_to_all back --> [B, L/(r*u), H, D]

The ulysses all-to-alls ride the fast inner ICI dimension; the ring hops
can span the slower outer dimension — the same reason xDiT composes them.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from flexam_tpu.core.attention import attention as default_attention
from flexam_tpu.parallel.ring import ring_accumulate


def make_usp_attention(
    mesh: Mesh,
    ulysses_axis: str = "sp",
    ring_axis: str = "ring",
    batch_axis: Optional[str] = "dp",
    inner: Callable = default_attention,
    sparse: Optional[dict] = None,
) -> Callable:
    """attn_fn(q, k, v, k_len=None, scale=None) for `dit_forward`, tokens
    sharded over ring_axis x ulysses_axis. num_heads must be divisible by
    the ulysses degree.

    `sparse`: an `ops.sparse_attention.video_sparse_policy` dict — video
    self-attention calls (Lq == Lk == policy["video_len"]) then run the
    block-sparse mask THROUGH the ring: each hop applies the sub-mask
    between this rank's query slice and the hop's KV origin slice
    (`ring.ring_accumulate(block_mask=...)`), exact w.r.t. the policy.
    This is the sparse+SP composition the reference gets from paifuser's
    sparse wrapper stacked under xDiT USP (`FlexAM/models/__init__.py:
    44-48` + `wan_transformer3d_FlexAM.py:801-815`). For a pure-Ulysses
    mesh (ring=1) prefer `make_ulysses_attention(mesh,
    inner=make_sparse_attn_fn(...))` — the Pallas sparse kernel then
    skips the masked FLOPs entirely per shard."""
    u = mesh.shape[ulysses_axis]
    r = mesh.shape[ring_axis]
    token_spec = P(batch_axis, (ring_axis, ulysses_axis), None, None)
    block_mask = None
    if sparse is not None:
        from flexam_tpu.ops.sparse_attention import rows_to_block_mask
        block_mask = rows_to_block_mask(sparse["rows"])
        if sparse["video_len"] % (r * sparse["blk"]) != 0 \
                or len(sparse["rows"]) % r != 0:
            raise ValueError(
                f"sparse policy does not tile the ring: video_len="
                f"{sparse['video_len']}, blk={sparse['blk']}, "
                f"nb={len(sparse['rows'])}, ring={r}")

    def attn(q, k, v, k_len=None, scale=None):
        d = q.shape[-1]
        s = float(scale) if scale is not None else d ** -0.5
        b, lq, h, _ = q.shape
        lk = k.shape[1]

        if lq != lk:
            # cross-attention: kv replicated, tokens stay sharded
            def local_cross(q_l, k_r, v_r):
                return inner(q_l, k_r, v_r, k_len=None, scale=s)
            kvspec = P(batch_axis, None, None, None)
            return shard_map(local_cross, mesh=mesh,
                             in_specs=(token_spec, kvspec, kvspec),
                             out_specs=token_spec)(q, k, v)

        assert h % u == 0, (h, u)

        sparse_here = (block_mask is not None and lq == lk
                       and lq == sparse["video_len"] and k_len is None)

        def local(q_l, k_l, v_l):
            if u > 1:
                # heads<->seq exchange within the ulysses group
                q_l = jax.lax.all_to_all(q_l, ulysses_axis, split_axis=2,
                                         concat_axis=1, tiled=True)
                k_l = jax.lax.all_to_all(k_l, ulysses_axis, split_axis=2,
                                         concat_axis=1, tiled=True)
                v_l = jax.lax.all_to_all(v_l, ulysses_axis, split_axis=2,
                                         concat_axis=1, tiled=True)
            if r > 1:
                o = ring_accumulate(
                    q_l, k_l, v_l, ring_axis, r, s,
                    block_mask=block_mask if sparse_here else None,
                    blk=sparse["blk"] if sparse_here else 0)
            else:
                o = inner(q_l, k_l, v_l, k_len=None, scale=s)
            if u > 1:
                o = jax.lax.all_to_all(o, ulysses_axis, split_axis=1,
                                       concat_axis=2, tiled=True)
            return o

        return shard_map(local, mesh=mesh,
                         in_specs=(token_spec, token_spec, token_spec),
                         out_specs=token_spec)(q, k, v)

    return attn
