"""Block-sparse Pallas TPU flash attention for video DiT self-attention.

TPU-native counterpart of the reference's paifuser sparse attention
(`FlexAM/models/__init__.py:44-48`: `wan_sparse_attention_wrapper()` patched
over `WanSelfAttention.forward`). The paifuser kernel is a closed-source
binary, so there is no source to mirror; this module implements the same
*idea* — video self-attention restricted to a spatiotemporal sparsity
pattern — with a TPU-first design:

  * the FlexAM token stream is frame-major: `lt` frames of
    `(lh/2)*(lw/2)` spatial patches, then one ref-image block of the same
    spatial size (`models/dit.py _dit_prepare`, reference
    `wan_transformer3d_FlexAM.py:868-898`). One FRAME = one attention
    block, so block sparsity aligns exactly with temporal structure and
    tiles exactly (zero padded FLOPs, no intra-block masking);
  * sparsity policy (`video_block_rows`): each frame attends to a
    temporal window of +/-`window` frames, the first frame (global
    anchor), and the ref block; the ref block attends everywhere. This
    is the sliding-window + attention-sink pattern video sparse
    kernels converge on (e.g. Sliding Tile Attention / Sparse VideoGen
    families);
  * kernel: the `ops/flash_attention.py` online-softmax loop over a
    COMPACTED per-row list of active key blocks, scalar-prefetched as
    `kidx [nq, max_nnz]` + `nnz [nq]` (SMEM). The grid runs
    `(B, H, nq, max_nnz)`; rows shorter than `max_nnz` clamp their block
    index to the last active block and skip compute via `pl.when`, so
    ragged rows cost a redundant copy but no FLOPs.

Opt-in (inference path), like the reference's paifuser gate:
`FLEXAM_ATTENTION=sparse` (+ `FLEXAM_SPARSE_WINDOW=w`), or pass
`make_sparse_attn_fn(...)` as the pipeline's `attn_fn`. Calls whose
shape does not match the captured video geometry (cross-attention,
non-video streams) fall through to the dense kernels unchanged.

The mask is NOT output-equivalent to dense attention; its measured
quality cost on a trained checkpoint (tests/test_sparse_quality.py,
BASELINE.md round 4) is 63 dB PSNR / SSIM 1.000 vs dense at the default
w=2, 41 dB / 0.997 at w=1, 38 dB / 0.994 at w=0 — all inside the
control-adherence gate. Recommended minimum window: 1.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexam_tpu.ops.pallas_util import out_sds as _out_sds

_NEG_INF = -1e30


# --------------------------------------------------------------------------
# sparsity policy
# --------------------------------------------------------------------------

def video_block_rows(
    num_frames: int,
    window: int = 2,
    ref_block: bool = True,
    anchor_first: bool = True,
) -> List[List[int]]:
    """Active key-block indices per query block.

    Blocks 0..num_frames-1 are frames; block num_frames (if `ref_block`)
    is the reference-image token block. Frame i attends to frames
    [i-window, i+window], frame 0 (sink) and the ref block; the ref block
    attends to everything (it is one row — negligible cost, and ref
    tokens condition every frame so they need global context).
    """
    n = num_frames + (1 if ref_block else 0)
    rows: List[List[int]] = []
    for i in range(num_frames):
        row = set(range(max(0, i - window), min(num_frames, i + window + 1)))
        if anchor_first:
            row.add(0)
        if ref_block:
            row.add(num_frames)
        rows.append(sorted(row))
    if ref_block:
        rows.append(list(range(n)))
    return rows


def coarsen_rows(rows: Sequence[Sequence[int]], group: int
                 ) -> List[List[int]]:
    """Merge `group` consecutive fine blocks into one coarse block; a
    coarse pair (I, J) is active iff ANY member fine pair is active.

    Bigger blocks trade extra density for far fewer grid steps: at the
    flagship geometry the 448-token frame blocks are too small to feed
    the MXU efficiently (measured: w=2 only 1.28x despite 3.5x fewer
    FLOPs — ~10k tiny grid steps dominate), while 896-token pairs halve
    the step count per axis at a modest density increase.
    """
    n = len(rows)
    assert n % group == 0, (n, group)
    coarse = []
    for i0 in range(0, n, group):
        acc = set()
        for i in range(i0, i0 + group):
            acc.update(j // group for j in rows[i])
        coarse.append(sorted(acc))
    return coarse


def rows_to_arrays(rows: Sequence[Sequence[int]]) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """Compact ragged rows into (kidx [nq, max_nnz], nnz [nq]) int32,
    padding each row with its last active index (clamp target)."""
    nnz = np.asarray([len(r) for r in rows], np.int32)
    m = int(nnz.max())
    kidx = np.stack([np.pad(np.asarray(r, np.int32), (0, m - len(r)),
                            mode="edge") for r in rows])
    return kidx, nnz


def rows_to_block_mask(rows: Sequence[Sequence[int]]) -> np.ndarray:
    """Dense [nb, nb] bool block mask from per-row active key lists —
    the form `parallel.ring.ring_accumulate` consumes for the
    block-sparse USP ring hops."""
    nb = len(rows)
    mask = np.zeros((nb, nb), bool)
    for i, r in enumerate(rows):
        mask[i, list(r)] = True
    return mask


def video_sparse_policy(
    num_frames: int,
    spatial_tokens: int,
    ref_tokens: int = 0,
    window: int = 2,
    group: Optional[int] = None,
) -> dict:
    """Resolve the video sparsity policy once: {"rows", "blk",
    "video_len"}. Shared by the single-chip `make_sparse_attn_fn` and
    the sequence-parallel wrappers (`parallel.ulysses` inner /
    `parallel.usp` sparse ring) so every path runs the SAME mask."""
    if ref_tokens not in (0, spatial_tokens):
        raise ValueError("ref_tokens must be 0 or == spatial_tokens")
    rows = video_block_rows(num_frames, window=window,
                            ref_block=ref_tokens > 0)
    if group is None:
        group = pick_group(len(rows), spatial_tokens,
                           max_group=max(1, window))
    blk = spatial_tokens * group
    if group > 1:
        rows = coarsen_rows(rows, group)
    return {"rows": rows, "blk": blk,
            "video_len": num_frames * spatial_tokens + ref_tokens}


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _sparse_kernel(
    kidx_ref,        # SMEM [nq, max_nnz] int32 (scalar prefetch)
    nnz_ref,         # SMEM [nq] int32 (scalar prefetch)
    q_ref,           # [1, 1, BL, D]
    k_ref,           # [1, 1, BL, D]
    v_ref,           # [1, 1, BL, D]
    o_ref,           # [1, 1, BL, D]
    acc_ref,         # VMEM [BL, D] f32
    m_ref,           # VMEM [BL, 128] f32
    l_ref,           # VMEM [BL, 128] f32
    *,
    scale: float,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j < nnz_ref[i])
    def _accumulate():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * (scale * 1.4426950408889634)               # exp2-domain logits

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "blk", "total",
                                             "interpret"))
def _sparse_bhld(q, k, v, kidx, nnz, scale, blk, total, interpret=False):
    B, H, L, D = q.shape
    nq = L // blk
    max_nnz = kidx.shape[1]

    def _k_block(b, h, i, j, kidx, nnz):
        # clamp padded steps onto the row's last active block (the
        # fetched copy is redundant but compute is pl.when-guarded)
        return (b, h, kidx[i, jnp.minimum(j, nnz[i] - 1)], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, nq, max_nnz),
        in_specs=[
            pl.BlockSpec((1, 1, blk, D),
                         lambda b, h, i, j, kidx, nnz: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk, D), _k_block),
            pl.BlockSpec((1, 1, blk, D), _k_block),
        ],
        out_specs=pl.BlockSpec((1, 1, blk, D),
                               lambda b, h, i, j, kidx, nnz: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((blk, D), jnp.float32),
            pltpu.VMEM((blk, 128), jnp.float32),
            pltpu.VMEM((blk, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sparse_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=_out_sds((B, H, L, D), q.dtype, q),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            # `total` active (q,k) block pairs, each 2 matmuls of
            # blk x blk x D
            flops=4 * B * H * total * blk * blk * D,
            bytes_accessed=2 * B * H * (L + 2 * total * blk) * D,
            transcendentals=B * H * total * blk * blk,
        ),
    )(kidx, nnz, q, k, v)


def sparse_flash_attention(
    q: jnp.ndarray,                    # [B, L, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    rows: Sequence[Sequence[int]],
    blk: int,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Block-sparse attention over [B, L, H, D] with per-block key lists.

    `rows[i]` lists the key blocks visible to query block i; L must equal
    `len(rows) * blk` and every block is `blk` tokens. Softmax semantics
    are exact over the visible keys (identical to dense attention under
    the equivalent token mask).
    """
    B, L, H, D = q.shape
    if D % 128 != 0:
        raise NotImplementedError(f"head_dim % 128 != 0: {D}")
    if blk % 8 != 0:
        raise NotImplementedError(f"block tokens % 8 != 0: {blk}")
    if L != len(rows) * blk or k.shape[1] != L:
        raise NotImplementedError(
            f"geometry mismatch: L={L}, rows={len(rows)}, blk={blk}")
    if scale is None:
        scale = D ** -0.5
    kidx, nnz = rows_to_arrays(rows)
    out = _sparse_bhld(jnp.transpose(q, (0, 2, 1, 3)),
                       jnp.transpose(k, (0, 2, 1, 3)),
                       jnp.transpose(v, (0, 2, 1, 3)),
                       kidx, nnz, float(scale), blk,
                       int(nnz.sum()), interpret)
    return jnp.transpose(out, (0, 2, 1, 3))


def masked_dense_attention(
    q: jnp.ndarray,                    # [B, L, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    rows: Sequence[Sequence[int]],
    blk: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Dense attention under the token mask `rows` expands to — by
    construction the EXACT semantics of `sparse_flash_attention`
    (tests/test_sparse_attention.py pins the kernel to this), with none
    of the kernel's tiling constraints (head_dim % 128, blk % 8).

    This is the measurement surface for the sparsity pattern's QUALITY
    cost: tiny trained checkpoints whose geometry the Pallas kernel
    cannot tile run the same policy through here
    (tests/test_sparse_quality.py), so the measured PSNR/adherence bound
    is a property of the MASK, not of the kernel."""
    B, L, H, D = q.shape
    if L != len(rows) * blk or k.shape[1] != L:
        raise ValueError(
            f"geometry mismatch: L={L}, rows={len(rows)}, blk={blk}")
    if scale is None:
        scale = D ** -0.5
    mask = np.zeros((len(rows), len(rows)), bool)
    for i, r in enumerate(rows):
        mask[i, list(r)] = True
    mask_tok = np.repeat(np.repeat(mask, blk, 0), blk, 1)
    s = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = jnp.where(jnp.asarray(mask_tok)[None, None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


# --------------------------------------------------------------------------
# DiT integration
# --------------------------------------------------------------------------

def pick_group(n_blocks: int, spatial_tokens: int,
               max_blk: int = 1456, max_group: int = 2) -> int:
    """Largest divisor of n_blocks with merged blocks within the
    VMEM-efficient size (the dense kernel's measured sweet spot tops out
    at 1456 tokens: the f32 logits tile must fit the ~16 MB budget) and
    at most `max_group` (coarsening adds visible keys — a group larger
    than the temporal window would wash the sparsity out)."""
    best = 1
    for g in range(1, n_blocks + 1):
        if (n_blocks % g == 0 and g * spatial_tokens <= max_blk
                and g <= max_group):
            best = g
    return best


def make_sparse_attn_fn(
    num_frames: int,
    spatial_tokens: int,
    ref_tokens: int = 0,
    window: int = 2,
    group: Optional[int] = None,
    interpret: Optional[bool] = None,
    masked_dense: bool = False,
):
    """Build an `attn_fn` for `dit_forward(..., attn_fn=...)` that runs
    video self-attention block-sparse and everything else dense.

    A call is "video self-attention" iff Lq == Lk ==
    num_frames*spatial_tokens + ref_tokens (the DiT's token count);
    cross-attention (Lk = text_len) and mismatched shapes fall through to
    the dense dispatch. `ref_tokens` must be 0 or == spatial_tokens (the
    FlexAM ref image is patch-embedded on the same spatial grid).

    `masked_dense=True` runs the policy through `masked_dense_attention`
    instead of the Pallas kernel (identical outputs; no tiling
    constraints) — the quality-measurement path for geometries the
    kernel cannot tile.
    """
    from flexam_tpu.core.attention import attention as dense_attention

    policy = video_sparse_policy(num_frames, spatial_tokens,
                                 ref_tokens=ref_tokens, window=window,
                                 group=group)
    rows, blk, video_len = (policy["rows"], policy["blk"],
                            policy["video_len"])
    if interpret is None:
        # interpret mode off the TPU (CPU tests / debugging)
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True

    def attn_fn(q, k, v, k_len=None, scale=None):
        if q.shape[1] == k.shape[1] == video_len and k_len is None:
            if masked_dense:
                return masked_dense_attention(q, k, v, rows, blk,
                                              scale=scale)
            if blk % 8 == 0 and q.shape[-1] % 128 == 0:
                return sparse_flash_attention(q, k, v, rows, blk,
                                              scale=scale,
                                              interpret=interpret)
        return dense_attention(q, k, v, k_len=k_len, scale=scale)

    return attn_fn


def sparse_attn_fn_for_latent(latent_shape: Tuple[int, int, int],
                              patch: Tuple[int, int, int] = (1, 2, 2),
                              has_ref: bool = True,
                              window: Optional[int] = None):
    """Geometry helper: latent (F, H, W) -> sparse attn_fn. `window`
    defaults from FLEXAM_SPARSE_WINDOW (2)."""
    import os
    f, h, w = latent_shape
    spatial = (h // patch[1]) * (w // patch[2])
    if window is None:
        window = int(os.environ.get("FLEXAM_SPARSE_WINDOW", "2"))
    return make_sparse_attn_fn(f // patch[0], spatial,
                               ref_tokens=spatial if has_ref else 0,
                               window=window)
