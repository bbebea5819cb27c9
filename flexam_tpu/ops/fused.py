"""Fused elementwise Pallas kernels for the DiT hot path.

The reference ships these fusions as the closed-source `paifuser` CUDA
package — fused RMSNorm and fast-RoPE kernels wired in at
`FlexAM/models/__init__.py:23-103`. BASELINE.md's v5e roofline attributes
~0.2 s/step of the 2.4 s compute floor to elementwise HBM bandwidth
(AdaLN/RoPE/norm), which XLA cannot fully fuse because LayerNorm's
reductions and the RoPE pair-rotation break its fusion boundaries around
the matmuls. Two kernels close most of that band:

  * `rmsnorm_rope`  — RMSNorm(gamma) + interleaved-pair rotary embedding
    in ONE pass over the projected q/k tensor ([B, S, H*dh]): one HBM
    read + one write instead of the unfused read/write per op (the
    rotation uses full-width cos/sin tables with the pair-swap expressed
    as two lane-rolls + select, avoiding strided even/odd gathers).
  * `ln_modulation` — affine-free LayerNorm + AdaLN `x*(1+scale)+shift`
    with the TI2V binary-timestep select fused in: the per-token
    modulation terms (`dit.py _block_forward term(i)`) never materialize
    as [B, L, D] tensors in HBM.

Numerics match the unfused path op-for-op (same fp32 accumulation points,
same bf16 cast points), verified by tests/test_fused_ops.py in interpret
mode; production dispatch is gated on running on real TPU
(`fused_enabled()`), with the unfused XLA path as the everywhere-else
fallback.

Multi-chip composition (round 5): GSPMD cannot auto-partition Mosaic
custom calls, but both kernels are strictly PER-TOKEN — so under a
>1-device activation mesh the public wrappers run the kernel inside a
`shard_map` over ("dp","sp") (batch x token axes, the same layout
`parallel.sharding.token_constraint` pins), one local Mosaic call per
shard with zero collectives. This is the same composition the reference
needs to stack paifuser kernels with xDiT sequence parallelism
(`FlexAM/models/__init__.py:23-103` + `wan_transformer3d_FlexAM.py:
801-815`). Shapes that do not divide the mesh fall back to the exact
unfused composition (GSPMD partitions that freely).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexam_tpu.ops.pallas_util import out_sds as _out_sds


def fused_enabled() -> bool:
    """Pallas elementwise fusions run on real TPU unless FLEXAM_FUSED
    overrides (1 forces on; "interpret" forces on in interpret mode —
    the CPU-mesh dryrun/test path; 0 forces off).

    On TPU the kernels are additionally PROBED once with a tiny real
    call: the axon terminal's remote compile helper ships its own
    libtpu, and a version-skewed Mosaic can reject kernels our jaxlib
    emits (observed 2026-08-17: `layout.h:320` inferReshape abort). A
    failing probe disables the fusions for the process — the DiT falls
    back to the unfused XLA path instead of crashing mid-denoise.

    Under a >1-device activation mesh the kernels stay ENABLED (round 5):
    the public wrappers shard_map them per-shard (GSPMD never sees the
    Mosaic custom call), so fused + sequence parallelism compose like the
    reference's paifuser + xDiT stack."""
    env = os.environ.get("FLEXAM_FUSED")
    if env is not None:
        return env in ("1", "interpret")
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    from jax._src import core as _core
    if not _core.trace_state_clean():
        # called at TRACE time (dit_forward inside jit): the probe can't
        # execute here — running jitted kernels under an active trace
        # inlines them as tracers and np.asarray explodes. Use the
        # cached verdict when one exists; otherwise assume available
        # (callers hoist an eager fused_enabled() before entering jit —
        # pipeline.denoise and bench.py do).
        if _fused_compiles.cache_info().currsize:
            return _fused_compiles()
        return True
    return _fused_compiles()


def _force_interpret() -> bool:
    """FLEXAM_FUSED=interpret runs the kernels in Pallas interpret mode —
    how the CPU virtual-mesh dryrun exercises the fused-under-shard_map
    production path without a TPU."""
    return os.environ.get("FLEXAM_FUSED") == "interpret"


def _active_mesh():
    """The >1-device activation mesh installed by
    `parallel.activation_sharding`, if any (None on single device)."""
    if _PROBE_LOCAL:
        return None
    try:
        from flexam_tpu.parallel import sharding as _sh
        mesh = _sh._ACTIVE_MESH
        if (mesh is not None and mesh.size > 1
                and "dp" in mesh.shape and "sp" in mesh.shape):
            return mesh
    except Exception:
        pass
    return None


_PROBE_LOCAL = False


@functools.lru_cache(maxsize=1)
def _fused_compiles() -> bool:
    import numpy as np
    global _PROBE_LOCAL
    _PROBE_LOCAL = True       # probe the SINGLE-DEVICE kernel, not the
    try:                      # shard_map wrap (tiny probe shapes don't
                              # divide a mesh; restored in finally)
        x = jnp.ones((1, 8, 256), jnp.bfloat16)
        g = jnp.ones((256,), jnp.float32)
        cs = jnp.ones((8, 64), jnp.float32)
        out = rmsnorm_rope(x, g, cs, cs * 0, 2)
        sh = jnp.zeros((1, 2, 256), jnp.float32)
        m = jnp.ones((1, 8), jnp.float32)
        out2 = ln_modulation(x, sh, sh, mask=m)
        out3 = ln_modulation(x, sh[:, 0], sh[:, 0])
        float(np.asarray(out.astype(jnp.float32)).ravel()[0]
              + np.asarray(out2.astype(jnp.float32)).ravel()[0]
              + np.asarray(out3.astype(jnp.float32)).ravel()[0])
        return True
    except Exception as e:                      # pragma: no cover - infra
        print("WARNING: fused Pallas kernels disabled — probe compile "
              f"failed on this toolchain: {str(e)[:160]}", flush=True)
        return False
    finally:
        _PROBE_LOCAL = False


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block(s: int, cap: int = 256) -> int:
    """Largest divisor of s that is a multiple of 8 and <= cap; falls back
    to 8-aligned ceil if s is not 8-divisible (callers pad).

    cap=256: at D=3072 the f32 intermediates (norm + the two rolls of the
    pair-swap) put a 512-row block at ~22 MB of scoped VMEM — over the
    16 MB budget (measured OOM on v5e); 256 rows fit with room for the
    double-buffered in/out blocks."""
    if s % 8 == 0:
        for b in range(min(cap, s), 7, -8):
            if s % b == 0:
                return b
    return min(cap, _ceil_to(s, 8))


# ---------------------------------------------------------------------------
# RMSNorm + RoPE
# ---------------------------------------------------------------------------

def _rmsnorm_rope_kernel(x_ref, g_ref, c_ref, s_ref, o_ref, *, heads: int,
                         eps: float):
    """x [1, bs, H, dh] (4D-NATIVE layout — a 2D->3D reshape inside the
    kernel forces a Mosaic relayout copy; keeping (H, dh) as the tiled
    trailing dims avoids it); g [H, dh]; c/s [bs, 1, dh] full-width
    tables (pair-expanded, sign folded into s for the even outputs; the
    broadcast dim is materialized HOST-side — rank-changing reshapes
    inside the kernel crash the terminal compile-helper's layout
    inferencer, observed 2026-08-17: `layout.h:320 arr.size() >=
    layout_rank` in inferReshape)."""
    x = x_ref[0]
    bs, h, dh = x.shape
    xf = x.astype(jnp.float32)
    # sequential means, NOT axis=(-2,-1): the multi-axis reduce is the
    # exact op the helper's layout inferencer aborts on (bisected
    # 2026-08-17); mean-of-means is equal for uniform dims
    inv = jax.lax.rsqrt(
        jnp.mean(jnp.mean(xf * xf, axis=-1, keepdims=True), axis=-2,
                 keepdims=True) + eps)
    # match core.layers.rms_norm bit-for-bit: normalize in f32, cast to
    # compute dtype, THEN scale by gamma in compute dtype (g is [1, H,
    # dh] from the host — no [None] rank-change in-kernel)
    y = (xf * inv).astype(x.dtype) * g_ref[:].astype(x.dtype)

    # rotation in f32 (core.rope.apply_rope runs fp32)
    yf = y.astype(jnp.float32)
    # pair swap: swapped[2j] = y[2j+1], swapped[2j+1] = y[2j]
    # (pltpu.roll requires non-negative shifts: -1 == dh-1 circularly)
    fwd = pltpu.roll(yf, shift=dh - 1, axis=2)         # lane 2j   <- 2j+1
    bwd = pltpu.roll(yf, shift=1, axis=2)              # lane 2j+1 <- 2j
    lane = jax.lax.broadcasted_iota(jnp.int32, (bs, h, dh), 2)
    swapped = jnp.where(lane % 2 == 0, fwd, bwd)
    c = c_ref[:]                                       # [bs, 1, dh]
    s = s_ref[:]
    out = yf * c + swapped * s
    o_ref[0] = out.astype(o_ref.dtype)


def _expand_rope_tables(cos: jnp.ndarray, sin: jnp.ndarray, seq: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[Lr, dh/2] half tables -> full-width [seq, dh] tables with the
    rotation signs folded in:

      out[2j]   = y[2j]*cos_j - y[2j+1]*sin_j
      out[2j+1] = y[2j+1]*cos_j + y[2j]*sin_j

    so C[2j] = C[2j+1] = cos_j, S[2j] = -sin_j, S[2j+1] = +sin_j.
    Tokens beyond len(cos) pass through unrotated (C=1, S=0), matching
    `apply_rope`'s padding semantics."""
    lr, half = cos.shape
    cf = jnp.repeat(cos, 2, axis=1)                    # [Lr, dh]
    sgn = jnp.tile(jnp.asarray([-1.0, 1.0], cos.dtype), (half,))
    sf = jnp.repeat(sin, 2, axis=1) * sgn
    if lr < seq:
        pad = seq - lr
        cf = jnp.concatenate([cf, jnp.ones((pad, 2 * half), cf.dtype)], 0)
        sf = jnp.concatenate([sf, jnp.zeros((pad, 2 * half), sf.dtype)], 0)
    else:
        cf, sf = cf[:seq], sf[:seq]
    return cf, sf


def _rmsnorm_rope_kernel_2d(x_ref, g_ref, c_ref, s_ref, o_ref, *,
                            eps: float):
    """Full-width 2-D variant: x [1, bs, D]; g [1, D]; c/s [bs, D]
    head-tiled tables. The rotation pair (2j, 2j+1) never straddles a
    head boundary (dh is even), so the lane roll works on the full D
    axis; everything stays in the natural (sublane=token, lane=feature)
    layout — no 3-D/4-D vectors for Mosaic to lay out at all."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    y = (xf * inv).astype(x.dtype) * g_ref[:].astype(x.dtype)
    yf = y.astype(jnp.float32)
    d = yf.shape[-1]
    fwd = pltpu.roll(yf, shift=d - 1, axis=1)
    bwd = pltpu.roll(yf, shift=1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, yf.shape, 1)
    swapped = jnp.where(lane % 2 == 0, fwd, bwd)
    o_ref[0] = (yf * c_ref[:] + swapped * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def _rmsnorm_rope_call_2d(x, gamma, cfull, sfull, heads, eps, interpret):
    b, s, d = x.shape
    bs = _pick_block(s)
    s_p = _ceil_to(s, bs)
    if s_p != s:
        x = jnp.pad(x, ((0, 0), (0, s_p - s), (0, 0)))
        cfull = jnp.pad(cfull, ((0, s_p - s), (0, 0)), constant_values=1.0)
        sfull = jnp.pad(sfull, ((0, s_p - s), (0, 0)))
    cD = jnp.tile(cfull, (1, heads))                   # [S_p, D]
    sD = jnp.tile(sfull, (1, heads))
    g2 = gamma.reshape(1, d)
    out = pl.pallas_call(
        functools.partial(_rmsnorm_rope_kernel_2d, eps=eps),
        grid=(b, s_p // bs),
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_sds((b, s_p, d), x.dtype, x),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, g2, cD, sD)
    return out[:, :s]


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def _rmsnorm_rope_call(x, gamma, cfull, sfull, heads, eps, interpret):
    b, s, d = x.shape
    dh = d // heads
    bs = _pick_block(s)
    s_p = _ceil_to(s, bs)
    if s_p != s:
        x = jnp.pad(x, ((0, 0), (0, s_p - s), (0, 0)))
        cfull = jnp.pad(cfull, ((0, s_p - s), (0, 0)), constant_values=1.0)
        sfull = jnp.pad(sfull, ((0, s_p - s), (0, 0)))
    x4 = x.reshape(b, s_p, heads, dh)        # free outside the kernel
    g4 = gamma.reshape(1, heads, dh)
    c3 = cfull.reshape(s_p, 1, dh)           # broadcast dim host-side
    s3 = sfull.reshape(s_p, 1, dh)
    out = pl.pallas_call(
        functools.partial(_rmsnorm_rope_kernel, heads=heads, eps=eps),
        grid=(b, s_p // bs),
        in_specs=[
            pl.BlockSpec((1, bs, heads, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, dh), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1, dh), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1, dh), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, heads, dh),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_sds((b, s_p, heads, dh), x.dtype, x),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x4, g4, c3, s3)
    return out[:, :s].reshape(b, s, d)


def rmsnorm_rope(x: jnp.ndarray, gamma: jnp.ndarray, cos: jnp.ndarray,
                 sin: jnp.ndarray, num_heads: int, eps: float = 1e-6,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused `rms_norm(x, gamma)` + `apply_rope` over [B, S, H*dh].

    Returns [B, S, H, dh] (the attention layout). cos/sin are the
    [L_rot, dh/2] half-angle tables from `build_video_rope`; tokens
    past L_rot pass through unrotated.

    Under a >1-device activation mesh the kernel runs per-shard inside a
    `shard_map` over ("dp","sp") — the op is per-token, so each shard's
    call is local (no collectives) and GSPMD never has to partition the
    Mosaic custom call. Mesh-indivisible shapes fall back to the exact
    unfused composition."""
    b, s, d = x.shape
    dh = d // num_heads
    interpret = interpret or _force_interpret()
    cfull, sfull = _expand_rope_tables(cos, sin, s)
    # two kernel layouts: 4D (bs, H, dh) blocks vs full-width 2D with
    # head-tiled tables; FLEXAM_RMSROPE_2D=0/1 overrides the default
    call = (_rmsnorm_rope_call_2d
            if os.environ.get("FLEXAM_RMSROPE_2D", "0") == "1"
            else _rmsnorm_rope_call)
    mesh = _active_mesh()
    if mesh is not None:
        dp, sp = mesh.shape["dp"], mesh.shape["sp"]
        if b % dp == 0 and s % sp == 0:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            # check_vma=False: the body is one LOCAL Mosaic call (no
            # collectives, nothing to verify) and the Pallas interpret
            # path (CPU dryrun/tests) rejects mixed-vma dynamic_slices
            out = shard_map(
                lambda x_l, g_l, c_l, s_l: call(
                    x_l, g_l, c_l, s_l, num_heads, eps, interpret),
                mesh=mesh,
                in_specs=(P("dp", "sp", None), P(None),
                          P("sp", None), P("sp", None)),
                out_specs=P("dp", "sp", None), check_vma=False,
            )(x, gamma, cfull, sfull)
            return out.reshape(b, s, num_heads, dh)
        # mesh-indivisible: exact unfused composition (GSPMD-friendly)
        from flexam_tpu.core.layers import rms_norm as _rms
        from flexam_tpu.core.rope import apply_rope as _rope
        y = _rms(x, gamma, eps).reshape(b, s, num_heads, dh)
        return _rope(y, cos, sin)
    out = call(x, gamma, cfull, sfull, num_heads, eps, interpret)
    return out.reshape(b, s, num_heads, dh)


# ---------------------------------------------------------------------------
# LayerNorm + AdaLN modulation (binary-timestep aware)
# ---------------------------------------------------------------------------

def _ln_mod_binary_kernel(x_ref, sh_ref, sc_ref, m_ref, o_ref, *, eps: float):
    """x [1, bs, D]; sh/sc [1, 2, D] f32 (t-branch row 0, zero-branch row
    1); m [bs, B_full] f32 mask, TRANSPOSED host-side so tokens lie on
    sublanes (the batch column is picked with a lane-iota masked sum —
    rank-1 row reads + rank-changing reshapes crash the terminal
    compile-helper's layout inferencer, `layout.h:320` in inferReshape;
    every value here stays rank >= 2)."""
    x = x_ref[0]
    bs, d = x.shape
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1)
    m = jnp.sum(jnp.where(lane == pl.program_id(0), m_ref[:], 0.0),
                axis=1, keepdims=True)                 # [bs, 1] f32
    sh2 = sh_ref[0]                                    # [2, D] f32
    sc2 = sc_ref[0]
    sh = m * sh2[0:1] + (1.0 - m) * sh2[1:2]           # [bs, D] f32
    sc = m * sc2[0:1] + (1.0 - m) * sc2[1:2]
    one = x.dtype.type(1.0)
    o_ref[0] = (ln * (one + sc.astype(x.dtype))
                + sh.astype(x.dtype)).astype(o_ref.dtype)


def _ln_mod_bcast_kernel(x_ref, sh_ref, sc_ref, o_ref, *, eps: float):
    """x [1, bs, D]; sh/sc [B_full, D] f32 broadcast terms (full batch
    dim for the same Mosaic sublane-block rule as the binary kernel)."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    one = x.dtype.type(1.0)
    i = pl.program_id(0)
    sh = sh_ref[pl.ds(i, 1)]                 # [1, D] — rank-2 row read
    sc = sc_ref[pl.ds(i, 1)]
    o_ref[0] = (ln * (one + sc.astype(x.dtype))
                + sh.astype(x.dtype)).astype(o_ref.dtype)


def _pick_block_128(s: int, cap: int = 256) -> int:
    """Block size for kernels whose mask block makes the token axis a LANE
    dimension (the [B, S] mask in the binary ln_mod kernel): Mosaic
    requires lane-dim blocks divisible by 128."""
    if s % 128 == 0:
        for b in range(cap - cap % 128, 127, -128):
            if s % b == 0:
                return b
    return 128


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_mod_binary_call(x, shift_pair, scale_pair, mask, eps, interpret):
    b, s, d = x.shape
    bs = _pick_block_128(s)
    s_p = _ceil_to(s, bs)
    if s_p != s:
        x = jnp.pad(x, ((0, 0), (0, s_p - s), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, s_p - s)))
    mask_t = jnp.transpose(mask.astype(jnp.float32))    # [S_p, B]
    out = pl.pallas_call(
        functools.partial(_ln_mod_binary_kernel, eps=eps),
        grid=(b, s_p // bs),
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, b), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_sds((b, s_p, d), x.dtype, x),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, shift_pair.astype(jnp.float32), scale_pair.astype(jnp.float32),
      mask_t)
    return out[:, :s]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_mod_bcast_call(x, shift, scale, eps, interpret):
    b, s, d = x.shape
    bs = _pick_block(s)
    s_p = _ceil_to(s, bs)
    if s_p != s:
        x = jnp.pad(x, ((0, 0), (0, s_p - s), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_mod_bcast_kernel, eps=eps),
        grid=(b, s_p // bs),
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_sds((b, s_p, d), x.dtype, x),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, shift.astype(jnp.float32), scale.astype(jnp.float32))
    return out[:, :s]


def _ln_mod_unfused(x, shift, scale, mask, eps):
    """Kernel-identical math on plain XLA ops (the mesh-indivisible
    fallback): fp32 pair-select, cast points as in the kernels."""
    from flexam_tpu.core.layers import layer_norm as _ln
    dtype = x.dtype
    ln = _ln(x, eps=eps)
    one = x.dtype.type(1.0)
    if mask is not None:
        m = mask.astype(jnp.float32)[:, :, None]               # [B, S, 1]
        shf = shift.astype(jnp.float32)
        scf = scale.astype(jnp.float32)
        sh = m * shf[:, 0:1] + (1.0 - m) * shf[:, 1:2]
        sc = m * scf[:, 0:1] + (1.0 - m) * scf[:, 1:2]
        return (ln * (one + sc.astype(dtype)) + sh.astype(dtype)
                ).astype(dtype)
    return (ln * (one + scale.astype(dtype)[:, None])
            + shift.astype(dtype)[:, None]).astype(dtype)


def ln_modulation(x: jnp.ndarray, shift, scale,
                  mask: Optional[jnp.ndarray] = None, eps: float = 1e-6,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused affine-free LayerNorm + `ln(x)*(1+scale)+shift`.

    Binary-timestep mode (mask given): shift/scale are [B, 2, D] pairs and
    mask [B, S] selects row 0 (mask=1, the t branch) or row 1 per token —
    the fused form of `dit.py _block_forward`'s `term(i)` select.
    Broadcast mode (mask None): shift/scale are [B, D] (or [B, 1, D]).

    Under a >1-device activation mesh the kernel runs per-shard inside a
    `shard_map` over ("dp","sp") (per-token op, local calls); shapes the
    mesh does not divide fall back to `_ln_mod_unfused`."""
    interpret = interpret or _force_interpret()
    if mask is None and shift.ndim == 3:
        shift = shift[:, 0]
        scale = scale[:, 0]
    mesh = _active_mesh()
    if mesh is not None:
        b, s, _ = x.shape
        dp, sp = mesh.shape["dp"], mesh.shape["sp"]
        if b % dp != 0 or s % sp != 0:
            return _ln_mod_unfused(x, shift, scale, mask, eps)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        if mask is not None:
            return shard_map(
                lambda x_l, sh_l, sc_l, m_l: _ln_mod_binary_call(
                    x_l, sh_l, sc_l, m_l, eps, interpret),
                mesh=mesh,
                in_specs=(P("dp", "sp", None), P("dp", None, None),
                          P("dp", None, None), P("dp", "sp")),
                out_specs=P("dp", "sp", None), check_vma=False,
            )(x, shift, scale, mask)
        return shard_map(
            lambda x_l, sh_l, sc_l: _ln_mod_bcast_call(
                x_l, sh_l, sc_l, eps, interpret),
            mesh=mesh,
            in_specs=(P("dp", "sp", None), P("dp", None), P("dp", None)),
            out_specs=P("dp", "sp", None), check_vma=False,
        )(x, shift, scale)
    if mask is not None:
        return _ln_mod_binary_call(x, shift, scale, mask, eps, interpret)
    return _ln_mod_bcast_call(x, shift, scale, eps, interpret)
