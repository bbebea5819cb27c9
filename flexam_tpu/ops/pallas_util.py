"""Shared helpers for the repo's Pallas TPU kernels."""

from __future__ import annotations

import jax


def out_sds(shape, dtype, like):
    """Pallas out_shape that inherits `like`'s varying-mesh-axes set, so
    the kernel traces under `jax.shard_map` with its default
    check_vma=True (the Ulysses/ring wrappers run these kernels per-shard;
    without vma the AOT/multichip compile rejects the call — found by the
    v5e-8 topology AOT, `tools/topology_aot.py`)."""
    try:
        vma = jax.typeof(like).vma
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)
