"""FP8 weight storage.

Behavioral reference: `FlexAM/utils/fp8_optimization.py` —
`convert_model_weight_to_float8` (:19-34) stores weights as
`float8_e4m3fn` excluding `modulation` params (:8-17), and
`convert_weight_dtype_wrapper` (:47-58) autocasts to the compute dtype
per forward via monkey-patched forwards.

JAX equivalent: the params pytree is stored in fp8; a cast back to the
compute dtype happens INSIDE the jit (free — XLA fuses the convert into
the first use, and HBM traffic/footprint halves vs bf16).
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp

# the reference excludes AdaLN modulation tables (`fp8_optimization.py:23`);
# we also keep norms + biases high-precision (tiny, precision-critical)
DEFAULT_EXCLUDE = ("modulation", "norm", "bias", "latents_")


def _map_with_path(fn, tree):
    """Apply fn to leaves, REPLACING dict values in place as visited: each
    converted leaf's source buffer frees before the next one converts, so
    peak device memory is the source tree + ONE converted leaf. The
    rebuild-a-new-tree version kept the full bf16 5B alive next to the
    accumulating fp8 copy and OOM'd a 16 GB chip (round-4 serving run)."""
    def visit(path, node):
        if isinstance(node, dict):
            for k in node:
                node[k] = visit(f"{path}/{k}" if path else k, node[k])
            return node
        if isinstance(node, (list, tuple)):
            out = [visit(f"{path}/{i}", v) for i, v in enumerate(node)]
            return type(node)(out) if isinstance(node, tuple) else out
        return fn(path, node)
    return visit("", tree)


def convert_weights_to_fp8(params, exclude: Sequence[str] = DEFAULT_EXCLUDE):
    """Store eligible >=2D float weights as float8_e4m3fn. The tree is
    mutated IN PLACE (memory: see `_map_with_path`) and returned."""
    def conv(path, leaf):
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(
                leaf.dtype, jnp.floating):
            return leaf
        if leaf.ndim < 2 or any(p in path for p in exclude):
            return leaf
        return leaf.astype(jnp.float8_e4m3fn)
    return _map_with_path(conv, params)


def cast_weights(params, dtype=jnp.bfloat16):
    """Per-forward autocast (`convert_weight_dtype_wrapper` equivalent):
    call inside the jitted function on the fp8-stored pytree. PURE (the
    input tree is not mutated — it is typically the caller's stored
    params or a traced copy)."""
    def conv(leaf):
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float8_e4m3fn:
            return leaf.astype(dtype)
        return leaf
    return jax.tree_util.tree_map(conv, params)
