"""Mesh + sharding layer: the TPU-native replacement for the reference's
entire `FlexAM/dist` interface (absent from its release; consumed at
`wan_transformer3d_FlexAM.py:22-24,801-815,919-925,971-975,1103-1104` as
Ulysses/ring sequence parallelism + FSDP via `shard_model`).

Design (SURVEY.md §5.8): ONE `jax.sharding.Mesh` with axes ("dp","sp","tp"):
  * dp — batch / CFG pair (the reference concatenates cond+uncond into a
    batch of 2, `pipeline...FlexAM.py:850`);
  * sp — the ~11.6k-token sequence axis (replaces xDiT USP; XLA/GSPMD
    inserts the all-gathers/all-to-alls the reference does by hand over
    NCCL);
  * tp — head/ffn tensor parallelism of the DiT weights (replaces FSDP
    weight sharding; megatron-style column/row split).

No process groups, no rank bookkeeping: parameters get NamedShardings,
activations get `with_sharding_constraint` at layer boundaries, and the
compiler lays collectives onto ICI.
"""

from __future__ import annotations

import contextlib
import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Build a Mesh with axes ("dp","sp","tp"). Default: all devices on sp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"dp": 1, "sp": n, "tp": 1}
    sizes = (axis_sizes.get("dp", 1), axis_sizes.get("sp", 1),
             axis_sizes.get("tp", 1))
    assert int(np.prod(sizes)) == n, (sizes, n)
    dev = np.asarray(devices).reshape(sizes)
    return Mesh(dev, ("dp", "sp", "tp"))


def set_mesh(mesh: Optional[Mesh]):
    """Install the mesh consulted by activation constraints in model code."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def clear_mesh():
    set_mesh(None)


@contextlib.contextmanager
def activation_sharding(mesh: Mesh):
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        clear_mesh()


def token_constraint(x, spec: Sequence[Optional[str]]):
    """`with_sharding_constraint` if a mesh is active, else identity.
    Called from model code (e.g. tokens [B, L, D] -> ("dp","sp",None))."""
    if _ACTIVE_MESH is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_ACTIVE_MESH, P(*spec)))


# ---------------------------------------------------------------------------
# Parameter shardings
# ---------------------------------------------------------------------------

def _ns(mesh, *spec):
    return NamedSharding(mesh, P(*spec))


def dit_param_shardings(mesh: Mesh, params) -> dict:
    """Megatron-style TP over the DiT block weights (stacked [L, out, in]):
    qkv/fc1 split the output dim, o/fc2 split the input dim over "tp".
    Everything else (embeddings, modulation, convs, head) is replicated —
    they are tiny next to the block stack.

    INT8-quantized trees (`ops/qlinear.convert_dit_to_int8`) shard the
    same way: `weight_q` [L, out, in] follows `weight`; the per-out-
    channel `w_scale` [L, out] follows the out axis for the column-split
    linears (q/k/v/fc1) and REPLICATES for the row-split ones (o/fc2,
    where TP splits the contraction dim — every tp shard needs every
    output channel's scale to dequantize its int32 partial sums)."""
    col_split = ("q", "k", "v", "fc1")      # TP splits the OUT dim
    row_split = ("o", "fc2")                # TP splits the IN (contraction)

    def rule(path: str, leaf):
        if re.search(r"blocks.*(self_attn|cross_attn|ffn)", path):
            parts = path.split("/")
            parent, name = (parts[-2], parts[-1]) if len(parts) >= 2 \
                else ("", parts[-1])
            if name in ("weight", "weight_q"):
                if parent in col_split:
                    return _ns(mesh, None, "tp", None)
                if parent in row_split:
                    return _ns(mesh, None, None, "tp")
            if name == "w_scale" and parent in col_split:
                return _ns(mesh, None, "tp")
            if name == "bias" and parent in col_split:
                return _ns(mesh, None, "tp")
        return _ns(mesh)   # replicated

    return _map_with_path(rule, params)


def t5_param_shardings(mesh: Mesh, params) -> dict:
    """umT5: TP over attention heads + ffn; token embedding sharded over
    vocab rows on tp (FSDP-ish, it is the single biggest tensor)."""
    def rule(path: str, leaf):
        if path.endswith("attn/q") or path.endswith("attn/k") \
                or path.endswith("attn/v"):
            return _ns(mesh, None, "tp", None)
        if path.endswith("attn/o"):
            return _ns(mesh, None, None, "tp")
        if path.endswith("ffn/gate") or path.endswith("ffn/fc1"):
            return _ns(mesh, None, "tp", None)
        if path.endswith("ffn/fc2"):
            return _ns(mesh, None, None, "tp")
        if path.endswith("token_embedding"):
            return _ns(mesh, "tp", None)
        return _ns(mesh)

    return _map_with_path(rule, params)


def replicated_shardings(mesh: Mesh, params) -> dict:
    return _map_with_path(lambda p, l: _ns(mesh), params)


def _map_with_path(fn, tree):
    def visit(path, node):
        if isinstance(node, dict):
            return {k: visit(f"{path}/{k}" if path else k, v)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [visit(f"{path}/{i}", v) for i, v in enumerate(node)]
            return type(node)(out) if isinstance(node, tuple) else out
        return fn(path, node)
    return visit("", tree)


def shard_pytree(params, shardings):
    """Device-put a pytree according to a matching sharding pytree."""
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, s), params, shardings)
