"""INT8 dynamic-quantized linears for the DiT block GEMMs.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPs). Microbenched at the flagship DiT shapes (M=23296 CFG-pair tokens):

    proj 3072x3072   bf16 3.30 ms  | int8 dynamic 1.87 ms  (1.77x, 235 TF/s)
    ffn  3072<->14336 bf16 24.8 ms | int8 dynamic 16.5 ms  (1.50x, 249 TF/s)

including the full quantize/dequantize overhead measured here, so unlike
the fp8 storage mode (`utils/fp8.py`, memory-only: v5e has no fp8 MXU and
e4m3 GEMMs time exactly at bf16 rate) this is a genuine throughput lever.

Scheme (the SmoothQuant/SageAttention dynamic-activation recipe):
  * weights:    static per-OUTPUT-channel symmetric int8
                (`w_q = round(w * 127 / amax_row)`, scale kept fp32);
  * activations: dynamic per-token symmetric int8 (amax over the feature
                dim each call — recomputed inside the jit, fused by XLA);
  * accumulate int32 on the MXU, dequantize with the product of the two
                scales, add the (fp32/bf16) bias.

This is an OPT-IN approximation mode like the sparse attention kernel:
per-token dynamic scales keep the relative error ~1e-2 on the linears
(tests/test_qlinear.py pins the bound); the end-to-end quality cost on a
TRAINED checkpoint is near-transparent — 64 dB PSNR / SSIM 1.000 vs the
fp32 output, control adherence unchanged (tests/test_sparse_quality.py,
BASELINE.md round 4).

Behavioral counterpart in the reference: the paifuser fp8 linear patches
(`FlexAM/models/__init__.py:23-103`) — same "quantize the block GEMMs,
keep norms/modulation high-precision" shape, retargeted to the MXU's
fast integer path since TPU v5e has no fp8 matmul unit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# quantize the big block GEMMs only: norms, biases, AdaLN modulation
# tables, embeddings and the output head stay high-precision
QUANT_KEYS = ("self_attn", "cross_attn", "ffn")
LINEAR_NAMES = ("q", "k", "v", "o", "fc1", "fc2")


@jax.jit
def _quantize_weight(w):
    """Fused cast->amax->round->int8 (one XLA pass: a stacked flagship ffn
    weight is 2.6 GB bf16 — materializing an f32 copy next to the resident
    5B would OOM a 16 GB chip)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    return jnp.round(wf / scale).astype(jnp.int8), scale[..., 0]


def _quantize_weight_host(w):
    """Numpy twin of `_quantize_weight` (same fp32 math, same
    round-half-to-even) for HOST checkpoint trees: quantizing before the
    upload ships int8 bytes over the link — ~half a bf16 upload, ~quarter
    an fp32 one — instead of uploading wide and quantizing on-device."""
    import numpy as np
    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=-1, keepdims=True)
    scale = np.maximum(amax / 127.0, 1e-12)
    return np.round(wf / scale).astype(np.int8), scale[..., 0]


def quantize_linear_params(p: dict) -> dict:
    """{"weight": [..., out, in]} -> {"weight_q", "w_scale", "bias"?}.

    Works on scan-stacked weights ([L, out, in]) too: the scale is
    per-(layer, out-channel), amax over the contracting `in` axis.
    Host (numpy) weights quantize with numpy — no device round-trip.
    """
    import numpy as np
    w = p["weight"]
    if isinstance(w, np.ndarray):
        w_q, w_scale = _quantize_weight_host(w)
    else:
        w_q, w_scale = _quantize_weight(jnp.asarray(w))
    out = {"weight_q": w_q, "w_scale": w_scale}         # [..., out]
    if "bias" in p and p["bias"] is not None:
        out["bias"] = p["bias"]
    return out


def qlinear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """y = x @ W_q^T * (s_x * s_w) + b — dynamic per-token activation
    quantization, int32 MXU accumulation. Drop-in for `core.layers.linear`
    when the params hold {"weight_q", "w_scale"}."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, p["weight_q"],
        (((q.ndim - 1,), (p["weight_q"].ndim - 1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * p["w_scale"].astype(jnp.float32)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _quantize_block_tree(node, path=""):
    if isinstance(node, dict):
        for k in list(node):
            v = node[k]
            inside_quant = any(f"/{qk}/" in f"{path}/{k}/"
                               for qk in QUANT_KEYS)
            if (inside_quant and isinstance(v, dict) and "weight" in v
                    and k in LINEAR_NAMES
                    and getattr(v["weight"], "ndim", 0) >= 2):
                # replace-as-we-go: each bf16 source leaf is freed before
                # the next one quantizes, capping peak HBM at
                # resident + one stacked weight (+10 GB and +5 GB trees
                # alive simultaneously would not fit a 16 GB v5e)
                node[k] = quantize_linear_params(v)
            else:
                _quantize_block_tree(v, f"{path}/{k}")
    return node


def convert_dit_to_int8(params: dict) -> dict:
    """Quantize the DiT block linears (self/cross attention q,k,v,o and
    ffn fc1/fc2) to int8; everything else (embeddings, head, norms,
    modulation, cnn/ref convs) is untouched. The block tree is mutated
    IN PLACE (memory: see `_quantize_block_tree`) and the same dict is
    returned. Apply AFTER any LoRA merge — `utils.lora.apply_lora`
    needs fp weights."""
    if "blocks" in params:
        _quantize_block_tree(params["blocks"], "/blocks")
    return params


def is_quantized(params) -> bool:
    """True if any sub-dict holds an int8-quantized linear."""
    if isinstance(params, dict):
        if "weight_q" in params:
            return True
        return any(is_quantized(v) for v in params.values())
    if isinstance(params, (list, tuple)):
        return any(is_quantized(v) for v in params)
    return False
