"""umT5-XXL text encoder, TPU-native.

Behavioral reference: `FlexAM/models/wan_text_encoder.py` (`WanT5EncoderModel`,
:266-323): 24 layers, d=4096, ffn=10240, 64 heads, per-layer bidirectional
relative-position buckets (shared_pos=False per
`config/wan2.2/wan_civitai_5b_FlexAM.yaml:20-32`), unscaled attention,
gated GELU-tanh FFN, returns last hidden states.

TPU-first notes:
  * the relative-position bucket table depends only on (static) sequence
    length — computed host-side in numpy once; the per-layer bias is one
    embedding gather, [1, H, L, L];
  * blocks run under `lax.scan` over stacked params (fast compile);
  * attention has NO 1/sqrt(d) scaling (T5 convention, reference :104) and
    adds bias = pos_bias + mask(min) to the logits;
  * T5LayerNorm is RMS-style (no mean subtraction, no bias), fp32 accum.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.config import T5Config
from flexam_tpu.core.layers import gelu_tanh


def t5_layer_norm(x: jnp.ndarray, weight: jnp.ndarray,
                  eps: float = 1e-6) -> jnp.ndarray:
    """`T5LayerNorm` (`wan_text_encoder.py:44-57`): x*rsqrt(mean(x^2)+eps)*w."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(dtype) * weight.astype(dtype)


def relative_position_buckets(
    lq: int, lk: int, num_buckets: int, max_dist: int = 128,
    bidirectional: bool = True,
) -> np.ndarray:
    """Static bucket table [Lq, Lk] (`T5RelativeEmbedding
    ._relative_position_bucket`, `wan_text_encoder.py:227-246`)."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    if bidirectional:
        nb = num_buckets // 2
        buckets = (rel_pos > 0).astype(np.int64) * nb
        rel_pos = np.abs(rel_pos)
    else:
        nb = num_buckets
        buckets = np.zeros_like(rel_pos)
        rel_pos = -np.minimum(rel_pos, 0)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel_pos, 1).astype(np.float64) / max_exact)
            / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets = buckets + np.where(rel_pos < max_exact, rel_pos, large)
    return buckets.astype(np.int32)


def _pos_bias(embedding: jnp.ndarray, buckets: jnp.ndarray) -> jnp.ndarray:
    """embedding: [num_buckets, H]; returns [1, H, Lq, Lk] fp32 bias."""
    bias = embedding.astype(jnp.float32)[buckets]        # [Lq, Lk, H]
    return bias.transpose(2, 0, 1)[None]


def _t5_attention(p: dict, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                  pos_bias: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """`T5Attention.forward` (`wan_text_encoder.py:60-109`), self-attn only."""
    b, l, _ = x.shape
    d = p["q"].shape[0] // num_heads
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    q = jnp.matmul(x, p["q"].astype(x.dtype).T).reshape(b, l, num_heads, d)
    k = jnp.matmul(x, p["k"].astype(x.dtype).T).reshape(b, l, num_heads, d)
    v = jnp.matmul(x, p["v"].astype(x.dtype).T).reshape(b, l, num_heads, d)
    logits = jnp.einsum("binc,bjnc->bnij", q, k,
                        preferred_element_type=jnp.float32, precision=prec)
    logits = logits + pos_bias
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :] != 0, logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnij,bjnc->binc", probs, v,
                     preferred_element_type=jnp.float32,
                     precision=prec).astype(x.dtype)
    return jnp.matmul(out.reshape(b, l, -1), p["o"].astype(x.dtype).T)


def _t5_ffn(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """`T5FeedForward` (`wan_text_encoder.py:112-131`): fc1(x)*GELU(gate(x))."""
    gate = gelu_tanh(jnp.matmul(x, p["gate"].astype(x.dtype).T))
    h = jnp.matmul(x, p["fc1"].astype(x.dtype).T) * gate
    return jnp.matmul(h, p["fc2"].astype(x.dtype).T)


def t5_encode(params: dict, cfg: T5Config, input_ids: jnp.ndarray,
              attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """`WanT5EncoderModel.forward` (`wan_text_encoder.py:300-313`).

    input_ids: [B, L] int32; attention_mask: [B, L] (1=token, 0=pad).
    Returns last hidden states [B, L, dim].
    """
    l = input_ids.shape[1]
    # gather BEFORE the cast: casting the whole 256k x 4096 vocab table
    # first materializes a 4.2 GB fp32 transient, which OOMs a 16 GB
    # chip next to the ~11.4 GB bf16 encoder weights (values identical —
    # the gather does not change elements)
    x = params["token_embedding"][input_ids].astype(
        params["compute_dtype"] if "compute_dtype" in params
        else jnp.float32)
    buckets = jnp.asarray(
        relative_position_buckets(l, l, cfg.num_buckets,
                                  max_dist=cfg.max_distance), jnp.int32)
    # shared_pos (T5 v1.1 / FLUX's T5-XXL): one bias table owned by
    # block 0, reused by every layer; umT5 (shared_pos=False) keeps a
    # per-layer table inside the scanned params.
    shared_bias = (_pos_bias(params["shared_pos_embedding"], buckets)
                   if cfg.shared_pos else None)

    def body(carry, bp):
        h = carry
        bias = (shared_bias if shared_bias is not None
                else _pos_bias(bp["pos_embedding"], buckets))
        h = h + _t5_attention(bp["attn"], t5_layer_norm(h, bp["norm1"]),
                              attention_mask, bias, cfg.num_heads)
        h = h + _t5_ffn(bp["ffn"], t5_layer_norm(h, bp["norm2"]))
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_layer_norm(x, params["norm"])


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_t5_params(key, cfg: T5Config, dtype=jnp.float32) -> dict:
    """Random init following reference `init_weights`
    (`wan_text_encoder.py:21-36`)."""
    keys = jax.random.split(key, 8)
    d, da, df, h = cfg.dim, cfg.dim_attn, cfg.dim_ffn, cfg.num_heads

    def n(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    def block(k):
        ks = jax.random.split(k, 8)
        p = {
            "norm1": jnp.ones((d,), dtype),
            "attn": {
                "q": n(ks[0], (da, d), (d * da) ** -0.5),
                "k": n(ks[1], (da, d), d ** -0.5),
                "v": n(ks[2], (da, d), d ** -0.5),
                "o": n(ks[3], (d, da), (h * da) ** -0.5),
            },
            "norm2": jnp.ones((d,), dtype),
            "ffn": {
                "gate": n(ks[4], (df, d), d ** -0.5),
                "fc1": n(ks[5], (df, d), d ** -0.5),
                "fc2": n(ks[6], (d, df), df ** -0.5),
            },
        }
        if not cfg.shared_pos:
            p["pos_embedding"] = n(ks[7], (cfg.num_buckets, h),
                                   (2 * cfg.num_buckets * h) ** -0.5)
        return p

    bkeys = jax.random.split(keys[0], cfg.num_layers)
    blocks = [block(k) for k in bkeys]
    params = {
        "token_embedding": n(keys[1], (cfg.vocab, d), 1.0),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0), *blocks),
        "norm": jnp.ones((d,), dtype),
    }
    if cfg.shared_pos:
        params["shared_pos_embedding"] = n(
            keys[2], (cfg.num_buckets, h), (2 * cfg.num_buckets * h) ** -0.5)
    return params


def t5_params_from_state_dict(sd, cfg: T5Config, dtype=np.float32) -> dict:
    """Map a `WanT5EncoderModel` state_dict to the scan-stacked pytree."""
    def g(key):
        return np.asarray(sd[key], dtype)

    blocks = []
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        blocks.append({
            "norm1": g(f"{p}.norm1.weight"),
            "attn": {
                "q": g(f"{p}.attn.q.weight"),
                "k": g(f"{p}.attn.k.weight"),
                "v": g(f"{p}.attn.v.weight"),
                "o": g(f"{p}.attn.o.weight"),
            },
            "norm2": g(f"{p}.norm2.weight"),
            "ffn": {
                "gate": g(f"{p}.ffn.gate.0.weight"),
                "fc1": g(f"{p}.ffn.fc1.weight"),
                "fc2": g(f"{p}.ffn.fc2.weight"),
            },
            "pos_embedding": g(f"{p}.pos_embedding.embedding.weight"),
        })
    return {
        "token_embedding": g("token_embedding.weight"),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, 0), *blocks),
        "norm": g("norm.weight"),
    }


def t5_params_from_hf_state_dict(sd, cfg: T5Config,
                                 dtype=np.float32) -> dict:
    """Map a HuggingFace `T5EncoderModel` state_dict (the layout FLUX's
    T5-XXL v1.1 text encoder ships in: `encoder.block.N.layer.0.
    SelfAttention.q.weight`, gated `DenseGatedActDense`) to the
    scan-stacked pytree. Requires cfg.shared_pos=True (v1.1 keeps one
    relative-attention-bias table on block 0)."""
    def g(key):
        k = key if key in sd else f"encoder.{key}"
        return np.asarray(sd[k], dtype)

    blocks = []
    for i in range(cfg.num_layers):
        p = f"block.{i}.layer"
        blocks.append({
            "norm1": g(f"{p}.0.layer_norm.weight"),
            "attn": {
                "q": g(f"{p}.0.SelfAttention.q.weight"),
                "k": g(f"{p}.0.SelfAttention.k.weight"),
                "v": g(f"{p}.0.SelfAttention.v.weight"),
                "o": g(f"{p}.0.SelfAttention.o.weight"),
            },
            "norm2": g(f"{p}.1.layer_norm.weight"),
            "ffn": {
                "gate": g(f"{p}.1.DenseReluDense.wi_0.weight"),
                "fc1": g(f"{p}.1.DenseReluDense.wi_1.weight"),
                "fc2": g(f"{p}.1.DenseReluDense.wo.weight"),
            },
        })
    params = {
        "token_embedding": (np.asarray(sd["shared.weight"], dtype)
                            if "shared.weight" in sd
                            else g("embed_tokens.weight")),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, 0), *blocks),
        "norm": g("final_layer_norm.weight"),
    }
    if cfg.shared_pos:
        params["shared_pos_embedding"] = g(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight")
    return params
