"""CLIP text encoder (ViT-L/14 text tower), TPU-native.

FLUX conditions on the POOLED output of the openai CLIP-L text model
(`FluxControlPipeline`'s second text encoder; consumed externally by the
reference, `pipelines.py:137-173`). This is the standard pre-LN causal
text transformer: token+position embeddings, quick-GELU MLPs, final
layer norm, EOS-token pooling — oracle-tested against the transformers
`CLIPTextModel` implementation (tests/test_flux_text_oracle.py).

Blocks run under `lax.scan` over stacked params; the causal mask is a
static lower-triangular bias fused into the attention logits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.models.clip import _layer_norm
from flexam_tpu.core.layers import linear, linear_init


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab: int = 49408
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    mlp_ratio: float = 4.0
    max_positions: int = 77
    eos_id: int = 49407
    eps: float = 1e-5

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab=64, dim=32, num_heads=2, num_layers=2,
                   max_positions=10, eos_id=63)


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def clip_text_forward(params: dict, cfg: CLIPTextConfig,
                      ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ids [B, L] int32 -> (last_hidden [B, L, D], pooled [B, D]).

    Pooled = hidden state at the FIRST eos token (the transformers
    `CLIPTextModel` pooling; positions after eos only see causal
    context so prompts shorter than L are unaffected by padding)."""
    b, l = ids.shape
    x = (params["token_embedding"][ids]
         + params["pos_embedding"][jnp.arange(l)][None])
    x = x.astype(params["token_embedding"].dtype)
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.where(
        jnp.arange(l)[None, :] <= jnp.arange(l)[:, None], 0.0, neg)

    def body(carry, bp):
        h = carry
        n, d = cfg.num_heads, cfg.dim // cfg.num_heads
        hn = _layer_norm(h, bp["norm1_w"], bp["norm1_b"], cfg.eps)
        q = linear(hn, bp["q"]).reshape(b, l, n, d) * (d ** -0.5)
        k = linear(hn, bp["k"]).reshape(b, l, n, d)
        v = linear(hn, bp["v"]).reshape(b, l, n, d)
        logits = jnp.einsum("binc,bjnc->bnij", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits + causal, axis=-1).astype(h.dtype)
        o = jnp.einsum("bnij,bjnc->binc", probs, v).reshape(b, l, -1)
        h = h + linear(o, bp["o"])
        hn = _layer_norm(h, bp["norm2_w"], bp["norm2_b"], cfg.eps)
        h = h + linear(_quick_gelu(linear(hn, bp["fc1"])), bp["fc2"])
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _layer_norm(x, params["norm_w"], params["norm_b"], cfg.eps)
    is_eos = (ids == cfg.eos_id)
    eos_pos = jnp.where(is_eos.any(axis=1),
                        jnp.argmax(is_eos, axis=1), l - 1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


def init_clip_text_params(key, cfg: CLIPTextConfig,
                          dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    d, mid = cfg.dim, int(cfg.dim * cfg.mlp_ratio)

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "norm1_w": jnp.ones((d,), dtype),
            "norm1_b": jnp.zeros((d,), dtype),
            "q": linear_init(ks[0], d, d, dtype=dtype),
            "k": linear_init(ks[1], d, d, dtype=dtype),
            "v": linear_init(ks[2], d, d, dtype=dtype),
            "o": linear_init(ks[3], d, d, dtype=dtype),
            "norm2_w": jnp.ones((d,), dtype),
            "norm2_b": jnp.zeros((d,), dtype),
            "fc1": linear_init(ks[4], d, mid, dtype=dtype),
            "fc2": linear_init(ks[5], mid, d, dtype=dtype),
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "token_embedding": (jax.random.normal(
            keys[1], (cfg.vocab, d), jnp.float32) * 0.02).astype(dtype),
        "pos_embedding": (jax.random.normal(
            keys[2], (cfg.max_positions, d), jnp.float32) * 0.01
            ).astype(dtype),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0), *blocks),
        "norm_w": jnp.ones((d,), dtype),
        "norm_b": jnp.zeros((d,), dtype),
    }


def clip_text_params_from_state_dict(sd: Dict[str, np.ndarray],
                                     cfg: CLIPTextConfig,
                                     dtype=np.float32) -> dict:
    """Map a transformers `CLIPTextModel` state_dict (with or without the
    `text_model.` prefix) to the scan-stacked pytree."""
    def g(key):
        for k in (key, f"text_model.{key}"):
            if k in sd:
                return np.asarray(sd[k], dtype)
        raise KeyError(key)

    def lin(prefix):
        # torch Linear layout [out, in] — core.layers.linear convention
        return {"weight": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}

    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        blocks.append({
            "norm1_w": g(f"{p}.layer_norm1.weight"),
            "norm1_b": g(f"{p}.layer_norm1.bias"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "norm2_w": g(f"{p}.layer_norm2.weight"),
            "norm2_b": g(f"{p}.layer_norm2.bias"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        })
    return {
        "token_embedding": g("embeddings.token_embedding.weight"),
        "pos_embedding": g("embeddings.position_embedding.weight"),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, 0), *blocks),
        "norm_w": g("final_layer_norm.weight"),
        "norm_b": g("final_layer_norm.bias"),
    }
