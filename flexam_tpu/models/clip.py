"""XLM-Roberta-CLIP image/text encoders (open-clip ViT-H/14).

Behavioral reference: `FlexAM/models/wan_image_encoder.py` (`CLIPModel`
:503-552, `VisionTransformer` :211-303, `XLMRobertaCLIP` :330-) and
`wan_xlm_roberta.py` (`XLMRoberta` :76-130). Used by the Wan2.1 i2v
configs; the flagship FlexAM 5B deletes `img_emb` and passes no
`clip_fea` (`wan_transformer3d_FlexAM.py:859-861,1437-1438`) — provided
here for model-zoo completeness (SURVEY.md §2.1).

TPU-first: scan-stacked transformer blocks; the CLIP `forward(videos)`
path returns the penultimate-block tokens (`use_31_block=True`, :527-528).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.core.attention import xla_attention
from flexam_tpu.core.layers import gelu_tanh, linear, linear_init


@dataclass(frozen=True)
class CLIPVisionConfig:
    """ViT-H/14 geometry (`clip_xlm_roberta_vit_h_14`)."""
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    activation: str = "gelu"     # 'gelu' | 'quick_gelu'
    pre_norm: bool = True
    norm_eps: float = 1e-5


@dataclass(frozen=True)
class XLMRobertaConfig:
    vocab_size: int = 250002
    max_seq_len: int = 514
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def _act(x, kind):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return gelu_tanh(x) if kind == "gelu_tanh" else jax.nn.gelu(
        x, approximate=False)


def _vit_block(bp, x, cfg: CLIPVisionConfig):
    """Pre-norm CLIP block (`wan_image_encoder.py:148-155`)."""
    h = _layer_norm(x, bp["norm1_w"], bp["norm1_b"], cfg.norm_eps)
    b, s, c = h.shape
    n, d = cfg.num_heads, c // cfg.num_heads
    qkv = linear(h, bp["to_qkv"]).reshape(b, s, 3, n, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    o = xla_attention(q, k, v).reshape(b, s, c)
    x = x + linear(o, bp["proj"])
    h = _layer_norm(x, bp["norm2_w"], bp["norm2_b"], cfg.norm_eps)
    h = linear(_act(linear(h, bp["fc1"]), cfg.activation), bp["fc2"])
    return x + h


def vit_forward(params, cfg: CLIPVisionConfig, images: jnp.ndarray,
                use_31_block: bool = True) -> jnp.ndarray:
    """images: [B, 3, H, W] normalized; returns tokens [B, 1+P, dim]
    (`VisionTransformer.forward`, `wan_image_encoder.py:281-303`)."""
    b = images.shape[0]
    p = cfg.patch_size
    x = images.transpose(0, 2, 3, 1)
    hh, ww = x.shape[1] // p, x.shape[2] // p
    x = x.reshape(b, hh, p, ww, p, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, hh * ww, 3 * p * p)
    w = params["patch_embedding"]["weight"].reshape(
        params["patch_embedding"]["weight"].shape[0], -1)
    tok = jnp.matmul(x, w.astype(x.dtype).T)
    if "bias" in params["patch_embedding"]:
        tok = tok + params["patch_embedding"]["bias"].astype(x.dtype)
    cls = jnp.broadcast_to(params["cls_embedding"].astype(tok.dtype),
                           (b, 1, tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], axis=1)
    tok = tok + params["pos_embedding"].astype(tok.dtype)
    if cfg.pre_norm:
        tok = _layer_norm(tok, params["pre_norm_w"], params["pre_norm_b"],
                          cfg.norm_eps)

    n_run = cfg.num_layers - 1 if use_31_block else cfg.num_layers
    blocks = jax.tree_util.tree_map(lambda a: a[:n_run], params["blocks"])

    def body(carry, bp):
        return _vit_block(bp, carry, cfg), None

    tok, _ = jax.lax.scan(body, tok, blocks)
    return tok


def clip_encode_video_frames(params, cfg: CLIPVisionConfig,
                             videos: jnp.ndarray) -> jnp.ndarray:
    """`CLIPModel.forward` (`wan_image_encoder.py:513-528`): frames in
    [-1,1] [B, 3, T, H, W] -> resize 224 bicubic -> CLIP-normalize ->
    penultimate-block tokens [B*T, 257, 1280]."""
    b, c, t, h, w = videos.shape
    frames = videos.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    size = (cfg.image_size, cfg.image_size)
    frames = jax.image.resize(frames, (b * t, c) + size, method="bicubic")
    frames = (frames.astype(jnp.float32) * 0.5 + 0.5)
    mean = jnp.array([0.48145466, 0.4578275, 0.40821073])[None, :, None, None]
    std = jnp.array([0.26862954, 0.26130258, 0.27577711])[None, :, None, None]
    frames = (frames - mean) / std
    return vit_forward(params, cfg, frames.astype(videos.dtype),
                       use_31_block=True)


def xlm_roberta_forward(params, cfg: XLMRobertaConfig,
                        ids: jnp.ndarray) -> jnp.ndarray:
    """`XLMRoberta.forward` (`wan_xlm_roberta.py:118-130`): roberta
    position ids from the padding mask cumsum; post-norm blocks."""
    mask = (ids != cfg.pad_id).astype(jnp.int32)
    pos = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
    x = (params["token_embedding"][ids]
         + params["type_embedding"][jnp.zeros_like(ids)]
         + params["pos_embedding"][pos])
    x = x.astype(params["token_embedding"].dtype)
    if cfg.post_norm:
        x = _layer_norm(x, params["norm_w"], params["norm_b"], cfg.eps)

    neg = jnp.finfo(jnp.float32).min

    def body(carry, bp):
        h = carry
        b, s, c = h.shape
        n, d = cfg.num_heads, c // cfg.num_heads
        q = linear(h, bp["q"]).reshape(b, s, n, d)
        k = linear(h, bp["k"]).reshape(b, s, n, d)
        v = linear(h, bp["v"]).reshape(b, s, n, d)
        o = xla_attention(q, k, v, k_len=jnp.sum(mask, axis=1))
        attn_out = linear(o.reshape(b, s, c), bp["o"])
        if cfg.post_norm:
            h = _layer_norm(h + attn_out, bp["norm1_w"], bp["norm1_b"],
                            cfg.eps)
            ff = linear(jax.nn.gelu(linear(h, bp["fc1"]), approximate=False),
                        bp["fc2"])
            h = _layer_norm(h + ff, bp["norm2_w"], bp["norm2_b"], cfg.eps)
        else:
            h = h + attn_out
            h = h + linear(jax.nn.gelu(
                linear(_layer_norm(h, bp["norm2_w"], bp["norm2_b"], cfg.eps),
                       bp["fc1"]), approximate=False), bp["fc2"])
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_vit_params(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    dim = cfg.dim
    gain = 1.0 / np.sqrt(dim)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2

    def block(k):
        ks = jax.random.split(k, 4)
        mid = int(dim * cfg.mlp_ratio)
        return {
            "norm1_w": jnp.ones((dim,), dtype), "norm1_b": jnp.zeros((dim,), dtype),
            "to_qkv": linear_init(ks[0], dim, dim * 3, dtype=dtype),
            "proj": linear_init(ks[1], dim, dim, dtype=dtype),
            "norm2_w": jnp.ones((dim,), dtype), "norm2_b": jnp.zeros((dim,), dtype),
            "fc1": linear_init(ks[2], dim, mid, dtype=dtype),
            "fc2": linear_init(ks[3], mid, dim, dtype=dtype),
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    p = {
        "patch_embedding": {
            "weight": (jax.random.normal(
                keys[1], (dim, 3, cfg.patch_size, cfg.patch_size)) * gain
            ).astype(dtype)},
        "cls_embedding": (jax.random.normal(keys[2], (1, 1, dim)) * gain
                          ).astype(dtype),
        "pos_embedding": (jax.random.normal(keys[3], (1, n_patches + 1, dim))
                          * gain).astype(dtype),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
    }
    if cfg.pre_norm:
        p["pre_norm_w"] = jnp.ones((dim,), dtype)
        p["pre_norm_b"] = jnp.zeros((dim,), dtype)
    return p


def init_xlm_roberta_params(key, cfg: XLMRobertaConfig,
                            dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    dim = cfg.dim

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "q": linear_init(ks[0], dim, dim, dtype=dtype),
            "k": linear_init(ks[1], dim, dim, dtype=dtype),
            "v": linear_init(ks[2], dim, dim, dtype=dtype),
            "o": linear_init(ks[3], dim, dim, dtype=dtype),
            "norm1_w": jnp.ones((dim,), dtype), "norm1_b": jnp.zeros((dim,), dtype),
            "fc1": linear_init(ks[4], dim, dim * 4, dtype=dtype),
            "fc2": linear_init(ks[5], dim * 4, dim, dtype=dtype),
            "norm2_w": jnp.ones((dim,), dtype), "norm2_b": jnp.zeros((dim,), dtype),
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "token_embedding": (jax.random.normal(
            keys[1], (cfg.vocab_size, dim)) * 0.02).astype(dtype),
        "type_embedding": (jax.random.normal(keys[2], (1, dim)) * 0.02
                           ).astype(dtype),
        "pos_embedding": (jax.random.normal(
            keys[3], (cfg.max_seq_len, dim)) * 0.02).astype(dtype),
        "norm_w": jnp.ones((dim,), dtype), "norm_b": jnp.zeros((dim,), dtype),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
    }


def clip_image_embed(params, cfg: CLIPVisionConfig,
                     images: jnp.ndarray) -> jnp.ndarray:
    """HF ``CLIPVisionModelWithProjection.image_embeds``: full-depth
    tokens -> CLS -> post-layernorm -> bias-free visual projection.

    This is the head SVD-family pipelines (DepthCrafter's published
    conditioning) pool with — the reference consumes it through
    diffusers' image_encoder. images: [B, 3, H, W], CLIP-normalized.
    Returns [B, proj_dim]."""
    tok = vit_forward(params, cfg, images, use_31_block=False)
    pooled = _layer_norm(tok[:, 0], params["post_norm_w"],
                         params["post_norm_b"], cfg.norm_eps)
    return linear(pooled, params["visual_projection"])


def clip_vision_params_from_hf(sd, num_heads: int = 16,
                               activation: str = "gelu"
                               ) -> Tuple[dict, CLIPVisionConfig, dict]:
    """Map an HF ``CLIPVisionModelWithProjection`` state dict
    (``vision_model.*`` + ``visual_projection``) onto the native tower.

    Geometry (dim / depth / patch / image size) is inferred from tensor
    shapes; ``num_heads`` and ``activation`` come from the model's
    config.json (not recoverable from shapes). Returns
    (params, cfg, coverage report for `io/verify_load.check_mapping`)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # HF spells the attribute `pre_layrnorm`; normalize either spelling
    for a, b in (("vision_model.pre_layernorm.weight",
                  "vision_model.pre_layrnorm.weight"),
                 ("vision_model.pre_layernorm.bias",
                  "vision_model.pre_layrnorm.bias")):
        if a in sd and b not in sd:
            sd[b] = sd.pop(a)
    loaded, missed = [], []

    def g(k):
        if k in sd:
            loaded.append(k)
            return np.asarray(sd[k], np.float32)
        missed.append(k)
        return None

    cls = g("vision_model.embeddings.class_embedding")
    pw = g("vision_model.embeddings.patch_embedding.weight")
    pos = g("vision_model.embeddings.position_embedding.weight")
    if cls is None or pw is None or pos is None:
        report = {"loaded": loaded, "missed": missed + ["<geometry>"],
                  "unused": sorted(set(sd) - set(loaded))}
        return {}, CLIPVisionConfig(), report
    dim = int(cls.reshape(-1).shape[0])
    patch = int(pw.shape[-1])
    n_pos = int(pos.shape[0])
    image_size = patch * int(round((n_pos - 1) ** 0.5))
    n_layers = 1 + max((int(k.split(".")[3]) for k in sd
                        if k.startswith("vision_model.encoder.layers.")),
                       default=-1)
    cfg = CLIPVisionConfig(image_size=image_size, patch_size=patch,
                           dim=dim, num_heads=num_heads,
                           num_layers=n_layers, activation=activation,
                           pre_norm=True)

    blocks = []
    for i in range(n_layers):
        pfx = f"vision_model.encoder.layers.{i}"
        qw, kw_, vw = (g(f"{pfx}.self_attn.{n}_proj.weight")
                       for n in ("q", "k", "v"))
        qb, kb, vb = (g(f"{pfx}.self_attn.{n}_proj.bias")
                      for n in ("q", "k", "v"))
        blk = {
            "norm1_w": g(f"{pfx}.layer_norm1.weight"),
            "norm1_b": g(f"{pfx}.layer_norm1.bias"),
            "proj": {"weight": g(f"{pfx}.self_attn.out_proj.weight"),
                     "bias": g(f"{pfx}.self_attn.out_proj.bias")},
            "norm2_w": g(f"{pfx}.layer_norm2.weight"),
            "norm2_b": g(f"{pfx}.layer_norm2.bias"),
            "fc1": {"weight": g(f"{pfx}.mlp.fc1.weight"),
                    "bias": g(f"{pfx}.mlp.fc1.bias")},
            "fc2": {"weight": g(f"{pfx}.mlp.fc2.weight"),
                    "bias": g(f"{pfx}.mlp.fc2.bias")},
        }
        if all(t is not None for t in (qw, kw_, vw, qb, kb, vb)):
            blk["to_qkv"] = {"weight": np.concatenate([qw, kw_, vw], 0),
                             "bias": np.concatenate([qb, kb, vb], 0)}
        blocks.append(blk)
    if any(any(v is None for v in jax.tree_util.tree_leaves(
            b, is_leaf=lambda x: x is None)) or "to_qkv" not in b
            for b in blocks):
        report = {"loaded": loaded, "missed": missed,
                  "unused": sorted(set(sd) - set(loaded))}
        return {}, cfg, report

    params = {
        "patch_embedding": {"weight": pw},
        "cls_embedding": cls.reshape(1, 1, dim),
        "pos_embedding": pos.reshape(1, n_pos, dim),
        "pre_norm_w": g("vision_model.pre_layrnorm.weight"),
        "pre_norm_b": g("vision_model.pre_layrnorm.bias"),
        "post_norm_w": g("vision_model.post_layernorm.weight"),
        "post_norm_b": g("vision_model.post_layernorm.bias"),
        "visual_projection": {"weight": g("visual_projection.weight")},
        "blocks": jax.tree_util.tree_map(lambda *xs: np.stack(xs),
                                         *blocks),
    }
    report = {"loaded": loaded, "missed": missed,
              "unused": sorted(set(sd) - set(loaded))}
    if missed:
        return {}, cfg, report
    return params, cfg, report


def vit_params_from_state_dict(sd, cfg: CLIPVisionConfig) -> dict:
    """Map the reference `VisionTransformer` state_dict (prefix 'visual.'
    inside XLMRobertaCLIP, or none)."""
    def g(k):
        return np.asarray(sd[k], np.float32)

    blocks = []
    for i in range(cfg.num_layers):
        pfx = f"transformer.{i}"
        blocks.append({
            "norm1_w": g(f"{pfx}.norm1.weight"),
            "norm1_b": g(f"{pfx}.norm1.bias"),
            "to_qkv": {"weight": g(f"{pfx}.attn.to_qkv.weight"),
                       "bias": g(f"{pfx}.attn.to_qkv.bias")},
            "proj": {"weight": g(f"{pfx}.attn.proj.weight"),
                     "bias": g(f"{pfx}.attn.proj.bias")},
            "norm2_w": g(f"{pfx}.norm2.weight"),
            "norm2_b": g(f"{pfx}.norm2.bias"),
            "fc1": {"weight": g(f"{pfx}.mlp.0.weight"),
                    "bias": g(f"{pfx}.mlp.0.bias")},
            "fc2": {"weight": g(f"{pfx}.mlp.2.weight"),
                    "bias": g(f"{pfx}.mlp.2.bias")},
        })
    p = {
        "patch_embedding": {"weight": g("patch_embedding.weight")},
        "cls_embedding": g("cls_embedding"),
        "pos_embedding": g("pos_embedding"),
        "blocks": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks),
    }
    if "patch_embedding.bias" in sd:
        p["patch_embedding"]["bias"] = g("patch_embedding.bias")
    if cfg.pre_norm:
        p["pre_norm_w"] = g("pre_norm.weight")
        p["pre_norm_b"] = g("pre_norm.bias")
    return p
