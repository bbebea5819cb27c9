"""FLUX.1 rectified-flow transformer (MMDiT), TPU-native.

The reference's first-frame repainter loads
``FluxControlPipeline.from_pretrained("black-forest-labs/FLUX.1-Depth-dev")``
and runs 30 steps at guidance 7.5 (`pipelines.py:137-173`) — FLUX is
consumed as an external dependency there. This module is a from-scratch
JAX implementation of the published FLUX architecture (black-forest-labs'
open-source model definition) so the repaint backend can run natively on
TPU: 19 double-stream (img/txt) MMDiT blocks + 38 single-stream blocks,
3-axis rotary embeddings (axes_dim 16/56/56 over [t, h, w] ids),
RMS-normalized q/k, timestep + pooled-CLIP + distilled-guidance
modulation vectors, 2x2 latent patch packing.

TPU-first notes:
  * both block families run under ``lax.scan`` over stacked params —
    two compiled block bodies total, fast compiles at depth 19+38;
  * RoPE tables depend only on the (static) token grid — computed once
    per call, closed over by the scan body, applied as interleaved-pair
    rotations (even/odd lanes), which XLA fuses into the surrounding
    elementwise chain;
  * attention rides the shared dispatch (`core/attention.py`) so the
    Pallas flash kernel / XLA fallback choice matches the main DiT;
  * weights load from the official BFL single-file layout
    (``flux1-*.safetensors``: ``double_blocks.N.img_attn.qkv.weight``,
    ``single_blocks.N.linear1.weight``, ...) via an exact name map with
    a coverage report for `io/verify_load` gating.

Depth-control conditioning (FLUX.1-Depth-dev): the packed control-image
latents are channel-concatenated to the packed noisy latents each step
(``in_channels`` 128 = 64 + 64), matching the Control pipeline's input
contract.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.core.attention import attention
from flexam_tpu.core.layers import gelu_tanh, layer_norm, rms_norm, silu


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    """FLUX.1-dev geometry. ``in_channels=128`` selects the Control
    (channel-concat conditioning) variant; base generation uses 64."""

    in_channels: int = 128
    out_channels: int = 64
    vec_dim: int = 768           # pooled CLIP-L
    context_dim: int = 4096      # T5-XXL hidden
    hidden: int = 3072
    mlp_ratio: float = 4.0
    num_heads: int = 24
    depth_double: int = 19
    depth_single: int = 38
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    guidance_embed: bool = True  # dev models are guidance-distilled
    patch: int = 2               # latent 2x2 patch packing
    vae_channels: int = 16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads

    @classmethod
    def tiny(cls, in_channels: int = 32) -> "FluxConfig":
        """Test geometry: head_dim 16 = 4+6+6, 2 double + 4 single."""
        return cls(in_channels=in_channels, out_channels=16, vec_dim=24,
                   context_dim=32, hidden=64, num_heads=4,
                   depth_double=2, depth_single=4, axes_dim=(4, 6, 6),
                   vae_channels=4)


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       time_factor: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal embedding of t in [0, 1]: [cos | sin] halves (the FLUX
    convention — cos first, t scaled by 1000)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * time_factor * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def rope_tables(ids: jnp.ndarray, axes_dim: Tuple[int, ...],
                theta: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis rotary tables for integer position ids [L, n_axes].

    Returns (cos, sin), each [L, sum(axes_dim)//2] fp32: axis i
    contributes axes_dim[i]//2 frequencies, concatenated in order —
    matching the published EmbedND (each axis rotates its own slice of
    the head dim; pairs are interleaved even/odd lanes).
    """
    parts_c, parts_s = [], []
    pos = ids.astype(jnp.float32)
    for i, d in enumerate(axes_dim):
        omega = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
        out = pos[:, i][:, None] * omega[None]          # [L, d/2]
        parts_c.append(jnp.cos(out))
        parts_s.append(jnp.sin(out))
    return jnp.concatenate(parts_c, -1), jnp.concatenate(parts_s, -1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation: x [B, L, H, D], cos/sin [L, D/2].

    even' = even*cos - odd*sin ; odd' = even*sin + odd*cos
    (the 2x2 rotation the reference applies via stacked matrices).
    """
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], -1, 2)  # [B,L,H,D/2,2]
    c = cos.astype(jnp.float32)[None, :, None, :]
    s = sin.astype(jnp.float32)[None, :, None, :]
    even, odd = xf[..., 0], xf[..., 1]
    rot = jnp.stack([even * c - odd * s, even * s + odd * c], axis=-1)
    return rot.reshape(shape).astype(x.dtype)


def _mlp_embed(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """MLPEmbedder: out_layer(silu(in_layer(x)))."""
    dt = x.dtype
    h = silu(x @ p["in_w"].astype(dt).T + p["in_b"].astype(dt))
    return h @ p["out_w"].astype(dt).T + p["out_b"].astype(dt)


def _lin(p_w: jnp.ndarray, p_b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p_w.astype(x.dtype).T + p_b.astype(x.dtype)


def _qk_norm(q: jnp.ndarray, k: jnp.ndarray, p: dict
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RMSNorm over head_dim with learned scale, fp32 accum."""
    return (rms_norm(q, p["q_scale"]).astype(q.dtype),
            rms_norm(k, p["k_scale"]).astype(k.dtype))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def _double_block(bp: dict, img: jnp.ndarray, txt: jnp.ndarray,
                  vec: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                  cfg: FluxConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One double-stream block: separate img/txt qkv+mlp, joint attention
    over cat(txt, img) with RoPE, gated residuals (6 modulation chunks
    per stream: shift1, scale1, gate1, shift2, scale2, gate2)."""
    dt = img.dtype
    n_txt = txt.shape[1]
    i_mod = _lin(bp["img_mod_w"], bp["img_mod_b"], silu(vec))[:, None]
    t_mod = _lin(bp["txt_mod_w"], bp["txt_mod_b"], silu(vec))[:, None]
    (i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2) = jnp.split(i_mod, 6, -1)
    (t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2) = jnp.split(t_mod, 6, -1)

    img_n = layer_norm(img, None, None) * (1 + i_sc1) + i_sh1
    txt_n = layer_norm(txt, None, None) * (1 + t_sc1) + t_sh1
    iq, ik, iv = jnp.split(_lin(bp["img_qkv_w"], bp["img_qkv_b"], img_n),
                           3, -1)
    tq, tk, tv = jnp.split(_lin(bp["txt_qkv_w"], bp["txt_qkv_b"], txt_n),
                           3, -1)
    iq, ik, iv = (_heads(x, cfg.num_heads) for x in (iq, ik, iv))
    tq, tk, tv = (_heads(x, cfg.num_heads) for x in (tq, tk, tv))
    iq, ik = _qk_norm(iq, ik, bp["img_attn_norm"])
    tq, tk = _qk_norm(tq, tk, bp["txt_attn_norm"])

    q = jnp.concatenate([tq, iq], axis=1)     # txt tokens first
    k = jnp.concatenate([tk, ik], axis=1)
    v = jnp.concatenate([tv, iv], axis=1)
    q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    out = attention(q, k, v)
    out = out.reshape(out.shape[0], out.shape[1], -1).astype(dt)
    txt_attn, img_attn = out[:, :n_txt], out[:, n_txt:]

    img = img + i_g1 * _lin(bp["img_proj_w"], bp["img_proj_b"], img_attn)
    h = layer_norm(img, None, None) * (1 + i_sc2) + i_sh2
    h = gelu_tanh(_lin(bp["img_mlp0_w"], bp["img_mlp0_b"], h))
    img = img + i_g2 * _lin(bp["img_mlp2_w"], bp["img_mlp2_b"], h)

    txt = txt + t_g1 * _lin(bp["txt_proj_w"], bp["txt_proj_b"], txt_attn)
    h = layer_norm(txt, None, None) * (1 + t_sc2) + t_sh2
    h = gelu_tanh(_lin(bp["txt_mlp0_w"], bp["txt_mlp0_b"], h))
    txt = txt + t_g2 * _lin(bp["txt_mlp2_w"], bp["txt_mlp2_b"], h)
    return img, txt


def _single_block(bp: dict, x: jnp.ndarray, vec: jnp.ndarray,
                  cos: jnp.ndarray, sin: jnp.ndarray,
                  cfg: FluxConfig) -> jnp.ndarray:
    """One single-stream block: fused linear1 -> (qkv | mlp), attention
    with RoPE over the whole (txt+img) sequence, linear2 over
    cat(attn, gelu(mlp)), one gated residual."""
    dt = x.dtype
    mlp_h = int(cfg.hidden * cfg.mlp_ratio)
    mod = _lin(bp["mod_w"], bp["mod_b"], silu(vec))[:, None]
    sh, sc, gate = jnp.split(mod, 3, -1)
    xn = layer_norm(x, None, None) * (1 + sc) + sh
    proj = _lin(bp["lin1_w"], bp["lin1_b"], xn)
    qkv, mlp = proj[..., :3 * cfg.hidden], proj[..., 3 * cfg.hidden:]
    q, k, v = (_heads(t, cfg.num_heads) for t in jnp.split(qkv, 3, -1))
    q, k = _qk_norm(q, k, bp["attn_norm"])
    q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    out = attention(q, k, v)
    out = out.reshape(out.shape[0], out.shape[1], -1).astype(dt)
    cat = jnp.concatenate([out, gelu_tanh(mlp)], axis=-1)
    return x + gate * _lin(bp["lin2_w"], bp["lin2_b"], cat)


def flux_forward(params: dict, cfg: FluxConfig, img: jnp.ndarray,
                 img_ids: jnp.ndarray, txt: jnp.ndarray,
                 txt_ids: jnp.ndarray, t: jnp.ndarray, y: jnp.ndarray,
                 guidance: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Predict the rectified-flow velocity for packed latent tokens.

    img: [B, L_img, in_channels] packed (2x2 patch) latent tokens —
        for Control variants already channel-concatenated with the
        packed control latents; img_ids: [L_img, 3] integer (t, h, w);
    txt: [B, L_txt, context_dim] T5 features; txt_ids: [L_txt, 3] (0s);
    t: [B] in [0, 1]; y: [B, vec_dim] pooled CLIP; guidance: [B].
    Returns [B, L_img, out_channels].
    """
    dt = img.dtype
    x = _lin(params["img_in_w"], params["img_in_b"], img)
    vec = _mlp_embed(params["time_in"],
                     timestep_embedding(t, 256).astype(dt))
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("guidance_embed model needs a guidance value")
        vec = vec + _mlp_embed(params["guidance_in"],
                               timestep_embedding(guidance, 256).astype(dt))
    vec = vec + _mlp_embed(params["vector_in"], y.astype(dt))
    txt = _lin(params["txt_in_w"], params["txt_in_b"], txt)

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)   # txt first
    cos, sin = rope_tables(ids, cfg.axes_dim, cfg.theta)

    def dbl(carry, bp):
        img_c, txt_c = carry
        img_c, txt_c = _double_block(bp, img_c, txt_c, vec, cos, sin, cfg)
        return (img_c, txt_c), None

    (x, txt), _ = jax.lax.scan(dbl, (x, txt), params["double_blocks"])

    seq = jnp.concatenate([txt, x], axis=1)

    def sgl(carry, bp):
        return _single_block(bp, carry, vec, cos, sin, cfg), None

    seq, _ = jax.lax.scan(sgl, seq, params["single_blocks"])
    x = seq[:, txt.shape[1]:]

    f_sh, f_sc = jnp.split(
        _lin(params["final_mod_w"], params["final_mod_b"],
             silu(vec))[:, None], 2, -1)
    x = layer_norm(x, None, None) * (1 + f_sc) + f_sh
    return _lin(params["final_w"], params["final_b"], x)


# ---------------------------------------------------------------------------
# Packing (2x2 latent patches <-> tokens) and position ids
# ---------------------------------------------------------------------------

def pack_latents(z: jnp.ndarray, patch: int = 2) -> jnp.ndarray:
    """[B, C, H, W] -> [B, (H/p)*(W/p), C*p*p] token packing (the
    ``rearrange(c (h ph) (w pw) -> (h w) (c ph pw))`` convention)."""
    b, c, h, w = z.shape
    z = z.reshape(b, c, h // patch, patch, w // patch, patch)
    z = z.transpose(0, 2, 4, 1, 3, 5)     # b, h, w, c, ph, pw
    return z.reshape(b, (h // patch) * (w // patch), c * patch * patch)


def unpack_latents(tokens: jnp.ndarray, h: int, w: int,
                   patch: int = 2) -> jnp.ndarray:
    """Inverse of pack_latents: [B, L, C*p*p] -> [B, C, H, W]."""
    b, _, d = tokens.shape
    c = d // (patch * patch)
    z = tokens.reshape(b, h // patch, w // patch, c, patch, patch)
    z = z.transpose(0, 3, 1, 4, 2, 5)
    return z.reshape(b, c, h, w)


def make_img_ids(h: int, w: int, patch: int = 2) -> np.ndarray:
    """[L, 3] integer ids (0, row, col) for the packed token grid."""
    hh, ww = h // patch, w // patch
    ids = np.zeros((hh, ww, 3), np.int32)
    ids[..., 1] = np.arange(hh)[:, None]
    ids[..., 2] = np.arange(ww)[None, :]
    return ids.reshape(hh * ww, 3)


def flux_schedule(num_steps: int, image_seq_len: int,
                  base_shift: float = 0.5, max_shift: float = 1.15,
                  shift: bool = True) -> np.ndarray:
    """Resolution-shifted sigma schedule, 1 -> 0 (num_steps+1 points):
    sigma' = e^mu / (e^mu + 1/sigma - 1) with mu linear in seq_len
    between (256, base_shift) and (4096, max_shift)."""
    ts = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    if shift:
        m = (max_shift - base_shift) / (4096 - 256)
        mu = m * image_seq_len + (base_shift - 256 * m)
        with np.errstate(divide="ignore"):
            ts = np.exp(mu) / (np.exp(mu) + (1.0 / ts - 1.0))
        ts[0], ts[-1] = 1.0, 0.0
    return ts.astype(np.float32)


# ---------------------------------------------------------------------------
# Params: init / BFL-format name map / inverse (for tests + export)
# ---------------------------------------------------------------------------

def init_flux_params(key, cfg: FluxConfig, dtype=jnp.float32) -> dict:
    """Random init (LeCun-normal linears, ones scales), scan-stacked."""
    h, mlp_h = cfg.hidden, int(cfg.hidden * cfg.mlp_ratio)
    hd = cfg.head_dim
    kit = iter(jax.random.split(key, 16 + cfg.depth_double
                                + cfg.depth_single))

    def lin(k, o, i, std=None):
        std = std if std is not None else i ** -0.5
        kw, _ = jax.random.split(k)
        return ((jax.random.normal(kw, (o, i), jnp.float32) * std
                 ).astype(dtype), jnp.zeros((o,), dtype))

    def embed(k, i):
        k1, k2 = jax.random.split(k)
        iw, ib = lin(k1, h, i)
        ow, ob = lin(k2, h, h)
        return {"in_w": iw, "in_b": ib, "out_w": ow, "out_b": ob}

    def dbl(k):
        ks = jax.random.split(k, 12)
        p = {}
        for s, base in (("img", 0), ("txt", 6)):
            qkv_w, qkv_b = lin(ks[base + 0], 3 * h, h)
            proj_w, proj_b = lin(ks[base + 1], h, h)
            mlp0_w, mlp0_b = lin(ks[base + 2], mlp_h, h)
            mlp2_w, mlp2_b = lin(ks[base + 3], h, mlp_h)
            mod_w, mod_b = lin(ks[base + 4], 6 * h, h)
            p.update({
                f"{s}_qkv_w": qkv_w, f"{s}_qkv_b": qkv_b,
                f"{s}_proj_w": proj_w, f"{s}_proj_b": proj_b,
                f"{s}_mlp0_w": mlp0_w, f"{s}_mlp0_b": mlp0_b,
                f"{s}_mlp2_w": mlp2_w, f"{s}_mlp2_b": mlp2_b,
                f"{s}_mod_w": mod_w, f"{s}_mod_b": mod_b,
                f"{s}_attn_norm": {"q_scale": jnp.ones((hd,), dtype),
                                   "k_scale": jnp.ones((hd,), dtype)},
            })
        return p

    def sgl(k):
        ks = jax.random.split(k, 3)
        l1_w, l1_b = lin(ks[0], 3 * h + mlp_h, h)
        l2_w, l2_b = lin(ks[1], h, h + mlp_h)
        mod_w, mod_b = lin(ks[2], 3 * h, h)
        return {"lin1_w": l1_w, "lin1_b": l1_b,
                "lin2_w": l2_w, "lin2_b": l2_b,
                "mod_w": mod_w, "mod_b": mod_b,
                "attn_norm": {"q_scale": jnp.ones((hd,), dtype),
                              "k_scale": jnp.ones((hd,), dtype)}}

    img_in_w, img_in_b = lin(next(kit), h, cfg.in_channels)
    txt_in_w, txt_in_b = lin(next(kit), h, cfg.context_dim)
    final_w, final_b = lin(next(kit), cfg.out_channels, h)
    fmod_w, fmod_b = lin(next(kit), 2 * h, h)
    params = {
        "img_in_w": img_in_w, "img_in_b": img_in_b,
        "txt_in_w": txt_in_w, "txt_in_b": txt_in_b,
        "time_in": embed(next(kit), 256),
        "vector_in": embed(next(kit), cfg.vec_dim),
        "final_w": final_w, "final_b": final_b,
        "final_mod_w": fmod_w, "final_mod_b": fmod_b,
        "double_blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0),
            *[dbl(next(kit)) for _ in range(cfg.depth_double)]),
        "single_blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0),
            *[sgl(next(kit)) for _ in range(cfg.depth_single)]),
    }
    if cfg.guidance_embed:
        params["guidance_in"] = embed(next(kit), 256)
    return params


def _bfl_names(cfg: FluxConfig) -> Dict[str, Tuple[str, ...]]:
    """BFL checkpoint key -> (pytree path) map. Block entries use
    ('double_blocks', i, leaf) / ('single_blocks', i, leaf)."""
    names: Dict[str, tuple] = {
        "img_in.weight": ("img_in_w",), "img_in.bias": ("img_in_b",),
        "txt_in.weight": ("txt_in_w",), "txt_in.bias": ("txt_in_b",),
        "final_layer.linear.weight": ("final_w",),
        "final_layer.linear.bias": ("final_b",),
        "final_layer.adaLN_modulation.1.weight": ("final_mod_w",),
        "final_layer.adaLN_modulation.1.bias": ("final_mod_b",),
    }
    for mod, tgt in (("time_in", "time_in"), ("vector_in", "vector_in"),
                     ("guidance_in", "guidance_in")):
        if mod == "guidance_in" and not cfg.guidance_embed:
            continue
        names[f"{mod}.in_layer.weight"] = (tgt, "in_w")
        names[f"{mod}.in_layer.bias"] = (tgt, "in_b")
        names[f"{mod}.out_layer.weight"] = (tgt, "out_w")
        names[f"{mod}.out_layer.bias"] = (tgt, "out_b")
    for i in range(cfg.depth_double):
        b = f"double_blocks.{i}"
        for s in ("img", "txt"):
            names.update({
                f"{b}.{s}_mod.lin.weight": ("double_blocks", i, f"{s}_mod_w"),
                f"{b}.{s}_mod.lin.bias": ("double_blocks", i, f"{s}_mod_b"),
                f"{b}.{s}_attn.qkv.weight":
                    ("double_blocks", i, f"{s}_qkv_w"),
                f"{b}.{s}_attn.qkv.bias": ("double_blocks", i, f"{s}_qkv_b"),
                f"{b}.{s}_attn.norm.query_norm.scale":
                    ("double_blocks", i, f"{s}_attn_norm", "q_scale"),
                f"{b}.{s}_attn.norm.key_norm.scale":
                    ("double_blocks", i, f"{s}_attn_norm", "k_scale"),
                f"{b}.{s}_attn.proj.weight":
                    ("double_blocks", i, f"{s}_proj_w"),
                f"{b}.{s}_attn.proj.bias":
                    ("double_blocks", i, f"{s}_proj_b"),
                f"{b}.{s}_mlp.0.weight": ("double_blocks", i, f"{s}_mlp0_w"),
                f"{b}.{s}_mlp.0.bias": ("double_blocks", i, f"{s}_mlp0_b"),
                f"{b}.{s}_mlp.2.weight": ("double_blocks", i, f"{s}_mlp2_w"),
                f"{b}.{s}_mlp.2.bias": ("double_blocks", i, f"{s}_mlp2_b"),
            })
    for i in range(cfg.depth_single):
        b = f"single_blocks.{i}"
        names.update({
            f"{b}.linear1.weight": ("single_blocks", i, "lin1_w"),
            f"{b}.linear1.bias": ("single_blocks", i, "lin1_b"),
            f"{b}.linear2.weight": ("single_blocks", i, "lin2_w"),
            f"{b}.linear2.bias": ("single_blocks", i, "lin2_b"),
            f"{b}.modulation.lin.weight": ("single_blocks", i, "mod_w"),
            f"{b}.modulation.lin.bias": ("single_blocks", i, "mod_b"),
            f"{b}.norm.query_norm.scale":
                ("single_blocks", i, "attn_norm", "q_scale"),
            f"{b}.norm.key_norm.scale":
                ("single_blocks", i, "attn_norm", "k_scale"),
        })
    return names


def flux_params_from_state_dict(sd: Dict[str, np.ndarray], cfg: FluxConfig,
                                dtype=np.float32
                                ) -> Tuple[dict, Dict[str, list]]:
    """Exact BFL-layout name map -> scan-stacked pytree + coverage report
    ({"loaded", "missed", "unused"} for `io/verify_load.check_mapping`)."""
    names = _bfl_names(cfg)
    # shapes only — materializing a real init here would compute 12B
    # random params just to validate geometry
    template = jax.eval_shape(lambda k: init_flux_params(k, cfg),
                              jax.random.PRNGKey(0))
    blocks: Dict[str, list] = {
        "double_blocks": [dict() for _ in range(cfg.depth_double)],
        "single_blocks": [dict() for _ in range(cfg.depth_single)],
    }
    flat: Dict[str, np.ndarray] = {}
    loaded, missed = [], []

    def _expected_shape(path):
        node = template
        for p in path:
            if isinstance(p, int):   # block index -> per-block leaf shape
                continue
            node = node[p]
        shape = tuple(node.shape)        # ShapeDtypeStruct from eval_shape
        # scan-stacked families carry a leading depth axis
        return shape[1:] if path[0] in blocks else shape

    for key, path in names.items():
        if key not in sd:
            missed.append("/".join(str(p) for p in path))
            continue
        val = np.asarray(sd[key], dtype)
        if val.shape != _expected_shape(path):
            # wrong-geometry checkpoint (e.g. base 64-channel flux1-dev
            # against the 128-channel Control config): count as missed so
            # the coverage gate refuses loudly instead of np.stack/jit
            # erroring later
            missed.append("/".join(str(p) for p in path))
            continue
        loaded.append("/".join(str(p) for p in path))
        if path[0] in blocks:
            _, i, *leaf = path
            d = blocks[path[0]][i]
            if len(leaf) == 2:
                d.setdefault(leaf[0], {})[leaf[1]] = val
            else:
                d[leaf[0]] = val
        elif len(path) == 2:
            flat.setdefault(path[0], {})[path[1]] = val
        else:
            flat[path[0]] = val
    params = dict(flat)

    def _flat_paths(d, prefix=()):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from _flat_paths(v, prefix + (k,))
            else:
                yield prefix + (k,)

    for fam, lst in blocks.items():
        if not any(lst):
            continue
        # a leaf missing from SOME blocks cannot stack — drop it from the
        # pytree (it is already recorded in `missed`; verify_load gates)
        common = set(_flat_paths(lst[0]))
        for d in lst[1:]:
            common &= set(_flat_paths(d))
        pruned = []
        for d in lst:
            pd: dict = {}
            for path in common:
                node = d
                for p in path[:-1]:
                    node = node[p]
                tgt = pd
                for p in path[:-1]:
                    tgt = tgt.setdefault(p, {})
                tgt[path[-1]] = node[path[-1]]
            pruned.append(pd)
        if common:
            params[fam] = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, 0), *pruned)
    unused = [k for k in sd if k not in names]
    return params, {"loaded": loaded, "missed": missed, "unused": unused}


def flux_params_to_state_dict(params: dict,
                              cfg: FluxConfig) -> Dict[str, np.ndarray]:
    """Inverse of the name map (export / loader round-trip tests)."""
    names = _bfl_names(cfg)
    out = {}
    for key, path in names.items():
        node = params
        for p in path:
            if isinstance(p, int):
                node = jax.tree_util.tree_map(lambda x, i=p: x[i], node)
            else:
                node = node[p]
        out[key] = np.asarray(node)
    return out
