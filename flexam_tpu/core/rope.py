"""3D rotary position embeddings with the Wan t/h/w frequency split + RIFLEx.

The reference precomputes complex rotation tables
(`rope_params`, `wan_transformer3d_FlexAM.py:44-52`) with head_dim d split as
  temporal: d - 4*(d//6)   spatial h: 2*(d//6)   spatial w: 2*(d//6)
(`:658-665`), and applies them per token by (f, h, w) grid position, row-major
(`rope_apply`, `:135-170`). Adjacent element pairs (x[2i], x[2i+1]) form the
complex components (torch.view_as_complex on a trailing reshape (..., 2)).

We store *angles* (fp32) instead of complex values; rotation is applied as
  out_even = x_e*cos - x_o*sin ;  out_odd = x_e*sin + x_o*cos.

RIFLEx (`get_1d_rotary_pos_embed_riflex`, `:56-113`) rescales the k-th
temporal frequency to 0.9*2*pi/L_test (optionally divided by L_test_scale) so
extrapolated frames stay within one period.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _axis_freqs(dim: int, theta: float = 10000.0) -> np.ndarray:
    """freqs[i] = 1/theta^(2i/dim), i < dim//2 (fp64 like the reference)."""
    assert dim % 2 == 0
    return 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)


def rope_split(head_dim: int) -> Tuple[int, int, int]:
    """Per-axis *complex* dims: (t, h, w). head_dim=128 -> (22, 21, 21)."""
    d = head_dim
    dt = (d - 4 * (d // 6)) // 2
    ds = d // 6
    return dt, ds, ds


def rope_angles(max_seq: int, dim: int, theta: float = 10000.0) -> np.ndarray:
    """Angle table [max_seq, dim//2] = outer(pos, freqs)."""
    freqs = _axis_freqs(dim, theta)
    return (np.arange(max_seq, dtype=np.float64)[:, None] * freqs).astype(np.float32)


def riflex_rope_angles(
    max_seq: int,
    dim: int,
    k: int,
    L_test: int,
    L_test_scale: Optional[float] = None,
    theta: float = 10000.0,
) -> np.ndarray:
    """RIFLEx temporal table: freq[k-1] = 0.9*2*pi/L_test (/L_test_scale)."""
    freqs = _axis_freqs(dim, theta)
    freqs[k - 1] = 0.9 * 2.0 * np.pi / L_test
    if L_test_scale is not None:
        freqs[k - 1] = freqs[k - 1] / L_test_scale
    return (np.arange(max_seq, dtype=np.float64)[:, None] * freqs).astype(np.float32)


def make_rope_tables(
    head_dim: int,
    max_seq: int = 1024,
    riflex: Optional[dict] = None,
) -> np.ndarray:
    """Concatenated angle table [max_seq, head_dim//2] in (t | h | w) order.

    Mirrors `self.freqs = cat([rope_params(1024, d-4*(d//6)), rope_params(1024,
    2*(d//6)), rope_params(1024, 2*(d//6))], dim=1)` (`:658-665`), with the
    optional RIFLEx temporal part (`enable_riflex`, `:774-788`).
    """
    d = head_dim
    dt2 = d - 4 * (d // 6)
    ds2 = 2 * (d // 6)
    if riflex is not None:
        t_tab = riflex_rope_angles(max_seq, dt2, **riflex)
    else:
        t_tab = rope_angles(max_seq, dt2)
    h_tab = rope_angles(max_seq, ds2)
    w_tab = rope_angles(max_seq, ds2)
    return np.concatenate([t_tab, h_tab, w_tab], axis=1)


def build_video_rope(
    tables: jnp.ndarray,
    grid: Tuple[int, int, int],
    head_dim: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token (cos, sin) of shape [F*H*W, head_dim//2] for grid (F, H, W).

    Token order is row-major over (f, h, w), matching `rope_apply`
    (`wan_transformer3d_FlexAM.py:151-156`). When a reference frame is
    prepended the caller passes F+1 and the ref tokens occupy frame 0
    (`:895-899` increments grid f by 1 with ref tokens at the sequence front).
    """
    f, h, w = grid
    dt, ds, _ = rope_split(head_dim)
    t_tab = tables[:f, :dt]                      # [F, dt]
    h_tab = tables[:h, dt:dt + ds]               # [H, ds]
    w_tab = tables[:w, dt + ds:dt + 2 * ds]      # [W, ds]
    ang = jnp.concatenate(
        [
            jnp.broadcast_to(t_tab[:, None, None, :], (f, h, w, dt)),
            jnp.broadcast_to(h_tab[None, :, None, :], (f, h, w, ds)),
            jnp.broadcast_to(w_tab[None, None, :, :], (f, h, w, ds)),
        ],
        axis=-1,
    ).reshape(f * h * w, head_dim // 2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate adjacent pairs of x [..., L, n_heads, head_dim] by (cos, sin)
    [L, head_dim//2]. Computed in fp32, cast back to x.dtype (the reference
    applies RoPE in fp32: `rope_apply` under `amp.autocast(enabled=False)`).

    Positions beyond len(cos) are left un-rotated (the reference only rotates
    the first seq_len = f*h*w tokens and passes padding through, `:160`).
    """
    orig_dtype = x.dtype
    L = x.shape[-3]
    Lr = cos.shape[0]
    xf = x.astype(jnp.float32)
    xe = xf[..., 0::2]
    xo = xf[..., 1::2]
    c = cos[:, None, :]   # [Lr, 1, hd/2]
    s = sin[:, None, :]
    if Lr < L:
        pad = L - Lr
        c = jnp.concatenate([c, jnp.ones((pad,) + c.shape[1:], c.dtype)], axis=0)
        s = jnp.concatenate([s, jnp.zeros((pad,) + s.shape[1:], s.dtype)], axis=0)
    else:
        c = c[:L]
        s = s[:L]
    out_e = xe * c - xo * s
    out_o = xe * s + xo * c
    out = jnp.stack([out_e, out_o], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)
