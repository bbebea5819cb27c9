"""Unit tests for the numerics substrate vs independent (torch/numpy) refs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from flexam_tpu.core import (
    rms_norm, layer_norm, gelu_tanh, silu, group_norm,
    sinusoidal_embedding_1d,
)
from flexam_tpu.core.rope import (
    make_rope_tables, build_video_rope, apply_rope, rope_split,
)


def test_rms_norm_matches_torch():
    x = np.random.RandomState(0).randn(2, 5, 64).astype(np.float32)
    w = np.random.RandomState(1).rand(64).astype(np.float32)
    xt = torch.from_numpy(x)
    ref = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
           * torch.from_numpy(w)).numpy()
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    x = np.random.RandomState(0).randn(3, 7, 32).astype(np.float32)
    ref = F.layer_norm(torch.from_numpy(x), (32,), eps=1e-6).numpy()
    out = np.asarray(layer_norm(jnp.asarray(x), eps=1e-6))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    w = np.random.RandomState(1).rand(32).astype(np.float32)
    b = np.random.RandomState(2).rand(32).astype(np.float32)
    ref2 = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w),
                        torch.from_numpy(b), eps=1e-6).numpy()
    out2 = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), eps=1e-6))
    np.testing.assert_allclose(out2, ref2, rtol=1e-5, atol=1e-5)


def test_gelu_tanh_matches_torch():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    ref = F.gelu(torch.from_numpy(x), approximate="tanh").numpy()
    out = np.asarray(gelu_tanh(jnp.asarray(x)))
    # fp32 tanh saturates slightly differently in the far-negative tail
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_silu_matches_torch():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    ref = F.silu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(silu(jnp.asarray(x))), ref,
                               rtol=1e-5, atol=1e-6)


def test_group_norm_matches_torch():
    # channels-last input [B, T, H, W, C] vs torch NCTHW GroupNorm
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 4, 5, 12).astype(np.float32)
    w = rs.rand(12).astype(np.float32)
    b = rs.rand(12).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    ref = F.group_norm(xt, 4, torch.from_numpy(w), torch.from_numpy(b),
                       eps=1e-5).permute(0, 2, 3, 4, 1).numpy()
    out = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                num_groups=4))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sinusoidal_embedding_matches_reference_formula():
    # reference: sinusoid = outer(pos, 10000^(-arange(half)/half));
    # out = cat([cos, sin]) (`wan_transformer3d_FlexAM.py:31-41`)
    dim = 256
    pos = np.array([0.0, 1.0, 3.7, 999.0], dtype=np.float64)
    half = dim // 2
    sinusoid = np.outer(pos, np.power(10000.0, -np.arange(half) / half))
    ref = np.concatenate([np.cos(sinusoid), np.sin(sinusoid)], axis=1)
    out = np.asarray(sinusoidal_embedding_1d(dim, jnp.asarray(pos, jnp.float32)))
    # fp32 angle rounding at pos~1000 bounds abs error at ~6e-5 (bf16
    # activations downstream have eps ~8e-3, so this is far below noise)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)


def _torch_rope_apply(x, grid, tables_np):
    """Direct port of reference rope_apply semantics for testing only
    (`wan_transformer3d_FlexAM.py:135-164`), using angle tables."""
    b, s, n, d = x.shape
    c = d // 2
    dt = c - 2 * (c // 3)
    ds = c // 3
    f, h, w = grid
    seq = f * h * w
    ang_t = tables_np[:f, :dt]
    ang_h = tables_np[:h, dt:dt + ds]
    ang_w = tables_np[:w, dt + ds:dt + 2 * ds]
    ang = np.concatenate([
        np.broadcast_to(ang_t[:, None, None, :], (f, h, w, dt)),
        np.broadcast_to(ang_h[None, :, None, :], (f, h, w, ds)),
        np.broadcast_to(ang_w[None, None, :, :], (f, h, w, ds)),
    ], axis=-1).reshape(seq, 1, c)
    freqs = np.exp(1j * ang.astype(np.float64))
    out = np.array(x, dtype=np.float64)
    xc = out[:, :seq].reshape(b, seq, n, c, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    xc = xc * freqs[None]
    rot = np.stack([xc.real, xc.imag], axis=-1).reshape(b, seq, n, d)
    out[:, :seq] = rot
    return out.astype(np.float32)


def test_rope_split_values():
    assert rope_split(128) == (22, 21, 21)
    assert rope_split(24) == (4, 4, 4)


@pytest.mark.parametrize("head_dim,grid", [(24, (3, 2, 4)), (128, (2, 2, 2))])
def test_rope_matches_complex_reference(head_dim, grid):
    rs = np.random.RandomState(42)
    f, h, w = grid
    seq = f * h * w + 3   # extra padding tokens stay un-rotated
    x = rs.randn(2, seq, 2, head_dim).astype(np.float32)
    tables = make_rope_tables(head_dim, max_seq=32)
    ref = _torch_rope_apply(x, grid, tables)
    cos, sin = build_video_rope(jnp.asarray(tables), grid, head_dim)
    out = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_riflex_table_modifies_single_frequency():
    tables = make_rope_tables(24, max_seq=16)
    rif = make_rope_tables(24, max_seq=16,
                           riflex=dict(k=2, L_test=12, L_test_scale=None))
    dt, _, _ = rope_split(24)
    diff = np.abs(tables - rif).max(axis=0)
    changed = np.nonzero(diff > 1e-6)[0]
    assert list(changed) == [1]   # only temporal freq index k-1 changes
    np.testing.assert_allclose(rif[1, 1], 0.9 * 2 * np.pi / 12, rtol=1e-5)
