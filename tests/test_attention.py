"""Flash attention (Pallas, interpret mode on CPU) vs XLA einsum reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.core.attention import xla_attention
from flexam_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rs, b, lq, lk, h, d, dtype=np.float32):
    q = rs.randn(b, lq, h, d).astype(dtype)
    k = rs.randn(b, lk, h, d).astype(dtype)
    v = rs.randn(b, lk, h, d).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_xla_attention_matches_torch_sdpa():
    import torch
    rs = np.random.RandomState(0)
    q, k, v = _rand_qkv(rs, 2, 9, 13, 2, 16)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(np.asarray(q)).permute(0, 2, 1, 3),
        torch.from_numpy(np.asarray(k)).permute(0, 2, 1, 3),
        torch.from_numpy(np.asarray(v)).permute(0, 2, 1, 3),
    ).permute(0, 2, 1, 3).numpy()
    out = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_xla_attention_k_len_mask():
    rs = np.random.RandomState(1)
    q, k, v = _rand_qkv(rs, 2, 5, 10, 2, 16)
    k_len = jnp.asarray([10, 6])
    out = np.asarray(xla_attention(q, k, v, k_len=k_len))
    # batch 1 must equal attention over truncated keys
    ref1 = np.asarray(xla_attention(q[1:], k[1:, :6], v[1:, :6]))
    np.testing.assert_allclose(out[1], ref1[0], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("lq,lk", [(256, 512), (300, 700)])
def test_flash_attention_interpret_matches_xla(lq, lk):
    rs = np.random.RandomState(2)
    q, k, v = _rand_qkv(rs, 1, lq, lk, 2, 128)
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(flash_attention(q, k, v, blq=128, blk=128, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_flash_attention_interpret_k_len():
    rs = np.random.RandomState(3)
    q, k, v = _rand_qkv(rs, 2, 128, 256, 1, 128)
    k_len = jnp.asarray([256, 100])
    ref = np.asarray(xla_attention(q, k, v, k_len=k_len))
    out = np.asarray(flash_attention(q, k, v, k_len=k_len, blq=128, blk=128,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_flash_attention_rejects_bad_head_dim():
    rs = np.random.RandomState(4)
    q, k, v = _rand_qkv(rs, 1, 8, 8, 1, 24)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v, interpret=True)


def test_int8_attention_close_to_xla():
    """SageAttention-equivalent int8 kernel: quantization error stays
    small vs exact attention (interpret mode on CPU)."""
    from flexam_tpu.ops.int8_attention import int8_flash_attention

    rng = np.random.RandomState(0)
    q = rng.randn(1, 256, 2, 128).astype(np.float32)
    k = rng.randn(1, 256, 2, 128).astype(np.float32)
    v = rng.randn(1, 256, 2, 128).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    out = np.asarray(int8_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_int8_auto_selects_in_riflex_regime(monkeypatch):
    """VERDICT r3 item 7: the AUTO pallas default upgrades to int8 QK^T
    for long self-attention (>= 23,296 tokens, the measured win regime:
    1.06x @23k, 1.08x @35k vs 1.00x @11.6k) — never when the user chose a
    backend explicitly, never for cross-attention, and FLEXAM_INT8_AUTO=0
    opts out."""
    import flexam_tpu.core.attention as A

    monkeypatch.delenv("FLEXAM_INT8_AUTO", raising=False)
    monkeypatch.setattr(A, "_backend_choice", lambda: ("pallas", False))
    L = A.INT8_AUTO_MIN_TOKENS
    assert A.resolve_backend(L, L) == "pallas_int8"
    assert A.resolve_backend(L + 448, L + 448) == "pallas_int8"
    # below the measured threshold: stay bf16 dense
    assert A.resolve_backend(11648, 11648) == "pallas"
    # cross-attention (kv = text tokens) never auto-upgrades
    assert A.resolve_backend(L, 512) == "pallas"
    # explicit user choices always win
    assert A.resolve_backend(L, L, backend="pallas") == "pallas"
    monkeypatch.setattr(A, "_backend_choice", lambda: ("pallas", True))
    assert A.resolve_backend(L, L) == "pallas"
    # opt-out env
    monkeypatch.setattr(A, "_backend_choice", lambda: ("pallas", False))
    monkeypatch.setenv("FLEXAM_INT8_AUTO", "0")
    assert A.resolve_backend(L, L) == "pallas"
    # CPU/xla default untouched
    monkeypatch.delenv("FLEXAM_INT8_AUTO", raising=False)
    monkeypatch.setattr(A, "_backend_choice", lambda: ("xla", False))
    assert A.resolve_backend(L, L) == "xla"
