"""Fused elementwise Pallas kernels (ops/fused.py) vs the unfused path.

The fused kernels replace exact op compositions in `models/dit.py`
(`_self_attention`'s rms_norm+apply_rope, `_block_forward`'s
layer_norm+AdaLN-select); parity here is BIT-level in fp32 and tight in
bf16 because the kernels reproduce the same accumulate/cast points.
Reference fusions: paifuser (`FlexAM/models/__init__.py:23-103`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.core.layers import layer_norm, rms_norm
from flexam_tpu.core.rope import apply_rope, build_video_rope, make_rope_tables
from flexam_tpu.ops.fused import ln_modulation, rmsnorm_rope


def _ref_rmsnorm_rope(x, gamma, cos, sin, heads, eps=1e-6):
    b, s, d = x.shape
    y = rms_norm(x, gamma, eps).reshape(b, s, heads, d // heads)
    return apply_rope(y, cos, sin)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rmsnorm_rope_parity(dtype):
    key = jax.random.key(0)
    b, s, heads, dh = 2, 48, 3, 128
    d = heads * dh
    x = jax.random.normal(key, (b, s, d)).astype(dtype)
    gamma = (1.0 + 0.1 * jax.random.normal(jax.random.key(1), (d,))
             ).astype(dtype)
    tables = jnp.asarray(make_rope_tables(dh, 64))
    cos, sin = build_video_rope(tables, (2, 4, 5), dh)   # Lr=40 < S=48
    ref = _ref_rmsnorm_rope(x, gamma, cos, sin, heads)
    got = rmsnorm_rope(x, gamma, cos, sin, heads, interpret=True)
    assert got.shape == (b, s, heads, dh)
    # bf16: XLA's fused reference path carries excess fp32 precision
    # through the rms*gamma product into the rope upcast (bf16 rounds are
    # elided inside fusions); the kernel rounds at the written cast point,
    # so outputs differ by <=1 bf16 ulp
    tol = dict(rtol=2e-6, atol=2e-6) if dtype == jnp.float32 else \
        dict(rtol=3e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), **tol)


def test_rmsnorm_rope_unrotated_tail():
    """Tokens past len(cos) must pass through with only the rms norm."""
    b, s, heads, dh = 1, 16, 2, 128
    d = heads * dh
    x = jax.random.normal(jax.random.key(2), (b, s, d))
    gamma = jnp.ones((d,))
    tables = jnp.asarray(make_rope_tables(dh, 16))
    cos, sin = build_video_rope(tables, (1, 2, 4), dh)   # Lr=8
    got = rmsnorm_rope(x, gamma, cos, sin, heads, interpret=True)
    tail_ref = rms_norm(x, gamma).reshape(b, s, heads, dh)[:, 8:]
    np.testing.assert_allclose(np.asarray(got[:, 8:]),
                               np.asarray(tail_ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_modulation_binary_parity(dtype):
    """Binary-timestep mode vs the `_block_forward` term() formula."""
    b, s, d = 2, 40, 256
    x = jax.random.normal(jax.random.key(3), (b, s, d)).astype(dtype)
    pair_sh = jax.random.normal(jax.random.key(4), (b, 2, d))
    pair_sc = jax.random.normal(jax.random.key(5), (b, 2, d))
    mask = (jax.random.uniform(jax.random.key(6), (b, s)) > 0.5
            ).astype(jnp.float32)

    m = mask[:, :, None]
    sh = (pair_sh[:, 0:1] * m + pair_sh[:, 1:2] * (1 - m)).astype(dtype)
    sc = (pair_sc[:, 0:1] * m + pair_sc[:, 1:2] * (1 - m)).astype(dtype)
    ref = (layer_norm(x, eps=1e-6) * (1.0 + sc) + sh).astype(dtype)

    got = ln_modulation(x, pair_sh, pair_sc, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_modulation_broadcast_parity(dtype):
    b, s, d = 2, 24, 256
    x = jax.random.normal(jax.random.key(7), (b, s, d)).astype(dtype)
    sh = jax.random.normal(jax.random.key(8), (b, 1, d))
    sc = jax.random.normal(jax.random.key(9), (b, 1, d))
    ref = (layer_norm(x, eps=1e-6) * (1.0 + sc.astype(dtype))
           + sh.astype(dtype)).astype(dtype)
    got = ln_modulation(x, sh, sc, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-6, atol=2e-6)


def test_ln_modulation_odd_seq_padding():
    """Non-8-divisible sequence lengths pad internally and slice back."""
    b, s, d = 1, 13, 128
    x = jax.random.normal(jax.random.key(10), (b, s, d))
    sh = jnp.zeros((b, 1, d))
    sc = jnp.zeros((b, 1, d))
    ref = layer_norm(x, eps=1e-6)
    got = ln_modulation(x, sh, sc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dit_forward_fused_vs_unfused(monkeypatch):
    """Full DiT forward with the fused prologues engaged (interpret mode)
    must match the unfused forward within bf16 rounding noise."""
    from jax.experimental.pallas import tpu as pltpu

    from flexam_tpu.config import DiTConfig
    from flexam_tpu.models.dit import dit_forward, init_dit_params

    cfg = DiTConfig(dim=256, ffn_dim=512, num_heads=2, num_layers=2,
                    in_dim=8, out_dim=4, text_dim=32, text_len=6,
                    freq_dim=32, add_ref_conv=False, add_cnn_block=False)
    assert cfg.dim // cfg.num_heads == 128  # fused path requires dh%128==0
    params = init_dit_params(jax.random.key(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (1, 8, 2, 4, 4))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(2), (1, 6, 32))
    dens = jnp.asarray([0.1])

    monkeypatch.setenv("FLEXAM_FUSED", "0")
    ref = dit_forward(params, cfg, x, t, ctx, density=dens)
    monkeypatch.setenv("FLEXAM_FUSED", "1")
    with pltpu.force_tpu_interpret_mode():
        got = dit_forward(params, cfg, x, t, ctx, density=dens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_dit_forward_fused_binary_mask(monkeypatch):
    """Binary-timestep (TI2V) mode through the fused ln_modulation."""
    from jax.experimental.pallas import tpu as pltpu

    from flexam_tpu.config import DiTConfig
    from flexam_tpu.models.dit import dit_forward, init_dit_params

    cfg = DiTConfig(dim=256, ffn_dim=512, num_heads=2, num_layers=2,
                    in_dim=8, out_dim=4, text_dim=32, text_len=6,
                    freq_dim=32, add_ref_conv=False, add_cnn_block=False)
    params = init_dit_params(jax.random.key(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (1, 8, 2, 4, 4))
    l_vid = 2 * 2 * 2
    t = jnp.asarray([700.0])
    mask = (jax.random.uniform(jax.random.key(3), (1, l_vid)) > 0.5
            ).astype(jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 6, 32))
    dens = jnp.asarray([0.1])

    monkeypatch.setenv("FLEXAM_FUSED", "0")
    ref = dit_forward(params, cfg, x, t, ctx, density=dens,
                      binary_t_mask=mask)
    monkeypatch.setenv("FLEXAM_FUSED", "1")
    with pltpu.force_tpu_interpret_mode():
        got = dit_forward(params, cfg, x, t, ctx, density=dens,
                          binary_t_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


# ---------------------------------------------------------------------------
# Multi-chip composition (round 5): the fused kernels run per-shard inside
# a shard_map over the activation mesh instead of standing down — the
# composition the reference needs to stack paifuser kernels with xDiT SP
# (`FlexAM/models/__init__.py:23-103` + `wan_transformer3d_FlexAM.py:801-815`).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mesh():
    from flexam_tpu.parallel import make_mesh
    assert len(jax.devices()) >= 8
    return make_mesh({"dp": 2, "sp": 2, "tp": 2},
                     devices=jax.devices()[:8])


def test_rmsnorm_rope_under_mesh(mesh):
    """Sharded fused call (interpret kernels per shard) == unfused ref."""
    from flexam_tpu.parallel import activation_sharding

    b, s, heads, dh = 2, 48, 3, 128       # s=48 divides sp=2, b=2 / dp=2
    d = heads * dh
    x = jax.random.normal(jax.random.key(0), (b, s, d))
    gamma = (1.0 + 0.1 * jax.random.normal(jax.random.key(1), (d,)))
    tables = jnp.asarray(make_rope_tables(dh, 64))
    cos, sin = build_video_rope(tables, (2, 4, 5), dh)
    ref = _ref_rmsnorm_rope(x, gamma, cos, sin, heads)
    with activation_sharding(mesh):
        got = rmsnorm_rope(x, gamma, cos, sin, heads, interpret=True)
    assert got.shape == (b, s, heads, dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_ln_modulation_binary_under_mesh(mesh):
    from flexam_tpu.parallel import activation_sharding

    b, s, d = 2, 40, 256
    x = jax.random.normal(jax.random.key(3), (b, s, d))
    pair_sh = jax.random.normal(jax.random.key(4), (b, 2, d))
    pair_sc = jax.random.normal(jax.random.key(5), (b, 2, d))
    mask = (jax.random.uniform(jax.random.key(6), (b, s)) > 0.5
            ).astype(jnp.float32)
    ref = ln_modulation(x, pair_sh, pair_sc, mask=mask, interpret=True)
    with activation_sharding(mesh):
        got = ln_modulation(x, pair_sh, pair_sc, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_ln_modulation_bcast_under_mesh(mesh):
    from flexam_tpu.parallel import activation_sharding

    b, s, d = 2, 24, 256
    x = jax.random.normal(jax.random.key(7), (b, s, d))
    sh = jax.random.normal(jax.random.key(8), (b, 1, d))
    sc = jax.random.normal(jax.random.key(9), (b, 1, d))
    ref = ln_modulation(x, sh, sc, interpret=True)
    with activation_sharding(mesh):
        got = ln_modulation(x, sh, sc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_fused_mesh_indivisible_fallback(mesh):
    """Shapes the mesh does not divide take the exact unfused math."""
    from flexam_tpu.parallel import activation_sharding

    b, s, heads, dh = 1, 15, 2, 128       # b=1 < dp=2, s=15 % sp=2 != 0
    d = heads * dh
    x = jax.random.normal(jax.random.key(10), (b, s, d))
    gamma = jnp.ones((d,))
    tables = jnp.asarray(make_rope_tables(dh, 16))
    cos, sin = build_video_rope(tables, (1, 2, 4), dh)
    ref = _ref_rmsnorm_rope(x, gamma, cos, sin, heads)
    with activation_sharding(mesh):
        got = rmsnorm_rope(x, gamma, cos, sin, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    sh = jax.random.normal(jax.random.key(11), (b, 2, d))
    sc = jax.random.normal(jax.random.key(12), (b, 2, d))
    mask = (jax.random.uniform(jax.random.key(13), (b, s)) > 0.5
            ).astype(jnp.float32)
    ref = ln_modulation(x, sh, sc, mask=mask, interpret=True)
    with activation_sharding(mesh):
        got = ln_modulation(x, sh, sc, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_dit_forward_fused_under_mesh(monkeypatch):
    """Full DiT forward, fused kernels engaged under a dp2 x sp2 x tp2
    mesh (FLEXAM_FUSED=interpret — the dryrun's production-path mode),
    vs the single-device unfused forward."""
    from flexam_tpu.config import DiTConfig
    from flexam_tpu.models.dit import dit_forward, init_dit_params
    from flexam_tpu.parallel import (activation_sharding,
                                     dit_param_shardings, make_mesh,
                                     shard_pytree)

    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2},
                     devices=jax.devices()[:8])
    cfg = DiTConfig(dim=256, ffn_dim=512, num_heads=2, num_layers=2,
                    in_dim=8, out_dim=4, text_dim=32, text_len=6,
                    freq_dim=32, add_ref_conv=False, add_cnn_block=False)
    params = init_dit_params(jax.random.key(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 8, 2, 4, 4))
    t = jnp.asarray([500.0, 500.0])
    ctx = jax.random.normal(jax.random.key(2), (2, 6, 32))
    dens = jnp.asarray([0.1, 0.1])

    monkeypatch.setenv("FLEXAM_FUSED", "0")
    ref = dit_forward(params, cfg, x, t, ctx, density=dens)
    monkeypatch.setenv("FLEXAM_FUSED", "interpret")
    sharded = shard_pytree(params, dit_param_shardings(mesh, params))
    with activation_sharding(mesh):
        got = jax.jit(
            lambda p, *a: dit_forward(p, cfg, *a, density=dens)
        )(sharded, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
