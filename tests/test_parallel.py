"""Sharding layer tests on the 8-device virtual CPU mesh: Ulysses
attention parity, param sharding placement, token constraints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.core.attention import xla_attention
from flexam_tpu.parallel import (activation_sharding, dit_param_shardings,
                                 make_mesh, shard_pytree)
from flexam_tpu.parallel.ulysses import make_ulysses_attention


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh({"dp": 2, "sp": 2, "tp": 2},
                     devices=jax.devices()[:8])


def test_ulysses_self_attention_parity(mesh):
    rng = np.random.RandomState(0)
    b, l, h, d = 2, 64, 4, 32
    q = rng.randn(b, l, h, d).astype(np.float32)
    k = rng.randn(b, l, h, d).astype(np.float32)
    v = rng.randn(b, l, h, d).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    attn = make_ulysses_attention(mesh, inner=xla_attention)
    out = np.asarray(jax.jit(attn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ulysses_cross_attention_parity(mesh):
    rng = np.random.RandomState(1)
    b, lq, lk, h, d = 2, 64, 16, 4, 32
    q = rng.randn(b, lq, h, d).astype(np.float32)
    k = rng.randn(b, lk, h, d).astype(np.float32)
    v = rng.randn(b, lk, h, d).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    attn = make_ulysses_attention(mesh, inner=xla_attention)
    out = np.asarray(jax.jit(attn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_dit_params_tp_sharding(mesh):
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params

    cfg = tiny_test_config().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sharded = shard_pytree(params, dit_param_shardings(mesh, params))
    qw = sharded["blocks"]["self_attn"]["q"]["weight"]
    # [L, out, in] sharded over tp on the out dim -> each shard holds out/2
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert shard_shapes == {(cfg.num_layers, cfg.dim // 2, cfg.dim)}
    ow = sharded["blocks"]["self_attn"]["o"]["weight"]
    shard_shapes = {s.data.shape for s in ow.addressable_shards}
    assert shard_shapes == {(cfg.num_layers, cfg.dim, cfg.dim // 2)}


def test_ulysses_inside_dit_forward(mesh):
    """Full DiT forward with the Ulysses attn_fn under the mesh."""
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import dit_forward, init_dit_params

    cfg = tiny_test_config().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    x = rng.randn(2, cfg.in_dim, 2, 4, 4).astype(np.float32)
    t = np.array([500.0, 500.0], np.float32)
    ctx = rng.randn(2, cfg.text_len, cfg.text_dim).astype(np.float32) * 0.1

    ref = np.asarray(dit_forward(params, cfg, x, t, ctx))
    attn = make_ulysses_attention(mesh, inner=xla_attention)
    with activation_sharding(mesh):
        out = np.asarray(dit_forward(params, cfg, x, t, ctx, attn_fn=attn))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_ring_attention_parity(mesh):
    from flexam_tpu.parallel.ring import make_ring_attention

    rng = np.random.RandomState(3)
    b, l, h, d = 2, 64, 4, 32
    q = rng.randn(b, l, h, d).astype(np.float32)
    k = rng.randn(b, l, h, d).astype(np.float32)
    v = rng.randn(b, l, h, d).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    attn = make_ring_attention(mesh)
    out = np.asarray(jax.jit(attn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ring_cross_attention_falls_back(mesh):
    from flexam_tpu.parallel.ring import make_ring_attention

    rng = np.random.RandomState(4)
    q = rng.randn(2, 64, 4, 32).astype(np.float32)
    k = rng.randn(2, 16, 4, 32).astype(np.float32)
    v = rng.randn(2, 16, 4, 32).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    out = np.asarray(jax.jit(make_ring_attention(mesh))(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sharded_vae_decode_parity(mesh):
    """`parallel_magvit_vae` equivalent: width-sharded whole-clip decode
    matches the unsharded result (GSPMD conv halo exchange)."""
    from flexam_tpu.config import VAEConfig
    from flexam_tpu.models.vae import init_vae_params, vae_decode
    from flexam_tpu.parallel.vae_parallel import vae_decode_sharded

    cfg = VAEConfig(latent_channels=8, c_dim=16, dec_dim=16,
                    dim_mult=(1, 2, 4, 4), num_res_blocks=1,
                    temporal_downsample=(False, True, True))
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 2, 4),
                          jnp.float32) * 0.5
    ref = np.asarray(vae_decode(params, cfg, z))
    out = np.asarray(vae_decode_sharded(params, cfg, z, mesh))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# USP: Ulysses x ring hybrid (reference ulysses_degree x ring_degree,
# ui/controller.py:63,89-95; VERDICT r1 item 3)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def usp_mesh():
    from jax.sharding import Mesh
    dev = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    return Mesh(dev, ("dp", "ring", "sp"))


def test_usp_self_attention_parity(usp_mesh):
    from flexam_tpu.parallel.usp import make_usp_attention
    rng = np.random.RandomState(1)
    b, l, h, d = 2, 64, 4, 32
    q = rng.randn(b, l, h, d).astype(np.float32)
    k = rng.randn(b, l, h, d).astype(np.float32)
    v = rng.randn(b, l, h, d).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    attn = make_usp_attention(usp_mesh, inner=xla_attention)
    out = np.asarray(jax.jit(attn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_usp_cross_attention_parity(usp_mesh):
    from flexam_tpu.parallel.usp import make_usp_attention
    rng = np.random.RandomState(2)
    b, l, lk, h, d = 2, 64, 16, 4, 32
    q = rng.randn(b, l, h, d).astype(np.float32)
    k = rng.randn(b, lk, h, d).astype(np.float32)
    v = rng.randn(b, lk, h, d).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    attn = make_usp_attention(usp_mesh, inner=xla_attention)
    out = np.asarray(jax.jit(attn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_usp_degenerate_axes_match_pure_schedules(usp_mesh):
    """ring=1 reduces to Ulysses; ulysses=1 reduces to ring — via meshes
    where one axis has size 1."""
    from jax.sharding import Mesh
    from flexam_tpu.parallel.usp import make_usp_attention
    rng = np.random.RandomState(3)
    b, l, h, d = 2, 64, 4, 32
    q = rng.randn(b, l, h, d).astype(np.float32)
    k = rng.randn(b, l, h, d).astype(np.float32)
    v = rng.randn(b, l, h, d).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    dev = np.asarray(jax.devices()[:8])
    for shape, axes in [((2, 1, 4), ("dp", "ring", "sp")),
                        ((2, 4, 1), ("dp", "ring", "sp"))]:
        m = Mesh(dev.reshape(shape), axes)
        out = np.asarray(jax.jit(make_usp_attention(
            m, inner=xla_attention))(q, k, v))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=str(shape))


def test_usp_inside_dit_forward(usp_mesh):
    """Full DiT forward with the USP attn_fn on the 2x2x2 mesh matches the
    single-device forward."""
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import dit_forward, init_dit_params
    from flexam_tpu.parallel.usp import make_usp_attention

    cfg = tiny_test_config().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    b, c, f, h, w = 2, cfg.out_dim, 2, 4, 4
    x = rng.randn(b, c, f, h, w).astype(np.float32)
    y = rng.randn(b, 2 * c + 4, f, h, w).astype(np.float32)
    add = rng.randn(b, 5 * c, f, h, w).astype(np.float32)
    ref_img = rng.randn(b, c, h, w).astype(np.float32)
    t = np.full((b,), 500.0, np.float32)
    ctx = rng.randn(b, cfg.text_len, cfg.text_dim).astype(np.float32) * .1
    dens = np.full((b,), 0.1, np.float32)

    base = dit_forward(params, cfg, x, t, ctx, density=dens, y=y,
                       additional_control=add, full_ref=ref_img)
    attn = make_usp_attention(usp_mesh, inner=xla_attention)
    out = dit_forward(params, cfg, x, t, ctx, density=dens, y=y,
                      additional_control=add, full_ref=ref_img,
                      attn_fn=attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
