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


# ---------------------------------------------------------------------------
# Round 5: the acceleration stack composed with the multi-chip path
# (VERDICT r4 item 1) — sparse policy through Ulysses/USP, int8-quantized
# trees under TP sharding rules.
# ---------------------------------------------------------------------------

def test_sparse_inner_through_ulysses(mesh):
    """Block-sparse video attention as the Ulysses inner: after the
    heads<->seq all-to-all each shard sees the FULL sequence, so the
    sparse kernel runs unchanged per shard. Parity vs the single-device
    masked-dense semantics (the kernel's pinned reference)."""
    from flexam_tpu.ops.sparse_attention import (make_sparse_attn_fn,
                                                 masked_dense_attention,
                                                 video_sparse_policy)

    frames, spatial, window = 4, 16, 2
    pol = video_sparse_policy(frames, spatial, ref_tokens=spatial,
                              window=window, group=1)
    l = pol["video_len"]
    b, h, d = 2, 2, 128
    rng = np.random.RandomState(7)
    q = rng.randn(b, l, h, d).astype(np.float32) * 0.3
    k = rng.randn(b, l, h, d).astype(np.float32) * 0.3
    v = rng.randn(b, l, h, d).astype(np.float32)
    ref = np.asarray(masked_dense_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        pol["rows"], pol["blk"]))

    sparse_inner = make_sparse_attn_fn(frames, spatial,
                                       ref_tokens=spatial, window=window,
                                       group=1)
    attn = make_ulysses_attention(mesh, inner=sparse_inner)
    out = np.asarray(jax.jit(attn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sparse_ring_through_usp(usp_mesh):
    """Block-sparse policy through the USP ring: each hop applies the
    (query-slice x KV-origin-slice) sub-mask; exact vs masked dense."""
    from flexam_tpu.parallel.usp import make_usp_attention
    from flexam_tpu.ops.sparse_attention import (masked_dense_attention,
                                                 video_sparse_policy)

    frames, spatial, window = 7, 16, 1
    pol = video_sparse_policy(frames, spatial, ref_tokens=spatial,
                              window=window, group=1)
    l = pol["video_len"]          # 8 blocks x 16 = 128; ring=2 -> 64/rank
    b, h, d = 2, 2, 32
    rng = np.random.RandomState(8)
    q = rng.randn(b, l, h, d).astype(np.float32) * 0.3
    k = rng.randn(b, l, h, d).astype(np.float32) * 0.3
    v = rng.randn(b, l, h, d).astype(np.float32)
    ref = np.asarray(masked_dense_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        pol["rows"], pol["blk"]))

    attn = make_usp_attention(usp_mesh, inner=xla_attention, sparse=pol)
    out = np.asarray(jax.jit(attn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # non-video shapes (cross-attention) stay dense through the same fn
    kc = rng.randn(b, 16, h, d).astype(np.float32)
    vc = rng.randn(b, 16, h, d).astype(np.float32)
    dense_ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(kc),
                                         jnp.asarray(vc)))
    out_c = np.asarray(jax.jit(attn)(q, kc, vc))
    np.testing.assert_allclose(out_c, dense_ref, rtol=1e-5, atol=1e-5)


def test_usp_sparse_policy_ring_mismatch_raises(usp_mesh):
    from flexam_tpu.parallel.usp import make_usp_attention
    from flexam_tpu.ops.sparse_attention import video_sparse_policy

    pol = video_sparse_policy(4, 16, ref_tokens=16, window=2, group=1)
    # 5 blocks of 16 = 80 tokens: indivisible by ring=2 -> loud refusal
    with pytest.raises(ValueError, match="ring"):
        make_usp_attention(usp_mesh, sparse=pol)


def test_ulysses_batch1_cfg_skip_tail(mesh):
    """The cfg-skip tail runs batch=1 chunks under dp=2: the wrapper must
    replicate the batch axis for those calls instead of failing."""
    rng = np.random.RandomState(9)
    b, l, h, d = 1, 64, 4, 32
    q = rng.randn(b, l, h, d).astype(np.float32)
    k = rng.randn(b, l, h, d).astype(np.float32)
    v = rng.randn(b, l, h, d).astype(np.float32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    attn = make_ulysses_attention(mesh, inner=xla_attention)
    out = np.asarray(jax.jit(attn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_dit_params_int8_tp_sharding(mesh):
    """Quantized trees shard under the same TP rules: weight_q follows
    weight; w_scale follows the out-channel split for q/k/v/fc1 and
    REPLICATES for o/fc2 (TP splits their contraction dim)."""
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.ops.qlinear import convert_dit_to_int8

    cfg = tiny_test_config().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = convert_dit_to_int8(params)
    sharded = shard_pytree(params, dit_param_shardings(mesh, params))

    qq = sharded["blocks"]["self_attn"]["q"]
    assert ({s.data.shape for s in qq["weight_q"].addressable_shards}
            == {(cfg.num_layers, cfg.dim // 2, cfg.dim)})
    assert ({s.data.shape for s in qq["w_scale"].addressable_shards}
            == {(cfg.num_layers, cfg.dim // 2)})
    oo = sharded["blocks"]["self_attn"]["o"]
    assert ({s.data.shape for s in oo["weight_q"].addressable_shards}
            == {(cfg.num_layers, cfg.dim, cfg.dim // 2)})
    # o's per-out-channel scales replicate (every tp shard dequantizes
    # full output channels from its int32 partials)
    assert ({s.data.shape for s in oo["w_scale"].addressable_shards}
            == {(cfg.num_layers, cfg.dim)})
    f1 = sharded["blocks"]["ffn"]["fc1"]
    assert ({s.data.shape for s in f1["weight_q"].addressable_shards}
            == {(cfg.num_layers, cfg.ffn_dim // 2, cfg.dim)})
    f2 = sharded["blocks"]["ffn"]["fc2"]
    assert ({s.data.shape for s in f2["w_scale"].addressable_shards}
            == {(cfg.num_layers, cfg.dim)})


def test_dit_forward_int8_under_mesh(mesh):
    """Quantized DiT forward under the mesh (TP-sharded weight_q, Ulysses
    attention) == the single-device quantized forward. int32 MXU partial
    sums are exact under resharding, so tolerance is fp32-tight."""
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import dit_forward, init_dit_params
    from flexam_tpu.ops.qlinear import convert_dit_to_int8, is_quantized

    cfg = tiny_test_config().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = convert_dit_to_int8(params)
    assert is_quantized(params)
    rng = np.random.RandomState(2)
    x = rng.randn(2, cfg.in_dim, 2, 4, 4).astype(np.float32)
    t = np.array([500.0, 500.0], np.float32)
    ctx = rng.randn(2, cfg.text_len, cfg.text_dim).astype(np.float32) * 0.1

    ref = np.asarray(dit_forward(params, cfg, x, t, ctx))
    sharded = shard_pytree(params, dit_param_shardings(mesh, params))
    attn = make_ulysses_attention(mesh, inner=xla_attention)
    with activation_sharding(mesh):
        out = np.asarray(jax.jit(
            lambda p, *a: dit_forward(p, cfg, *a, attn_fn=attn)
        )(sharded, x, t, ctx))
    # int32 partial sums are exact under resharding, but the Ulysses
    # attention's fp32 reduction order perturbs activations ~1e-7, which
    # can flip a dynamic per-token round() by one int8 step on a few
    # elements — bound the flip amplitude, and require the bulk exact
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=5e-2)
    frac_tight = np.mean(np.abs(out - ref) <= 1e-4 + 1e-4 * np.abs(ref))
    assert frac_tight > 0.95, frac_tight
