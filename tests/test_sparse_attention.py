"""Block-sparse attention (Pallas, interpret mode on CPU) vs a dense
reference under the equivalent token-level mask.

The paifuser sparse attention equivalent (`FlexAM/models/__init__.py:44-48`;
repo design notes in `flexam_tpu/ops/sparse_attention.py`): softmax over the
visible keys must be EXACT — sparsity changes which keys participate, not
the arithmetic."""

import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.ops.sparse_attention import (make_sparse_attn_fn,
                                             rows_to_arrays,
                                             sparse_flash_attention,
                                             video_block_rows)


def _rand_qkv(rs, b, l, h, d):
    return (jnp.asarray(rs.randn(b, l, h, d).astype(np.float32)),
            jnp.asarray(rs.randn(b, l, h, d).astype(np.float32)),
            jnp.asarray(rs.randn(b, l, h, d).astype(np.float32)))


def _dense_masked(q, k, v, rows, blk):
    """fp32 einsum attention with the block mask expanded to tokens."""
    l = q.shape[1]
    mask = np.zeros((l, l), bool)
    for i, row in enumerate(rows):
        for j in row:
            mask[i * blk:(i + 1) * blk, j * blk:(j + 1) * blk] = True
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (q.shape[-1] ** -0.5)
    s = jnp.where(jnp.asarray(mask)[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


import jax  # noqa: E402  (after jnp for the helper above)


def test_video_block_rows_policy():
    rows = video_block_rows(5, window=1, ref_block=True)
    assert len(rows) == 6
    assert rows[2] == [0, 1, 2, 3, 5]        # window +/-1, sink 0, ref 5
    assert rows[0] == [0, 1, 5]
    assert rows[5] == [0, 1, 2, 3, 4, 5]     # ref row is global
    kidx, nnz = rows_to_arrays(rows)
    assert kidx.shape == (6, 6) and nnz.tolist() == [3, 4, 5, 5, 4, 6]
    # padding clamps to the row's last active block
    assert kidx[0].tolist() == [0, 1, 5, 5, 5, 5]


def test_coarsen_rows_and_group_pick():
    from flexam_tpu.ops.sparse_attention import coarsen_rows, pick_group
    rows = video_block_rows(5, window=1, ref_block=True)   # 6 blocks
    coarse = coarsen_rows(rows, 2)                         # 3 blocks
    # coarse block 1 = frames 2,3: frames saw {1,2,3,(4),0,5} -> pairs
    assert coarse[1] == [0, 1, 2]
    assert coarse[0] == [0, 2] or coarse[0] == [0, 1, 2]
    assert pick_group(26, 448, max_group=2) == 2           # flagship
    assert pick_group(26, 448, max_group=1) == 1
    assert pick_group(4, 16, max_group=3) == 2             # divisor cap


@pytest.mark.parametrize("window", [0, 1, 2])
def test_sparse_matches_dense_masked(window):
    rs = np.random.RandomState(0)
    frames, blk = 4, 16
    rows = video_block_rows(frames, window=window, ref_block=True)
    l = (frames + 1) * blk
    q, k, v = _rand_qkv(rs, 2, l, 2, 128)
    ref = np.asarray(_dense_masked(q, k, v, rows, blk))
    out = np.asarray(sparse_flash_attention(q, k, v, rows, blk,
                                            interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_sparse_full_window_equals_dense():
    """window >= frames => every block visible => dense attention."""
    from flexam_tpu.core.attention import xla_attention
    rs = np.random.RandomState(1)
    frames, blk = 3, 16
    rows = video_block_rows(frames, window=frames, ref_block=True)
    l = (frames + 1) * blk
    q, k, v = _rand_qkv(rs, 1, l, 2, 128)
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(sparse_flash_attention(q, k, v, rows, blk,
                                            interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_make_sparse_attn_fn_dispatch():
    """Video-shaped self-attention goes sparse; cross-attention shapes
    fall through dense (identical results where the pattern is full)."""
    rs = np.random.RandomState(2)
    attn = make_sparse_attn_fn(3, 16, ref_tokens=16, window=3,
                               interpret=True)
    l = 4 * 16
    q, k, v = _rand_qkv(rs, 1, l, 2, 128)
    from flexam_tpu.core.attention import xla_attention
    np.testing.assert_allclose(np.asarray(attn(q, k, v)),
                               np.asarray(xla_attention(q, k, v)),
                               rtol=2e-3, atol=2e-3)
    # cross-attention: Lk != video_len -> dense path exactly
    kc = jnp.asarray(rs.randn(1, 8, 2, 128).astype(np.float32))
    vc = jnp.asarray(rs.randn(1, 8, 2, 128).astype(np.float32))
    np.testing.assert_allclose(np.asarray(attn(q, kc, vc)),
                               np.asarray(xla_attention(q, kc, vc)),
                               rtol=1e-5, atol=1e-5)


def test_sparse_engages_in_dit_forward_at_head_dim_128():
    """With head_dim=128 and 8-aligned spatial blocks the sparse kernel
    actually engages inside dit_forward (interpret mode); at a window
    covering all frames it must reproduce the dense forward."""
    from flexam_tpu.config import DiTConfig
    from flexam_tpu.models.dit import dit_forward, init_dit_params

    cfg = DiTConfig(dim=256, ffn_dim=256, num_heads=2, num_layers=1,
                    in_dim=4, out_dim=4, text_dim=16, text_len=4,
                    freq_dim=16, add_ref_conv=False, add_cnn_block=False)
    params = init_dit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 4, 4, 16, 16))
    t = jnp.zeros((1,), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 4, cfg.text_dim))
    dense = dit_forward(params, cfg, x, t, ctx)
    attn = make_sparse_attn_fn(4, 64, ref_tokens=0, window=4,
                               interpret=True)
    sparse = dit_forward(params, cfg, x, t, ctx, attn_fn=attn)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse),
                               rtol=2e-4, atol=2e-4)
    # a restrictive window must CHANGE the output (sparsity is real:
    # frame 2 sees only {0, 2} of 4 blocks at window=0)
    attn0 = make_sparse_attn_fn(4, 64, ref_tokens=0, window=0,
                                interpret=True)
    sparse0 = dit_forward(params, cfg, x, t, ctx, attn_fn=attn0)
    assert not np.allclose(np.asarray(dense), np.asarray(sparse0),
                           rtol=2e-4, atol=2e-4)


def test_pipeline_env_sparse_resolves(monkeypatch):
    """FLEXAM_ATTENTION=sparse resolves through pipeline.denoise without
    changing tiny-config results (1-token spatial blocks fail the 8-align
    guard -> dense fallback; the test covers the static-arg plumbing)."""
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import (FlexAMGenerationPipeline,
                                     FlexAMModels)

    cfg = tiny_test_config()
    k1, k2 = jax.random.split(jax.random.key(0))
    models = FlexAMModels(cfg=cfg,
                          dit_params=init_dit_params(k1, cfg.dit,
                                                     dtype=jnp.float32),
                          vae_params=init_vae_params(k2, cfg.vae))
    pipe = FlexAMGenerationPipeline(models, compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    video = rng.rand(1, 3, 9, 32, 32).astype(np.float32)
    cond = pipe.prepare_conditioning(video, None, video, video,
                                     [video] * 4, video[:, :, :1])
    ctx = jnp.asarray(rng.randn(2, 4, cfg.dit.text_dim).astype(np.float32))
    base = np.asarray(pipe.denoise(cond, ctx, num_inference_steps=2,
                                   seed=3))
    monkeypatch.setenv("FLEXAM_ATTENTION", "sparse")
    sp = np.asarray(pipe.denoise(cond, ctx, num_inference_steps=2, seed=3))
    assert pipe._sparse_attn_cache      # the resolver built a closure
    np.testing.assert_allclose(base, sp, rtol=1e-5, atol=1e-5)


def test_sparse_attn_fn_in_dit_forward():
    """The sparse attn_fn drops into dit_forward unchanged (tiny config,
    full window => must match the default dense forward)."""
    from flexam_tpu.config import DiTConfig
    from flexam_tpu.models.dit import dit_forward, init_dit_params
    from flexam_tpu.ops.sparse_attention import make_sparse_attn_fn

    cfg = DiTConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2,
                    in_dim=4, out_dim=4, text_dim=16, text_len=4,
                    freq_dim=16, add_ref_conv=False, add_cnn_block=False)
    params = init_dit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 4, 2, 8, 8))
    t = jnp.zeros((1,), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 4, cfg.text_dim))
    dense = dit_forward(params, cfg, x, t, ctx)
    # head_dim=32 here (64/2) is not a 128 multiple -> the sparse fn's
    # guard falls back to dense; the test asserts the integration is
    # transparent, sparse numerics are covered above
    attn = make_sparse_attn_fn(2, 16, ref_tokens=0, window=2,
                               interpret=True)
    sparse = dit_forward(params, cfg, x, t, ctx, attn_fn=attn)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse),
                               rtol=1e-5, atol=1e-5)
