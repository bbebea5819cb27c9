"""DiT tests: piecewise parity vs torch primitives + end-to-end invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from flexam_tpu.config import tiny_test_config
from flexam_tpu.models.dit import (
    _cnn_fusion, _patch_embed, _ref_embed, dit_forward, init_dit_params,
    make_rope_tables_for,
)

CFG = tiny_test_config().dit


def test_patch_embed_matches_torch_conv3d():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 5, 3, 8, 8).astype(np.float32)   # [B,C,F,H,W]
    w = rs.randn(7, 5, 1, 2, 2).astype(np.float32)
    b = rs.randn(7).astype(np.float32)
    ref = F.conv3d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=(1, 2, 2))
    # [B,dim,F,H',W'] -> [B, L, dim] row-major f,h,w
    ref = ref.flatten(2).transpose(1, 2).numpy()
    out, grid = _patch_embed(jnp.asarray(x),
                             {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                             (1, 2, 2))
    assert grid == (3, 4, 4)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_ref_embed_matches_torch_conv2d():
    rs = np.random.RandomState(1)
    x = rs.randn(2, 5, 8, 10).astype(np.float32)
    w = rs.randn(7, 5, 2, 2).astype(np.float32)
    b = rs.randn(7).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=2).flatten(2).transpose(1, 2).numpy()
    out = _ref_embed(jnp.asarray(x),
                     {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, (2, 2))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_cnn_fusion_matches_torch():
    """5-conv residual CNN vs a direct torch composition
    (`wan_transformer3d_FlexAM.py:680-711,869-881`)."""
    rs = np.random.RandomState(2)
    cin, c1, c2, cout = 12, 8, 4, 6
    g1, g2 = 2, 2
    x = rs.randn(1, 3, 2, 6, 6).astype(np.float32)  # [B,F,T? no: B,F,H,W,C] later
    # build params
    def conv_p(ci, co, k):
        return {"weight": jnp.asarray(rs.randn(co, ci, *k).astype(np.float32) * 0.1),
                "bias": jnp.asarray(rs.randn(co).astype(np.float32) * 0.1)}
    def gn_p(c):
        return {"weight": jnp.asarray(rs.rand(c).astype(np.float32)),
                "bias": jnp.asarray(rs.rand(c).astype(np.float32))}
    cnn = {
        "conv1": conv_p(cin, c1, (1, 3, 3)), "gn1": gn_p(c1),
        "conv2": conv_p(c1, c1, (1, 3, 3)), "gn2": gn_p(c1),
        "conv3": conv_p(c1, c2, (1, 3, 3)), "gn3": gn_p(c2),
        "conv4": conv_p(c2, c2, (1, 3, 3)), "gn4": gn_p(c2),
        "conv5": conv_p(c2, cout, (1, 1, 1)),
    }
    xin = rs.randn(1, cin, 3, 6, 6).astype(np.float32)  # NCTHW

    # torch reference
    def tconv(xt, p, pad):
        return F.conv3d(xt, torch.from_numpy(np.asarray(p["weight"])),
                        torch.from_numpy(np.asarray(p["bias"])), padding=pad)
    def tgn(xt, p, g):
        return F.group_norm(xt, g, torch.from_numpy(np.asarray(p["weight"])),
                            torch.from_numpy(np.asarray(p["bias"])))
    xt = torch.from_numpy(xin)
    x1 = F.silu(tgn(tconv(xt, cnn["conv1"], (0, 1, 1)), cnn["gn1"], g1))
    x2 = F.silu(tgn(tconv(x1, cnn["conv2"], (0, 1, 1)), cnn["gn2"], g1)) + x1
    x3 = F.silu(tgn(tconv(x2, cnn["conv3"], (0, 1, 1)), cnn["gn3"], g2))
    x4 = F.silu(tgn(tconv(x3, cnn["conv4"], (0, 1, 1)), cnn["gn4"], g2)) + x3
    ref = tconv(x4, cnn["conv5"], 0).numpy()

    out = _cnn_fusion(cnn, jnp.asarray(xin.transpose(0, 2, 3, 4, 1)), (g1, g2))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def _make_inputs(rs, cfg, b=2, f=3, h=8, w=8, per_token_t=False, with_ref=True):
    c = 8  # latent channels in tiny config (out_dim)
    x = jnp.asarray(rs.randn(b, c, f, h // 2, w // 2).astype(np.float32))
    y = jnp.asarray(rs.randn(b, c + 4 + c, f, h // 2, w // 2).astype(np.float32))
    ac = jnp.asarray(rs.randn(b, 5 * c, f, h // 2, w // 2).astype(np.float32))
    ref = jnp.asarray(rs.randn(b, c, h // 2, w // 2).astype(np.float32)) if with_ref else None
    l_vid = f * (h // 4) * (w // 4)
    if per_token_t:
        t = jnp.asarray(rs.randint(0, 1000, (b, l_vid)).astype(np.float32))
    else:
        t = jnp.asarray(rs.randint(0, 1000, (b,)).astype(np.float32))
    ctx = jnp.asarray(rs.randn(b, cfg.text_len, cfg.text_dim).astype(np.float32))
    dens = jnp.asarray(rs.rand(b).astype(np.float32))
    return x, t, ctx, dens, y, ac, ref


def test_dit_forward_shapes_and_ref_strip():
    rs = np.random.RandomState(3)
    params = init_dit_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    x, t, ctx, dens, y, ac, ref = _make_inputs(rs, CFG)
    tables = jnp.asarray(make_rope_tables_for(CFG))
    out = dit_forward(params, CFG, x, t, ctx, density=dens, y=y,
                      additional_control=ac, full_ref=ref, rope_tables=tables)
    assert out.shape == x.shape  # out_dim == latent channels
    # without ref the result differs but shape holds
    out2 = dit_forward(params, CFG, x, t, ctx, density=dens, y=y,
                       additional_control=ac, full_ref=None, rope_tables=tables)
    assert out2.shape == x.shape
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_per_token_t_equals_scalar_t_when_uniform():
    """A constant per-token timestep must reproduce the scalar-t path
    (the TI2V spatial-mask timestep degenerates to scalar when mask==1)."""
    rs = np.random.RandomState(4)
    params = init_dit_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    x, t, ctx, dens, y, ac, ref = _make_inputs(rs, CFG, per_token_t=False)
    tables = jnp.asarray(make_rope_tables_for(CFG))
    out_scalar = dit_forward(params, CFG, x, t, ctx, density=dens, y=y,
                             additional_control=ac, full_ref=ref,
                             rope_tables=tables)
    f, hh, ww = 3, 2, 2
    l_vid = f * hh * ww
    t_tok = jnp.broadcast_to(t[:, None], (t.shape[0], l_vid))
    out_tok = dit_forward(params, CFG, x, t_tok, ctx, density=dens, y=y,
                          additional_control=ac, full_ref=ref,
                          rope_tables=tables)
    np.testing.assert_allclose(np.asarray(out_tok), np.asarray(out_scalar),
                               rtol=2e-4, atol=2e-4)


def test_dit_forward_jits_and_is_deterministic():
    rs = np.random.RandomState(5)
    params = init_dit_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    x, t, ctx, dens, y, ac, ref = _make_inputs(rs, CFG)
    tables = jnp.asarray(make_rope_tables_for(CFG))
    fn = jax.jit(lambda p, *a: dit_forward(p, CFG, *a, rope_tables=tables))
    o1 = fn(params, x, t, ctx, dens, y, ac, ref)
    o2 = fn(params, x, t, ctx, dens, y, ac, ref)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_camera_adapter_and_fp8_and_lora():
    """Aux inference features: camera adapter path, fp8 weight storage,
    LoRA merge/unmerge round trip."""
    import numpy as np
    from flexam_tpu.config import DiTConfig
    from flexam_tpu.models.dit import dit_forward, init_dit_params
    from flexam_tpu.utils.fp8 import cast_weights, convert_weights_to_fp8
    from flexam_tpu.utils.lora import merge_lora, unmerge_lora

    cfg = DiTConfig(dim=32, ffn_dim=64, num_heads=2, num_layers=2,
                    in_dim=4, out_dim=4, add_ref_conv=False,
                    add_cnn_block=False, add_control_adapter=True,
                    in_dim_control_adapter=8,
                    downscale_factor_control_adapter=2,
                    text_dim=16, freq_dim=8, text_len=4, rope_max_seq=16)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 2, 4, 4), jnp.float32)
    t = jnp.array([500.0], jnp.float32)
    ctx = jnp.zeros((1, 4, 16), jnp.float32)
    cam = jnp.ones((1, 8, 2, 8, 8), jnp.float32)   # pixel res = 2x2x latent
    out_nocam = dit_forward(params, cfg, x, t, ctx)
    out_cam = dit_forward(params, cfg, x, t, ctx, y_camera=cam)
    assert out_cam.shape == out_nocam.shape
    assert not np.allclose(np.asarray(out_cam), np.asarray(out_nocam))

    # fp8 storage round-trip: quantize, cast back, forward still works.
    # convert_weights_to_fp8 mutates IN PLACE (frees each source leaf as
    # it converts — a 5B tree would otherwise OOM the chip), so hand it a
    # structural copy: the LoRA section below still needs the fp32 tree.
    p8 = convert_weights_to_fp8(jax.tree_util.tree_map(lambda a: a, params))
    assert p8["blocks"]["ffn"]["fc1"]["weight"].dtype == jnp.float8_e4m3fn
    assert p8["blocks"]["modulation"].dtype == jnp.float32  # excluded
    out8 = dit_forward(cast_weights(p8, jnp.float32), cfg, x, t, ctx)
    assert np.isfinite(np.asarray(out8)).all()

    # LoRA merge/unmerge round trip
    rng = np.random.RandomState(0)
    lora = {
        "lora_unet_blocks_1_self_attn_q.lora_down.weight":
            rng.randn(2, 32).astype(np.float32),
        "lora_unet_blocks_1_self_attn_q.lora_up.weight":
            rng.randn(32, 2).astype(np.float32),
        "lora_unet_blocks_1_self_attn_q.alpha": np.float32(2.0),
        "blocks.0.ffn.0.lora_A.weight": rng.randn(2, 32).astype(np.float32),
        "blocks.0.ffn.0.lora_B.weight": rng.randn(64, 2).astype(np.float32),
    }
    merged = merge_lora(params, lora, multiplier=0.7)
    assert not np.allclose(
        np.asarray(merged["blocks"]["self_attn"]["q"]["weight"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["weight"]))
    restored = unmerge_lora(merged, lora, multiplier=0.7)
    np.testing.assert_allclose(
        np.asarray(restored["blocks"]["self_attn"]["q"]["weight"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["weight"]),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored["blocks"]["ffn"]["fc1"]["weight"]),
        np.asarray(params["blocks"]["ffn"]["fc1"]["weight"]),
        rtol=1e-5, atol=1e-6)
