"""Native ZoeDepth port (perception/zoedepth.py) — VERDICT r2 item 7.

Oracle tier: the ZoeDepth HEAD layers (attractor / localbins /
dist_layers) are pure-torch vendored files with no timm dependency, so
they ARE oracle-tested here against `/root/reference/comfyui/annotator/
zoe/zoedepth/models/layers/*` with mapped weights. The BEiT backbone
builds through `timm.create_model` (timm absent in this environment), so
backbone parity is structural: shapes, tap points, the exact-name loader
round-trip, and infer() surface."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from flexam_tpu.perception.zoedepth import (ZoeDepth, ZoeDepthConfig,
                                            _mlp2conv, _softplus,
                                            resize_ac, tiny_zoe_config,
                                            zoedepth_forward,
                                            zoedepth_init,
                                            zoedepth_params_from_state_dict)

_ZOE = "/root/reference/comfyui/annotator/zoe/zoedepth/models/layers"


def _load(relname):
    name = f"zoe_oracle_{relname}"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f"{_ZOE}/{relname}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _conv_params(seq, i):
    c = seq[i]
    return {"weight": jnp.asarray(c.weight.detach().numpy()),
            "bias": jnp.asarray(c.bias.detach().numpy())}


def test_attractor_unnormed_oracle():
    """AttractorLayerUnnormed(inv, mean, alpha=1000) — the shipped
    config's attractor — bit-matched per stage."""
    att = _load("attractor")
    torch.manual_seed(0)
    layer = att.AttractorLayerUnnormed(
        in_features=16, n_bins=8, n_attractors=4, mlp_dim=12,
        alpha=1000, gamma=2, kind="mean", attractor_type="inv")
    x = torch.randn(1, 16, 6, 6)
    b_prev = torch.nn.functional.softplus(torch.randn(1, 8, 6, 6))
    prev_emb = torch.randn(1, 16, 6, 6)
    with torch.no_grad():
        b_new, b_centers = layer(x, b_prev, prev_emb, interpolate=True)

    p = {"conv1": _conv_params(layer._net, 0),
         "conv2": _conv_params(layer._net, 2)}
    a_in = jnp.asarray((x + prev_emb).numpy()).transpose(0, 2, 3, 1)
    A = _mlp2conv(p, a_in, final=_softplus)
    bp = jnp.asarray(b_prev.numpy()).transpose(0, 2, 3, 1)
    dx = A[..., :, None] - bp[..., None, :]
    # the vendored forward never passes self.alpha -> the jit-scripted
    # function default alpha=300 applies (see zoedepth.py QUIRK note)
    delta = dx / (1.0 + 300.0 * dx ** 2)
    got = bp + jnp.mean(delta, axis=-2)
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 3, 1, 2)), b_new.numpy(),
        rtol=2e-4, atol=2e-5)


def test_seed_bin_regressor_unnormed_oracle():
    lb = _load("localbins_layers")
    torch.manual_seed(1)
    layer = lb.SeedBinRegressorUnnormed(16, n_bins=8, mlp_dim=12)
    x = torch.randn(2, 16, 5, 7)
    with torch.no_grad():
        _, centers = layer(x)
    p = {"conv1": _conv_params(layer._net, 0),
         "conv2": _conv_params(layer._net, 2)}
    got = _mlp2conv(p, jnp.asarray(x.numpy()).transpose(0, 2, 3, 1),
                    final=_softplus)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 3, 1, 2)),
                               centers.numpy(), rtol=2e-4, atol=2e-5)


def test_conditional_log_binomial_oracle():
    """ConditionalLogBinomial (p/t linear-norm + log-binomial softmax)
    vs the fused math in zoedepth_forward."""
    dl = _load("dist_layers")
    torch.manual_seed(2)
    layer = dl.ConditionalLogBinomial(
        in_features=5, condition_dim=16, n_classes=8,
        min_temp=0.0212, max_temp=50.0)
    x = torch.rand(1, 5, 6, 6)
    cond = torch.randn(1, 16, 6, 6)
    with torch.no_grad():
        ref = layer(x, cond)

    p = {"conv1": _conv_params(layer.mlp, 0),
         "conv2": _conv_params(layer.mlp, 2)}
    from flexam_tpu.perception.zoedepth import _gelu, _log_binom
    inp = jnp.asarray(torch.cat([x, cond], 1).numpy()).transpose(0, 2, 3, 1)
    pt = _mlp2conv(p, inp, act=_gelu, final=_softplus)
    p2, t2 = pt[..., :2] + 1e-4, pt[..., 2:] + 1e-4
    prob = p2[..., 0] / (p2[..., 0] + p2[..., 1])
    temp = t2[..., 0] / (t2[..., 0] + t2[..., 1])
    temp = (50.0 - 0.0212) * temp + 0.0212
    kk = jnp.arange(8, dtype=jnp.float32)
    prob = jnp.clip(prob, 1e-4, 1.0)[..., None]
    one_m = jnp.clip(1.0 - prob, 1e-4, 1.0)
    y = (_log_binom(jnp.asarray(7.0), kk) + kk * jnp.log(prob)
         + (7.0 - kk) * jnp.log(one_m))
    got = jax.nn.softmax(y / temp[..., None], axis=-1)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 3, 1, 2)),
                               ref.numpy(), rtol=2e-4, atol=1e-5)


def test_resize_ac_matches_torch_align_corners():
    torch.manual_seed(3)
    x = torch.randn(1, 3, 5, 7)
    ref = torch.nn.functional.interpolate(
        x, size=(9, 13), mode="bilinear", align_corners=True)
    got = resize_ac(jnp.asarray(x.numpy()).transpose(0, 2, 3, 1), (9, 13))
    np.testing.assert_allclose(np.asarray(got.transpose(0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_zoe_config()
    params = zoedepth_init(jax.random.key(0), cfg)
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    out = zoedepth_forward(params, cfg, x)
    # rel depth at input res (head upsamples 2x from half res)
    assert out["rel_depth"].shape == (1, 64, 64)
    assert out["metric_depth"].shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out["metric_depth"])).all()
    assert (np.asarray(out["metric_depth"]) >= 0).all()
    probs_sum_check = np.asarray(out["bin_centers"])
    assert probs_sum_check.shape[-1] == cfg.n_bins


def test_loader_exact_names(tiny):
    """Round-trip: a synthetic state dict with the EXACT ZoeD_M12_N key
    layout loads into the native tree; a missing key raises."""
    cfg, params = tiny

    sd = {}

    def put_lin(prefix, dout, din, bias=True):
        sd[prefix + ".weight"] = torch.randn(dout, din)
        if bias:
            sd[prefix + ".bias"] = torch.randn(dout)

    def put_conv(prefix, o, i, k, bias=True):
        sd[prefix + ".weight"] = torch.randn(o, i, k, k)
        if bias:
            sd[prefix + ".bias"] = torch.randn(o)

    d = cfg.embed_dim
    mp = "core.core.pretrained.model."
    sd[mp + "cls_token"] = torch.randn(1, 1, d)
    put_conv(mp + "patch_embed.proj", d, 3, cfg.patch_size)
    wh, ww = cfg.train_window
    nrel = (2 * wh - 1) * (2 * ww - 1) + 3
    for i in range(cfg.depth):
        bp = f"{mp}blocks.{i}."
        put_lin(bp + "norm1", d, 1)
        sd[bp + "norm1.weight"] = torch.randn(d)
        sd[bp + "norm1.bias"] = torch.randn(d)
        sd[bp + "attn.qkv.weight"] = torch.randn(3 * d, d)
        sd[bp + "attn.q_bias"] = torch.randn(d)
        sd[bp + "attn.v_bias"] = torch.randn(d)
        sd[bp + "attn.relative_position_bias_table"] = torch.randn(
            nrel, cfg.num_heads)
        put_lin(bp + "attn.proj", d, d)
        sd[bp + "gamma_1"] = torch.randn(d)
        sd[bp + "norm2.weight"] = torch.randn(d)
        sd[bp + "norm2.bias"] = torch.randn(d)
        put_lin(bp + "mlp.fc1", int(d * cfg.mlp_ratio), d)
        put_lin(bp + "mlp.fc2", d, int(d * cfg.mlp_ratio))
        sd[bp + "gamma_2"] = torch.randn(d)
    pp = "core.core.pretrained."
    for j, hf in enumerate(cfg.hook_features):
        put_lin(f"{pp}act_postprocess{j + 1}.0.project.0", d, 2 * d)
        put_conv(f"{pp}act_postprocess{j + 1}.3", hf, d, 1)
        if j == 0:
            sd[f"{pp}act_postprocess1.4.weight"] = torch.randn(hf, hf, 4, 4)
            sd[f"{pp}act_postprocess1.4.bias"] = torch.randn(hf)
        elif j == 1:
            sd[f"{pp}act_postprocess2.4.weight"] = torch.randn(hf, hf, 2, 2)
            sd[f"{pp}act_postprocess2.4.bias"] = torch.randn(hf)
        elif j == 3:
            put_conv(f"{pp}act_postprocess4.4", hf, hf, 3)
    sp = "core.core.scratch."
    for j, hf in enumerate(cfg.hook_features):
        sd[f"{sp}layer{j + 1}_rn.weight"] = torch.randn(
            cfg.features, hf, 3, 3)
    for j in range(4):
        rp = f"{sp}refinenet{j + 1}."
        put_conv(rp + "out_conv", cfg.features, cfg.features, 1)
        for u in ("resConfUnit1", "resConfUnit2"):
            put_conv(f"{rp}{u}.conv1", cfg.features, cfg.features, 3)
            put_conv(f"{rp}{u}.conv2", cfg.features, cfg.features, 3)
    put_conv(sp + "output_conv.0", cfg.features // 2, cfg.features, 3)
    put_conv(sp + "output_conv.2", cfg.head_features_2,
             cfg.features // 2, 3)
    put_conv(sp + "output_conv.4", 1, cfg.head_features_2, 1)
    put_conv("conv2", cfg.features, cfg.features, 1)
    put_conv("seed_bin_regressor._net.0", 256, cfg.features, 1)
    put_conv("seed_bin_regressor._net.2", cfg.n_bins, 256, 1)
    put_conv("seed_projector._net.0", 128, cfg.features, 1)
    put_conv("seed_projector._net.2", cfg.bin_embedding_dim, 128, 1)
    for i in range(4):
        put_conv(f"projectors.{i}._net.0", 128, cfg.features, 1)
        put_conv(f"projectors.{i}._net.2", cfg.bin_embedding_dim, 128, 1)
        put_conv(f"attractors.{i}._net.0", 128, cfg.bin_embedding_dim, 1)
        put_conv(f"attractors.{i}._net.2", cfg.n_attractors[i], 128, 1)
    last_in = cfg.head_features_2 + 1
    bott = (last_in + cfg.bin_embedding_dim) // 2
    put_conv("conditional_log_binomial.mlp.0", bott,
             last_in + cfg.bin_embedding_dim, 1)
    put_conv("conditional_log_binomial.mlp.2", 4, bott, 1)

    npsd = {k: v.numpy() for k, v in sd.items()}
    loaded = zoedepth_params_from_state_dict(npsd, cfg)
    # loaded tree runs
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    out = zoedepth_forward(loaded, cfg, x)
    assert np.isfinite(np.asarray(out["metric_depth"])).all()

    bad = dict(npsd)
    del bad["conv2.weight"]
    with pytest.raises(KeyError):
        zoedepth_params_from_state_dict(bad, cfg)


def test_infer_surface(tiny):
    cfg, params = tiny
    m = ZoeDepth(cfg)
    m.params = params
    x = np.random.rand(1, 3, 70, 90).astype(np.float32)
    d = m.infer(x, pad_input=True, with_flip_aug=True)
    assert d.shape == (1, 1, 70, 90)
    assert np.isfinite(d).all()


def test_depth_backend_registered():
    from flexam_tpu.perception.depth import DEPTH_BACKENDS
    assert "zoe" in DEPTH_BACKENDS


def test_conv_t_matches_torch_convtranspose():
    """_conv_t == torch ConvTranspose2d for the DPT kernel==stride case
    (regression: jax conv_transpose flips the kernel relative to torch;
    caught by the transformers DepthAnything oracle)."""
    import torch

    from flexam_tpu.perception.zoedepth import _conv_t
    rng = np.random.RandomState(0)
    for k in (2, 4):
        w = rng.randn(5, 7, k, k).astype(np.float32)
        b = rng.randn(7).astype(np.float32)
        x = rng.randn(2, 5, 6, 4).astype(np.float32)   # NCHW
        m = torch.nn.ConvTranspose2d(5, 7, k, stride=k)
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(w))
            m.bias.copy_(torch.from_numpy(b))
            ref = m(torch.from_numpy(x)).numpy()
        got = np.asarray(_conv_t(
            jnp.asarray(x.transpose(0, 2, 3, 1)),   # -> NHWC
            {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, k)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
