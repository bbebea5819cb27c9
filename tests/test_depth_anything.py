"""Depth-Anything-V2 native port (perception/depth_anything.py): forward
shape/finiteness at a tiny geometry, the name-mapped loader's full key
coverage (torch-layout round-trip), and registry wiring. The real model
is external weights (`pipelines.py:158-161` loads the HF release), so —
as for DELTA/MoGe — parity evidence is structural + loader-exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.perception.depth_anything import (DAv2Config, dav2_forward,
                                                  dav2_infer_video,
                                                  dav2_init, load_dav2,
                                                  tiny_dav2_config)

CFG = tiny_dav2_config()


@pytest.fixture(scope="module")
def params():
    return dav2_init(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 42, 3),
                          jnp.float32)
    d = dav2_forward(params, x, CFG)
    assert d.shape == (2, 56, 42)
    d = np.asarray(d)
    assert np.isfinite(d).all() and (d >= 0).all()     # relu'd disparity
    # batch independence
    d1 = np.asarray(dav2_forward(params, x[:1], CFG))
    np.testing.assert_allclose(d[:1], d1, rtol=2e-5, atol=2e-5)


def test_infer_video_driver(params):
    video = np.random.RandomState(0).rand(3, 64, 56, 3).astype(np.float32)
    d = dav2_infer_video(params, video, CFG, batch=2)
    assert d.shape == (3, 64, 56) and np.isfinite(d).all()


def _torch_sd_from(params):
    """Build a fake original-release state dict covering EVERY mapped
    name, with fresh random values in torch layouts."""
    import torch
    rng = np.random.RandomState(7)
    sd = {}

    def put(name, shape):
        sd[name] = torch.from_numpy(
            rng.randn(*shape).astype(np.float32))

    enc = params["encoder"]
    kh, kw, ci, co = enc["patch_embed"]["proj"]["weight"].shape
    put("pretrained.patch_embed.proj.weight", (co, ci, kh, kw))
    put("pretrained.patch_embed.proj.bias", (co,))
    put("pretrained.cls_token", tuple(enc["cls_token"].shape))
    put("pretrained.pos_embed", tuple(enc["pos_embed"].shape))
    put("pretrained.norm.weight", tuple(enc["norm"]["weight"].shape))
    put("pretrained.norm.bias", tuple(enc["norm"]["bias"].shape))
    for i, bp in enumerate(enc["blocks"]):
        pre = f"pretrained.blocks.{i}."
        for ln in ("norm1", "norm2"):
            put(pre + f"{ln}.weight", tuple(bp[ln]["weight"].shape))
            put(pre + f"{ln}.bias", tuple(bp[ln]["bias"].shape))
        for lin, tname in (("qkv", "attn.qkv"), ("proj", "attn.proj")):
            put(pre + tname + ".weight",
                tuple(bp["attn"][lin]["weight"].shape))
            put(pre + tname + ".bias", tuple(bp["attn"][lin]["bias"].shape))
        for lin in ("fc1", "fc2"):
            put(pre + f"mlp.{lin}.weight",
                tuple(bp["mlp"][lin]["weight"].shape))
            put(pre + f"mlp.{lin}.bias", tuple(bp["mlp"][lin]["bias"].shape))
        put(pre + "ls1.gamma", tuple(bp["ls1"]["gamma"].shape))
        put(pre + "ls2.gamma", tuple(bp["ls2"]["gamma"].shape))
    head = params["head"]
    for i in range(4):
        put(f"depth_head.projects.{i}.weight",
            tuple(head["projects"][i]["weight"].shape))
        put(f"depth_head.projects.{i}.bias",
            tuple(head["projects"][i]["bias"].shape))
        put(f"depth_head.scratch.layer{i + 1}_rn.weight",
            tuple(head["layer_rn"][i]["weight"].shape))
    for nm, pkey in (("0", "resize0"), ("1", "resize1"), ("3", "resize3")):
        put(f"depth_head.resize_layers.{nm}.weight",
            tuple(head[pkey]["weight"].shape))
        put(f"depth_head.resize_layers.{nm}.bias",
            tuple(head[pkey]["bias"].shape))
    for i in range(4):
        pre = f"depth_head.scratch.refinenet{i + 1}."
        blk = head["refinenet"][i]
        put(pre + "out_conv.weight", tuple(blk["out_conv"]["weight"].shape))
        put(pre + "out_conv.bias", tuple(blk["out_conv"]["bias"].shape))
        for j, rcu in ((1, "rcu1"), (2, "rcu2")):
            for cv in ("conv1", "conv2"):
                put(pre + f"resConfUnit{j}.{cv}.weight",
                    tuple(blk[rcu][cv]["weight"].shape))
                put(pre + f"resConfUnit{j}.{cv}.bias",
                    tuple(blk[rcu][cv]["bias"].shape))
    put("depth_head.scratch.output_conv1.weight",
        tuple(head["out_conv1"]["weight"].shape))
    put("depth_head.scratch.output_conv1.bias",
        tuple(head["out_conv1"]["bias"].shape))
    put("depth_head.scratch.output_conv2.0.weight",
        tuple(head["out_conv2a"]["weight"].shape))
    put("depth_head.scratch.output_conv2.0.bias",
        tuple(head["out_conv2a"]["bias"].shape))
    put("depth_head.scratch.output_conv2.2.weight",
        tuple(head["out_conv2b"]["weight"].shape))
    put("depth_head.scratch.output_conv2.2.bias",
        tuple(head["out_conv2b"]["bias"].shape))
    return sd


def test_loader_full_coverage(params, tmp_path):
    """Every original-release key maps (no unused, no missing) and the
    loaded values land where the names say (spot-checked), including the
    HWIO patch-embed transpose."""
    import torch
    sd = _torch_sd_from(params)
    path = str(tmp_path / "depth_anything_v2_tiny.pth")
    torch.save(sd, path)
    loaded, cfg = load_dav2(path, CFG, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder"]["blocks"][1]["attn"]["qkv"]["weight"]),
        sd["pretrained.blocks.1.attn.qkv.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder"]["patch_embed"]["proj"]["weight"]),
        sd["pretrained.patch_embed.proj.weight"].numpy()
        .transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(loaded["head"]["refinenet"][2]["rcu1"]["conv2"]["bias"]),
        sd["depth_head.scratch.refinenet3.resConfUnit1.conv2.bias"].numpy())
    d = dav2_forward(loaded, jnp.ones((1, 56, 42, 3)), cfg)
    assert np.isfinite(np.asarray(d)).all()


def test_registry_backend_registered():
    from flexam_tpu.perception.depth import DEPTH_BACKENDS
    assert "dav2" in DEPTH_BACKENDS and "dav" in DEPTH_BACKENDS


def test_dav2_learns_depth_cue():
    """Trainability (the no-oracle evidence tier used for DELTA/MoGe):
    a tiny DAv2 fits a synthetic depth cue (vertical position) in a few
    adam steps — gradients flow end-to-end through encoder + DPT head."""
    import optax

    cfg = tiny_dav2_config()
    params = dav2_init(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 56, 42, 3).astype(np.float32))
    target = jnp.broadcast_to(
        jnp.linspace(0.2, 2.0, 56)[None, :, None], (4, 56, 42))

    def loss_fn(p):
        d = dav2_forward(p, x, cfg)
        return jnp.mean((d - target) ** 2)

    opt = optax.adam(3e-3)
    state = opt.init(params)
    loss0 = float(loss_fn(params))
    step = jax.jit(lambda p, s: (lambda g: opt.update(g, s, p))(
        jax.grad(loss_fn)(p)))
    for _ in range(30):
        upd, state = step(params, state)
        params = optax.apply_updates(params, upd)
    loss1 = float(loss_fn(params))
    assert np.isfinite(loss1) and loss1 < 0.5 * loss0, (loss0, loss1)
