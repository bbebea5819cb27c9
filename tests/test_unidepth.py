"""UniDepth V2 port — parity vs the VENDORED reference torch modules.

Unlike DELTA (empty submodule), UniDepth's source ships inside the
reference (`comfyui/annotator/UniDepth/unidepth/`), so the port is
oracle-testable: build the actual torch DINOv2 backbone and UniDepthV2
Decoder at a tiny geometry, map their state_dicts through the exact
name-map loader, and compare forwards.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

UNIDEPTH_ROOT = "/root/reference/comfyui/annotator/UniDepth"

TINY = dict(
    patch_size=14, embed_dim=32, depth=4, num_heads=2, mlp_ratio=4.0,
    num_register_tokens=2, layer_scale_init=1.0, output_idx=(1, 2, 3, 4),
    pretrain_img_size=28, hidden_dim=16, dec_num_heads=2, expansion=2,
    dec_depths=(1, 1, 1), out_dim=4, kernel_size=3, layer_scale=1.0,
    pixels_min=28 * 28, pixels_max=56 * 56, ratio_bounds=(0.5, 2.0),
    compute="float32",   # tight oracle tolerances; production is bf16
)


@pytest.fixture(scope="module")
def vendored():
    """Import the vendored unidepth package with a timm stub."""
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if UNIDEPTH_ROOT not in sys.path:
        sys.path.insert(0, UNIDEPTH_ROOT)

    # the vendored tree ships no __init__.py (namespace packages): flatten
    # each package's submodule symbols onto the namespace module so
    # `from .metadinov2 import Attention`-style imports resolve
    import importlib

    def _flatten(pkg, submods):
        m = importlib.import_module(pkg)
        for sub in submods:
            s = importlib.import_module(f"{pkg}.{sub}")
            for n in dir(s):
                if not n.startswith("_"):
                    setattr(m, n, getattr(s, n))

    _flatten("unidepth.models.backbones.metadinov2",
             ["attention", "mlp", "block", "patch_embed", "swiglu_ffn",
              "layer_scale", "drop_path"])
    _flatten("unidepth.layers",
             ["activation", "layer_scale", "mlp", "attention",
              "positional_encoding", "convnext", "upsample", "drop_path"])
    from unidepth.models.backbones.dinov2 import DinoVisionTransformer
    from unidepth.models.unidepthv2.decoder import Decoder
    return DinoVisionTransformer, Decoder


@pytest.fixture(scope="module")
def cfg():
    from flexam_tpu.perception.unidepth import UniDepthV2Config
    return UniDepthV2Config(**TINY)


@pytest.fixture(scope="module")
def torch_encoder(vendored, cfg):
    DinoVisionTransformer, _ = vendored
    torch.manual_seed(0)
    enc = DinoVisionTransformer(
        img_size=cfg.pretrain_img_size, patch_size=cfg.patch_size,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, init_values=cfg.layer_scale_init,
        block_chunks=0, output_idx=list(cfg.output_idx),
        num_register_tokens=cfg.num_register_tokens, use_norm=False,
    )
    enc.eval()      # their train() override returns None — don't chain
    # non-degenerate weights (init leaves cls/pos near zero)
    with torch.no_grad():
        for p in enc.parameters():
            if p.std() < 1e-6:
                p.add_(torch.randn_like(p) * 0.02)
    return enc


def _torch_decoder_config(cfg):
    return {
        "model": {
            "expansion": cfg.expansion,
            "num_heads": cfg.dec_num_heads,
            "layer_scale": cfg.layer_scale,
            "pixel_encoder": {
                "embed_dims": [cfg.embed_dim] * cfg.output_idx[-1],
                "depths": list(cfg.output_idx),
            },
            "pixel_decoder": {
                "hidden_dim": cfg.hidden_dim,
                "dropout": 0.0,
                "depths": list(cfg.dec_depths),
                "out_dim": cfg.out_dim,
                "kernel_size": cfg.kernel_size,
            },
        },
    }


@pytest.fixture(scope="module")
def torch_decoder(vendored, cfg):
    _, Decoder = vendored
    torch.manual_seed(1)
    dec = Decoder(_torch_decoder_config(cfg)).eval()
    with torch.no_grad():   # decoder init is trunc_normal(0.02): keep, but
        for p in dec.parameters():      # make biases nonzero for coverage
            if p.std() < 1e-6 and p.ndim <= 1:
                p.add_(torch.randn_like(p) * 0.01)
    return dec


def _jax_params(cfg, torch_encoder, torch_decoder):
    from flexam_tpu.perception.unidepth import load_unidepth_state_dict
    sd = {}
    for k, v in torch_encoder.state_dict().items():
        sd[f"pixel_encoder.{k}"] = v.detach().numpy()
    for k, v in torch_decoder.state_dict().items():
        sd[f"pixel_decoder.{k}"] = v.detach().numpy()
    return load_unidepth_state_dict(sd, cfg)


def test_encoder_parity(cfg, torch_encoder, torch_decoder):
    """JAX DINOv2 == vendored DinoVisionTransformer (per-slice features
    and cls tokens), at the pretrain grid (no pos-embed interpolation)."""
    from flexam_tpu.perception.unidepth import encode_image
    params = _jax_params(cfg, torch_encoder, torch_decoder)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        feats_t, cls_t = torch_encoder(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats_j, cls_j = encode_image(params["pixel_encoder"], x, cfg)
    assert len(feats_j) == len(cfg.output_idx)
    for i, (fj, cj) in enumerate(zip(feats_j, cls_j)):
        ft = feats_t[cfg.output_idx[i] - 1].numpy()       # stacking "last"
        ct = cls_t[cfg.output_idx[i] - 1].numpy()
        np.testing.assert_allclose(np.asarray(fj), ft, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(cj), ct, rtol=2e-4, atol=2e-5)


def test_decoder_parity(cfg, torch_encoder, torch_decoder):
    """JAX decode() == vendored Decoder.forward on the same features:
    depth, confidence, rays, intrinsics."""
    from flexam_tpu.perception.unidepth import decode
    params = _jax_params(cfg, torch_encoder, torch_decoder)
    rng = np.random.RandomState(3)
    b, h, w = 2, 2, 3
    hh, ww = h * 14, w * 14
    feats = [rng.randn(b, h, w, cfg.embed_dim).astype(np.float32)
             for _ in range(4)]
    clss = [rng.randn(b, 1, cfg.embed_dim).astype(np.float32)
            for _ in range(4)]
    inputs = {
        "image": torch.zeros(b, 3, hh, ww),
        "features": [torch.from_numpy(f) for f in feats],
        "tokens": [torch.from_numpy(c) for c in clss],
    }
    with torch.no_grad():
        out_t = torch_decoder(inputs, [])
    out_j = decode(params["pixel_decoder"], feats, clss, (hh, ww), cfg)
    np.testing.assert_allclose(np.asarray(out_j["intrinsics"]),
                               out_t["intrinsics"].numpy(),
                               rtol=2e-4, atol=1e-4)
    rays_t = out_t["rays"].reshape(b, hh, ww, 3).numpy()
    np.testing.assert_allclose(np.asarray(out_j["rays"]), rays_t,
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["radius"]),
                               out_t["radius"][:, 0].numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["confidence"]),
                               out_t["confidence"][:, 0].numpy(),
                               rtol=1e-3, atol=1e-4)


def test_infer_call_surface(cfg, torch_encoder, torch_decoder):
    """model.infer(rgb*255) — the exact reference usage
    (`pipelines.py:1398-1405`): returns metric depth [B,1,H,W], intrinsics
    [B,3,3], points/rays/confidence; plus the 32-frame chunking wrapper."""
    from flexam_tpu.perception.unidepth import (UniDepthV2,
                                                predict_depth_video)
    params = _jax_params(cfg, torch_encoder, torch_decoder)
    model = UniDepthV2(cfg, params=params)
    rng = np.random.RandomState(4)
    rgb = rng.rand(3, 3, 30, 44).astype(np.float32) * 255
    out = model.infer(torch.from_numpy(rgb))      # accepts torch like ref
    assert out["depth"].shape == (3, 1, 30, 44)
    assert out["intrinsics"].shape == (3, 3, 3)
    assert out["points"].shape == (3, 3, 30, 44)
    assert (out["depth"] > 0).all() and np.isfinite(out["depth"]).all()
    video = rng.rand(5, 30, 44, 3).astype(np.float32)
    depth = predict_depth_video(model, video, chunk=2)
    assert depth.shape == (5, 30, 44) and (depth > 0).all()


def test_depth_registry_backend(cfg, torch_encoder, torch_decoder):
    from flexam_tpu.perception.depth import estimate_depth
    from flexam_tpu.perception.unidepth import UniDepthV2
    params = _jax_params(cfg, torch_encoder, torch_decoder)
    model = UniDepthV2(cfg, params=params)
    rng = np.random.RandomState(5)
    video = rng.rand(2, 28, 28, 3).astype(np.float32)
    d = estimate_depth(video, backend="unidepth", model=model)
    assert d.shape == (2, 28, 28) and (d > 0).all()
