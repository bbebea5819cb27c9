"""DAv2 ORACLE parity: perception/depth_anything.py vs the transformers
`DepthAnythingForDepthEstimation` implementation (the trusted modeling
code behind the `depth-anything/Depth-Anything-V2-Large-hf` checkpoint
the reference loads at `pipelines.py:158-161`), at a tiny random-init
geometry with exactly mapped weights.

Input is 518x518 so both implementations use the pretrain pos-embed grid
verbatim (bicubic antialias conventions differ between torch and jax at
other grids; the checkpoint-scale behavior IS the 37x37 grid)."""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

from flexam_tpu.perception.depth_anything import (DAv2Config, dav2_forward,
                                                  dav2_init)

import jax
import jax.numpy as jnp

D, LAYERS, HEADS, F = 32, 4, 2, 16
OUT_CH = (8, 16, 32, 32)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation, Dinov2Config)
    backbone = Dinov2Config(
        hidden_size=D, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        mlp_ratio=4, patch_size=14, image_size=518, layerscale_value=1.0,
        out_indices=[1, 2, 3, 4], apply_layernorm=True,
        reshape_hidden_states=False)
    cfg = DepthAnythingConfig(
        backbone_config=backbone, reassemble_hidden_size=D,
        fusion_hidden_size=F,
        neck_hidden_sizes=list(OUT_CH), reassemble_factors=[4, 2, 1, 0.5],
        patch_size=14, initializer_range=0.1, head_hidden_size=32,
        head_in_index=-1, depth_estimation_type="relative")
    model = DepthAnythingForDepthEstimation(cfg).eval()
    return model


def _map_to_jax(model):
    """HF state dict -> this repo's pytree (tiny geometry)."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = DAv2Config(embed_dim=D, depth=LAYERS, num_heads=HEADS,
                     output_idx=(1, 2, 3, 4), features=F,
                     out_channels=OUT_CH, input_size=518)
    params = dav2_init(jax.random.PRNGKey(0), cfg)
    J = jnp.asarray
    enc = params["encoder"]
    pre = "backbone.embeddings."
    enc["cls_token"] = J(sd[pre + "cls_token"])
    enc["pos_embed"] = J(sd[pre + "position_embeddings"])
    enc["patch_embed"]["proj"]["weight"] = J(
        sd[pre + "patch_embeddings.projection.weight"].transpose(2, 3, 1, 0))
    enc["patch_embed"]["proj"]["bias"] = J(
        sd[pre + "patch_embeddings.projection.bias"])
    for i in range(LAYERS):
        b = f"backbone.encoder.layer.{i}."
        bp = enc["blocks"][i]
        bp["norm1"]["weight"] = J(sd[b + "norm1.weight"])
        bp["norm1"]["bias"] = J(sd[b + "norm1.bias"])
        bp["norm2"]["weight"] = J(sd[b + "norm2.weight"])
        bp["norm2"]["bias"] = J(sd[b + "norm2.bias"])
        q = sd[b + "attention.attention.query.weight"]
        k = sd[b + "attention.attention.key.weight"]
        v = sd[b + "attention.attention.value.weight"]
        bp["attn"]["qkv"]["weight"] = J(np.concatenate([q, k, v], 0))
        bp["attn"]["qkv"]["bias"] = J(np.concatenate(
            [sd[b + "attention.attention.query.bias"],
             sd[b + "attention.attention.key.bias"],
             sd[b + "attention.attention.value.bias"]], 0))
        bp["attn"]["proj"]["weight"] = J(sd[b + "attention.output.dense.weight"])
        bp["attn"]["proj"]["bias"] = J(sd[b + "attention.output.dense.bias"])
        bp["ls1"]["gamma"] = J(sd[b + "layer_scale1.lambda1"])
        bp["ls2"]["gamma"] = J(sd[b + "layer_scale2.lambda1"])
        bp["mlp"]["fc1"]["weight"] = J(sd[b + "mlp.fc1.weight"])
        bp["mlp"]["fc1"]["bias"] = J(sd[b + "mlp.fc1.bias"])
        bp["mlp"]["fc2"]["weight"] = J(sd[b + "mlp.fc2.weight"])
        bp["mlp"]["fc2"]["bias"] = J(sd[b + "mlp.fc2.bias"])
    enc["norm"]["weight"] = J(sd["backbone.layernorm.weight"])
    enc["norm"]["bias"] = J(sd["backbone.layernorm.bias"])

    head = params["head"]
    for i in range(4):
        r = f"neck.reassemble_stage.layers.{i}."
        head["projects"][i]["weight"] = J(sd[r + "projection.weight"])
        head["projects"][i]["bias"] = J(sd[r + "projection.bias"])
        if i in (0, 1):
            key = "resize0" if i == 0 else "resize1"
            head[key]["weight"] = J(sd[r + "resize.weight"])   # convT [I,O,k,k]
            head[key]["bias"] = J(sd[r + "resize.bias"])
        elif i == 3:
            head["resize3"]["weight"] = J(sd[r + "resize.weight"])
            head["resize3"]["bias"] = J(sd[r + "resize.bias"])
        head["layer_rn"][i]["weight"] = J(sd[f"neck.convs.{i}.weight"])
    for i in range(4):
        f = f"neck.fusion_stage.layers.{i}."
        # HF fusion layer order: layers[0] consumes the DEEPEST feature
        # (this repo's refinenet index 3-i)
        blk = head["refinenet"][3 - i]
        blk["out_conv"]["weight"] = J(sd[f + "projection.weight"])
        blk["out_conv"]["bias"] = J(sd[f + "projection.bias"])
        for rcu, hf in (("rcu1", "residual_layer1"), ("rcu2", "residual_layer2")):
            blk[rcu]["conv1"]["weight"] = J(sd[f + hf + ".convolution1.weight"])
            blk[rcu]["conv1"]["bias"] = J(sd[f + hf + ".convolution1.bias"])
            blk[rcu]["conv2"]["weight"] = J(sd[f + hf + ".convolution2.weight"])
            blk[rcu]["conv2"]["bias"] = J(sd[f + hf + ".convolution2.bias"])
    head["out_conv1"]["weight"] = J(sd["head.conv1.weight"])
    head["out_conv1"]["bias"] = J(sd["head.conv1.bias"])
    head["out_conv2a"]["weight"] = J(sd["head.conv2.weight"])
    head["out_conv2a"]["bias"] = J(sd["head.conv2.bias"])
    head["out_conv2b"]["weight"] = J(sd["head.conv3.weight"])
    head["out_conv2b"]["bias"] = J(sd["head.conv3.bias"])
    return params, cfg


def test_dav2_matches_transformers(hf_model):
    params, cfg = _map_to_jax(hf_model)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 518, 518).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf_model(pixel_values=torch.from_numpy(x)
                       ).predicted_depth.numpy()
    ours = np.asarray(dav2_forward(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale,
                               rtol=2e-4, atol=2e-4)
