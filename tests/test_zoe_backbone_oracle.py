"""ZoeDepth BEiT-backbone ORACLE: the zoe port's block stack vs the
transformers `BeitModel` implementation (weights-free, tiny config,
exactly mapped weights).

Round-2/3 notes said a backbone oracle was impossible because the
vendored copy builds through timm (absent here) — but transformers ships
the same published BEiT architecture (per-layer relative-position bias,
q/v-only biases, LayerScale), so it serves as the trusted reference the
same way the DepthAnything modeling code does for DAv2."""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax
import jax.numpy as jnp

from flexam_tpu.perception.zoedepth import (ZoeDepthConfig, _beit_block,
                                            _rel_pos_bias, tiny_zoe_config,
                                            zoedepth_init)

CFG = tiny_zoe_config()          # 4 blocks, d=32, heads=2, window 4x4
IMG = CFG.train_window[0] * CFG.patch_size          # 64 -> grid 4x4


@pytest.fixture(scope="module")
def hf_model():
    from transformers import BeitConfig, BeitModel
    cfg = BeitConfig(
        hidden_size=CFG.embed_dim, num_hidden_layers=CFG.depth,
        num_attention_heads=CFG.num_heads,
        intermediate_size=int(CFG.embed_dim * CFG.mlp_ratio),
        image_size=IMG, patch_size=CFG.patch_size,
        use_absolute_position_embeddings=False,
        use_relative_position_bias=True,
        use_shared_relative_position_bias=False,
        layer_scale_init_value=0.1, use_mask_token=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        initializer_range=0.2, add_pooling_layer=False)
    from transformers import BeitModel
    return BeitModel(cfg, add_pooling_layer=False).eval()


def _map_backbone(hf):
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = zoedepth_init(jax.random.PRNGKey(0), CFG)
    J = jnp.asarray
    params["cls_token"] = J(sd["embeddings.cls_token"])
    params["patch_embed"]["weight"] = J(
        sd["embeddings.patch_embeddings.projection.weight"])
    params["patch_embed"]["bias"] = J(
        sd["embeddings.patch_embeddings.projection.bias"])
    for i in range(CFG.depth):
        b = f"encoder.layer.{i}."
        bp = params["blocks"][i]
        bp["norm1"]["weight"] = J(sd[b + "layernorm_before.weight"])
        bp["norm1"]["bias"] = J(sd[b + "layernorm_before.bias"])
        q = sd[b + "attention.attention.query.weight"]
        k = sd[b + "attention.attention.key.weight"]
        v = sd[b + "attention.attention.value.weight"]
        bp["qkv"]["weight"] = J(np.concatenate([q, k, v], 0))
        bp["q_bias"] = J(sd[b + "attention.attention.query.bias"])
        bp["v_bias"] = J(sd[b + "attention.attention.value.bias"])
        bp["rel_pos_table"] = J(sd[
            b + "attention.attention.relative_position_bias."
                "relative_position_bias_table"])
        bp["proj"]["weight"] = J(sd[b + "attention.output.dense.weight"])
        bp["proj"]["bias"] = J(sd[b + "attention.output.dense.bias"])
        bp["gamma_1"] = J(sd[b + "lambda_1"])
        bp["gamma_2"] = J(sd[b + "lambda_2"])
        bp["norm2"]["weight"] = J(sd[b + "layernorm_after.weight"])
        bp["norm2"]["bias"] = J(sd[b + "layernorm_after.bias"])
        bp["fc1"]["weight"] = J(sd[b + "intermediate.dense.weight"])
        bp["fc1"]["bias"] = J(sd[b + "intermediate.dense.bias"])
        bp["fc2"]["weight"] = J(sd[b + "output.dense.weight"])
        bp["fc2"]["bias"] = J(sd[b + "output.dense.bias"])
    return params


def test_beit_backbone_matches_transformers(hf_model):
    params = _map_backbone(hf_model)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32) * 0.5
    with torch.no_grad():
        out = hf_model(pixel_values=torch.from_numpy(x),
                       output_hidden_states=True)
    hf_states = [h.numpy() for h in out.hidden_states]

    from flexam_tpu.perception.zoedepth import _conv
    xh = jnp.asarray(x.transpose(0, 2, 3, 1))
    h0 = w0 = IMG // CFG.patch_size
    tok = _conv(xh, params["patch_embed"], stride=CFG.patch_size,
                pad="VALID").reshape(2, h0 * w0, CFG.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(tok.dtype),
                           (2, 1, CFG.embed_dim))
    tok = jnp.concatenate([cls, tok], axis=1)
    np.testing.assert_allclose(np.asarray(tok), hf_states[0],
                               rtol=2e-4, atol=2e-5)
    for i, bp in enumerate(params["blocks"]):
        bias = _rel_pos_bias(bp["rel_pos_table"], CFG, (h0, w0))
        tok = _beit_block(bp, tok, bias, CFG.num_heads)
        scale = max(np.abs(hf_states[i + 1]).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(tok) / scale, hf_states[i + 1] / scale,
            rtol=2e-4, atol=2e-4, err_msg=f"block {i}")
