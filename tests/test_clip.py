"""Parity: CLIP vision tower + XLM-Roberta vs the actual reference
modules at tiny geometry."""

import numpy as np
import pytest
import torch

from flexam_tpu.models.clip import (CLIPVisionConfig, XLMRobertaConfig,
                                    init_xlm_roberta_params,
                                    vit_forward, vit_params_from_state_dict,
                                    xlm_roberta_forward)
from tests.reference_oracle import load_reference_dit, load_reference_module, _load_as_submodule

TINY_VIT = CLIPVisionConfig(image_size=28, patch_size=14, dim=32,
                            mlp_ratio=2, num_heads=4, num_layers=3,
                            activation="gelu")


@pytest.fixture(scope="module")
def ref_modules():
    load_reference_dit()   # installs FlexAM.models package machinery
    xlm = _load_as_submodule("FlexAM/models/wan_xlm_roberta.py",
                             "FlexAM.models.wan_xlm_roberta")
    img = _load_as_submodule("FlexAM/models/wan_image_encoder.py",
                             "FlexAM.models.wan_image_encoder")
    return img, xlm


def test_vit_parity(ref_modules):
    img_mod, _ = ref_modules
    torch.manual_seed(0)
    ref = img_mod.VisionTransformer(
        image_size=TINY_VIT.image_size, patch_size=TINY_VIT.patch_size,
        dim=TINY_VIT.dim, mlp_ratio=TINY_VIT.mlp_ratio, out_dim=16,
        num_heads=TINY_VIT.num_heads, num_layers=TINY_VIT.num_layers,
        pool_type="token", pre_norm=True, activation="gelu").eval()
    x = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        ref_out = ref(x, use_31_block=True).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = vit_params_from_state_dict(sd, TINY_VIT)
    ours = np.asarray(vit_forward(params, TINY_VIT, x.numpy(),
                                  use_31_block=True))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=1e-4)


def test_xlm_roberta_parity(ref_modules):
    _, xlm_mod = ref_modules
    cfg = XLMRobertaConfig(vocab_size=64, max_seq_len=32, pad_id=1, dim=32,
                           num_heads=4, num_layers=2, post_norm=True)
    torch.manual_seed(0)
    ref = xlm_mod.XLMRoberta(
        vocab_size=cfg.vocab_size, max_seq_len=cfg.max_seq_len,
        type_size=1, pad_id=cfg.pad_id, dim=cfg.dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        post_norm=True, dropout=0.0).eval()
    ids = np.array([[5, 8, 9, 12, 1, 1, 1, 1],
                    [3, 4, 5, 6, 7, 8, 9, 10]], np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = {
        "token_embedding": sd["token_embedding.weight"],
        "type_embedding": sd["type_embedding.weight"],
        "pos_embedding": sd["pos_embedding.weight"],
        "norm_w": sd["norm.weight"], "norm_b": sd["norm.bias"],
    }
    blocks = []
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        blocks.append({
            "q": {"weight": sd[f"{p}.attn.q.weight"],
                  "bias": sd[f"{p}.attn.q.bias"]},
            "k": {"weight": sd[f"{p}.attn.k.weight"],
                  "bias": sd[f"{p}.attn.k.bias"]},
            "v": {"weight": sd[f"{p}.attn.v.weight"],
                  "bias": sd[f"{p}.attn.v.bias"]},
            "o": {"weight": sd[f"{p}.attn.o.weight"],
                  "bias": sd[f"{p}.attn.o.bias"]},
            "norm1_w": sd[f"{p}.norm1.weight"],
            "norm1_b": sd[f"{p}.norm1.bias"],
            "fc1": {"weight": sd[f"{p}.ffn.0.weight"],
                    "bias": sd[f"{p}.ffn.0.bias"]},
            "fc2": {"weight": sd[f"{p}.ffn.2.weight"],
                    "bias": sd[f"{p}.ffn.2.bias"]},
            "norm2_w": sd[f"{p}.norm2.weight"],
            "norm2_b": sd[f"{p}.norm2.bias"],
        })
    import jax
    params["blocks"] = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *blocks)
    ours = np.asarray(xlm_roberta_forward(params, cfg, ids.astype(np.int32)))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=1e-4)
