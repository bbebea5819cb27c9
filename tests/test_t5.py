"""Parity: flexam_tpu umT5 encoder vs the actual reference
`wan_text_encoder.py` module (dropout off, fp32)."""

import numpy as np
import pytest
import torch

from flexam_tpu.config import T5Config
from flexam_tpu.models.t5 import (relative_position_buckets, t5_encode,
                                  t5_params_from_state_dict)
from tests.reference_oracle import load_reference_module

TINY = T5Config(vocab=128, dim=64, dim_attn=64, dim_ffn=96, num_heads=4,
                num_layers=3, num_buckets=32, shared_pos=False,
                text_length=16)


@pytest.fixture(scope="module")
def ref_t5():
    mod = load_reference_module(
        "FlexAM/models/wan_text_encoder.py", "ref_wan_text_encoder")
    torch.manual_seed(0)
    model = mod.WanT5EncoderModel(
        vocab=TINY.vocab, dim=TINY.dim, dim_attn=TINY.dim_attn,
        dim_ffn=TINY.dim_ffn, num_heads=TINY.num_heads,
        num_layers=TINY.num_layers, num_buckets=TINY.num_buckets,
        shared_pos=False, dropout=0.0).eval()
    return model


def test_bucket_table_matches_reference(ref_t5):
    ref_emb = ref_t5.blocks[0].pos_embedding
    rel_pos = (torch.arange(16).unsqueeze(0) - torch.arange(16).unsqueeze(1))
    ref_buckets = ref_emb._relative_position_bucket(rel_pos).numpy()
    ours = relative_position_buckets(16, 16, TINY.num_buckets)
    np.testing.assert_array_equal(ours, ref_buckets)


def test_encoder_parity(ref_t5):
    rng = np.random.RandomState(0)
    ids = rng.randint(0, TINY.vocab, size=(2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[0, 10:] = 0   # padded prompt
    with torch.no_grad():
        ref_out = ref_t5(torch.from_numpy(ids),
                         torch.from_numpy(mask))[0].numpy()

    sd = {k: v.numpy() for k, v in ref_t5.state_dict().items()}
    params = t5_params_from_state_dict(sd, TINY)
    out = np.asarray(t5_encode(params, TINY, ids.astype(np.int32),
                               mask.astype(np.int32)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=1e-4)
