"""Oracle parity for FLUX's text encoders vs the transformers
implementations: T5-v1.1 (shared relative-position bias, gated GELU) and
the CLIP-L text tower with EOS pooling. These are the two conditioning
models `FluxControlPipeline` runs before the MMDiT
(reference: `pipelines.py:137-173`, consumed externally there)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flexam_tpu.config import T5Config
from flexam_tpu.models.t5 import t5_encode, t5_params_from_hf_state_dict
from flexam_tpu.models.clip_text import (
    CLIPTextConfig, clip_text_forward, clip_text_params_from_state_dict)


def test_t5_v11_shared_pos_matches_transformers():
    hf_cfg = transformers.T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(vocab=96, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                   num_layers=3, num_buckets=8, max_distance=16,
                   shared_pos=True)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = t5_params_from_hf_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, (2, 11)).astype(np.int32)
    mask = np.ones((2, 11), np.int32)
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                    attention_mask=torch.from_numpy(mask.astype(np.int64))
                    ).last_hidden_state.numpy()
    out = np.asarray(t5_encode(params, cfg, jnp.asarray(ids),
                               jnp.asarray(mask)))
    # padded positions diverge (HF zeroes embeddings differently);
    # compare valid tokens
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out[1, :7], ref[1, :7], rtol=2e-4, atol=2e-4)


def test_clip_text_matches_transformers():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=10, eos_token_id=63,
        bos_token_id=62, pad_token_id=0, hidden_act="quick_gelu",
        attention_dropout=0.0)
    torch.manual_seed(1)
    model = transformers.CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig.tiny()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = clip_text_params_from_state_dict(sd, cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 62, (2, 10)).astype(np.int32)
    ids[0, 6] = 63   # eos mid-sequence
    ids[1, 9] = 63   # eos at the end

    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids.astype(np.int64)))
    hidden, pooled = clip_text_forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(hidden),
                               ref.last_hidden_state.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-4)
