"""Full-forward parity: flexam_tpu DiT vs the ACTUAL reference
`Wan2_2Transformer3DModel_FlexAM` (loaded with its absent dist module
stubbed), with weights mapped through `dit_params_from_state_dict` — this
validates both the model math and the checkpoint key mapping end to end."""

import numpy as np
import pytest
import torch

from flexam_tpu.config import DiTConfig
from flexam_tpu.io.checkpoints import dit_params_from_state_dict
from flexam_tpu.models.dit import dit_forward
from tests.reference_oracle import load_reference_dit

CFG = DiTConfig(
    dim=64, ffn_dim=128, num_heads=4, num_layers=2,
    in_dim=20,            # x(8) + control(8) + mask(4) -> no, see y below
    out_dim=8,
    in_dim_ref_conv=8,
    in_dim_cnn_block=48,  # control 8 + depth 8 + 4x cos 32
    out_dim_cnn_block=8,
    cnn_block_dims=(16, 8),
    cnn_block_groups=(4, 2),
    text_dim=32, freq_dim=16, text_len=12, rope_max_seq=32,
)
# channel accounting (SURVEY.md §2.7): x(8) ++ [cnn_out(8) ++ mask(4) ++
# masked(8)] = 28 input channels
CFG = DiTConfig(**{**CFG.__dict__, "in_dim": 28})

B, C, F, H, W = 1, 8, 3, 4, 6
SEQ = F * (H // 2) * (W // 2)          # 3 * 2 * 3 = 18 video tokens


@pytest.fixture(scope="module")
def ref_model():
    mod = load_reference_dit()
    torch.manual_seed(0)
    model = mod.Wan2_2Transformer3DModel_FlexAM(
        model_type="t2v", patch_size=(1, 2, 2), text_len=CFG.text_len,
        in_dim=CFG.in_dim, dim=CFG.dim, ffn_dim=CFG.ffn_dim,
        freq_dim=CFG.freq_dim, text_dim=CFG.text_dim, out_dim=CFG.out_dim,
        num_heads=CFG.num_heads, num_layers=CFG.num_layers,
        add_ref_conv=True, in_dim_ref_conv=CFG.in_dim_ref_conv,
        add_cnn_block=True, in_dim_cnn_block=CFG.in_dim_cnn_block,
        out_dim_cnn_block=CFG.out_dim_cnn_block,
    ).eval().float()
    return model


@pytest.fixture(scope="module")
def mapped_params(ref_model):
    sd = {k: v.detach().float().numpy()
          for k, v in ref_model.state_dict().items()}
    return dit_params_from_state_dict(sd, CFG)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, C, F, H, W).astype(np.float32)
    y = rng.randn(B, C + 4 + C, F, H, W).astype(np.float32)
    additional = rng.randn(B, 5 * C, F, H, W).astype(np.float32)
    ref = rng.randn(B, C, H, W).astype(np.float32)
    ctx = rng.randn(B, CFG.text_len, CFG.text_dim).astype(np.float32) * 0.1
    density = np.array([0.1], np.float32)
    return x, y, additional, ref, ctx, density


def _run_ref(ref_model, x, y, additional, ref, ctx, density, t):
    with torch.no_grad():
        out = ref_model(
            x=torch.from_numpy(x),
            t=torch.from_numpy(t),
            context=[torch.from_numpy(c) for c in ctx],
            density=torch.from_numpy(density),
            seq_len=SEQ,
            y=torch.from_numpy(y),
            full_ref=torch.from_numpy(ref),
            additional_control=torch.from_numpy(additional),
        )
    return out.numpy()


def test_scalar_timestep_parity(ref_model, mapped_params):
    """The reference's hand-written tiny-config torch path vs ours."""
    x, y, additional, ref, ctx, density = _inputs(0)
    t = np.array([500.0], np.float32)
    ref_out = _run_ref(ref_model, x, y, additional, ref, ctx, density, t)
    ours = np.asarray(dit_forward(
        mapped_params, CFG, x, t, ctx, density=density, y=y,
        additional_control=additional, full_ref=ref))
    assert ours.shape == ref_out.shape == (B, CFG.out_dim, F, H, W)
    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=2e-4)


def test_per_token_timestep_parity(ref_model, mapped_params):
    """TI2V spatial-timestep masking path: per-token t with zeros on the
    'known' tokens (`pipeline...FlexAM.py:891-898`)."""
    x, y, additional, ref, ctx, density = _inputs(1)
    t = np.full((B, SEQ), 700.0, np.float32)
    t[:, : SEQ // 3] = 0.0
    ref_out = _run_ref(ref_model, x, y, additional, ref, ctx, density, t)
    ours = np.asarray(dit_forward(
        mapped_params, CFG, x, t, ctx, density=density, y=y,
        additional_control=additional, full_ref=ref))
    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=2e-4)


def test_binary_timestep_fast_path_parity(ref_model, mapped_params):
    """The binary-timestep fast path (time MLP on the (t, 0) pair + per-
    token select) must match the reference's full per-token computation."""
    x, y, additional, ref, ctx, density = _inputs(2)
    mask = np.ones((B, SEQ), np.float32)
    mask[:, : SEQ // 2] = 0.0
    t_full = np.full((B, SEQ), 432.0, np.float32) * mask
    ref_out = _run_ref(ref_model, x, y, additional, ref, ctx, density,
                       t_full)
    ours = np.asarray(dit_forward(
        mapped_params, CFG, x, np.array([432.0], np.float32), ctx,
        density=density, y=y, additional_control=additional, full_ref=ref,
        binary_t_mask=mask))
    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=2e-4)
