"""Quality bounds for the approximation modes, measured on a TRAINED
checkpoint (VERDICT r3 item 4): the sparse-attention mask and the int8
quantized linears change the model OUTPUT, and until now their cost was
unmeasured — the kernels are parity-exact vs their own masked/quantized
semantics but nothing bounded the end-to-end effect on a model that
generates coherent video.

Method: the control-follow trained stack (shared disk cache with
tests/test_control_following.py) generates the same held-out cases
dense, sparse (windows 0/1/2 through `masked_dense_attention` — the
Pallas kernel's exact semantics, since its 128-lane tiling cannot fit the
tiny geometry), and int8-quantized; each variant is scored on (a)
pixel PSNR/SSIM vs the dense output (same seed/noise) and (b) the
adherence gate itself (centroid error vs conditioned track).

Measured (CPU, seeds pinned; BASELINE.md round 4 records the table):
sparse w=2 (flagship default) 63.2 dB / SSIM 1.000, w=1 40.9 dB / 0.997,
w=0 37.6 dB / 0.994; int8 64.2 dB / 1.000 — every variant holds the
adherence gate (3.8-4.1 px vs the 12 px bound). Recommended minimum
window 1, default stays 2.
"""

import numpy as np
import pytest

from flexam_tpu.ops.sparse_attention import make_sparse_attn_fn
from flexam_tpu.tools import control_follow as cf
from flexam_tpu.tools.compare_latents import psnr, ssim


@pytest.fixture(scope="module")
def stack():
    return cf.cached_stack(cf.default_cache_path(), cf.CACHE_VERSION)


def _latent_geometry(stack):
    """(num_frames, spatial_tokens, ref_tokens) of the trained stack's
    DiT token stream."""
    g = stack["geometry"]
    cfg = stack["cfg"]
    lt = 1 + (g["T"] - 1) // cfg.vae.temporal_compression_ratio
    lh = g["H"] // cfg.vae.spatial_compression_ratio
    lw = g["W"] // cfg.vae.spatial_compression_ratio
    pt, ph, pw = cfg.dit.patch_size
    spatial = (lh // ph) * (lw // pw)
    return lt // pt, spatial, spatial if cfg.dit.add_ref_conv else 0


def _run(stack, attn_fn=None, quant=None):
    return cf.evaluate_adherence(stack, cf.default_holdout_cases(),
                                 num_inference_steps=20,
                                 attn_fn=attn_fn, quant=quant)


@pytest.fixture(scope="module")
def dense(stack):
    return _run(stack)


@pytest.fixture(scope="module")
def sparse_by_window(stack):
    frames, spatial, ref = _latent_geometry(stack)
    out = {}
    for w in (0, 1, 2):
        fn = make_sparse_attn_fn(frames, spatial, ref_tokens=ref,
                                 window=w, group=1, masked_dense=True)
        out[w] = _run(stack, attn_fn=fn)
    return out


def _scores(variant, dense):
    """(worst-case PSNR dB, worst-case SSIM, worst centroid err px)
    across held-out cases, variant vs dense at the same seed."""
    ps, ss, ce = [], [], []
    for r_v, r_d in zip(variant, dense):
        ps.append(psnr(r_v["video"], r_d["video"], peak=1.0))
        ss.append(ssim(r_v["video"], r_d["video"], peak=1.0))
        ce.append(r_v["centroid_err"])
    return min(ps), min(ss), max(ce)


def test_sparse_window_quality_bound(sparse_by_window, dense):
    """The BASELINE.md sparse-quality table: deviation from dense grows
    as the window shrinks, and the flagship default w=2 plus the minimum
    w=1 both hold the adherence gate."""
    scores = {w: _scores(v, dense) for w, v in sparse_by_window.items()}
    for w, (p, s, c) in sorted(scores.items()):
        print(f"[sparse w={w}] psnr {p:.1f} dB ssim {s:.3f} "
              f"centroid_err {c:.1f} px")
    # monotone: a bigger window never deviates more (PSNR within 0.5 dB
    # slack for seed noise)
    assert scores[2][0] >= scores[1][0] - 0.5 >= scores[0][0] - 1.0, scores
    # the recommended windows keep the functional gate
    for w in (1, 2):
        p, s, c = scores[w]
        assert c < 12.0, (w, c)
        assert p > 20.0, (w, p)    # measured: w=1 ~24-27 dB, w=2 higher
        assert s > 0.75, (w, s)


def test_sparse_adherence_discriminates(sparse_by_window):
    """Sparse generations still follow THEIR track, not the alternative."""
    for w in (1, 2):
        for r in sparse_by_window[w]:
            assert r["centroid_err_alt"] > 1.4 * r["centroid_err"], (
                w, r["case"], r["centroid_err"], r["centroid_err_alt"])


def test_int8_quant_quality_bound(stack, dense):
    """int8 dynamic-quantized linears: near-transparent on the trained
    checkpoint (measured 64.2 dB / SSIM 1.000 vs the dense fp32 output)
    and the adherence gate holds."""
    results = _run(stack, quant="int8")
    p, s, c = _scores(results, dense)
    print(f"[int8] psnr {p:.1f} dB ssim {s:.3f} centroid_err {c:.1f} px")
    assert p > 30.0, p
    assert s > 0.95, s
    assert c < 12.0, c


def test_cfg6_quality_bound(stack):
    """VERDICT r4 item 6: the r4 quality bounds were measured at
    guidance 1.0 only, but production runs CFG 6.0
    (`/root/reference/pipelines.py:1174`) where the cond/uncond pair's
    approximation errors combine differently (the guided update
    amplifies their DIFFERENCE by the guidance scale). Same trained
    checkpoint, guidance 6.0: the accelerated config (int8 linears +
    sparse w=2) must stay close to the dense CFG-6 output and hold the
    adherence gate through the cond/uncond pair."""
    dense6 = _run_cfg(stack, 6.0)
    frames, spatial, ref = _latent_geometry(stack)
    fn = make_sparse_attn_fn(frames, spatial, ref_tokens=ref,
                             window=2, group=1, masked_dense=True)
    acc6 = _run_cfg(stack, 6.0, attn_fn=fn, quant="int8")
    p, s, c = _scores(acc6, dense6)
    print(f"[cfg6 int8+sparse w=2] psnr {p:.1f} dB ssim {s:.3f} "
          f"centroid_err {c:.1f} px")
    assert p > 25.0, p
    assert s > 0.9, s
    assert c < 12.0, c
    # the dense CFG-6 run itself keeps following its track (the gate is
    # meaningful at production guidance, not just guidance-free)
    assert max(r["centroid_err"] for r in dense6) < 12.0


def _run_cfg(stack, guidance, attn_fn=None, quant=None):
    return cf.evaluate_adherence(stack, cf.default_holdout_cases(),
                                 num_inference_steps=20,
                                 attn_fn=attn_fn, quant=quant,
                                 guidance_scale=guidance)


def test_combined_int8_sparse_quality_bound(stack, dense):
    """The accelerated serving config stacks BOTH approximations (int8
    linears + sparse attention at the default window): the combined
    deviation must stay within the single-mode bounds' ballpark and hold
    the adherence gate (measured ~63 dB — sparse w=2 dominates)."""
    frames, spatial, ref = _latent_geometry(stack)
    fn = make_sparse_attn_fn(frames, spatial, ref_tokens=ref,
                             window=2, group=1, masked_dense=True)
    results = _run(stack, attn_fn=fn, quant="int8")
    p, s, c = _scores(results, dense)
    print(f"[int8+sparse w=2] psnr {p:.1f} dB ssim {s:.3f} "
          f"centroid_err {c:.1f} px")
    assert p > 25.0, p
    assert s > 0.9, s
    assert c < 12.0, c
