"""Trained quality gate in the length-extrapolation (RIFLEx) regime
(VERDICT r4 item 5 tail): the r3/r4 approximation bounds were measured at
the training length only, but the long-video production path runs the
SAME approximations at an extrapolated T with RIFLEx-rescaled temporal
RoPE (`wan_transformer3d_FlexAM.py:774-799`; `pipe.enable_riflex`).

Method: the shared control-follow trained stack (T=13 -> 4 latent
frames) generates held-out cases at T=25 (7 latent frames, ~1.75x
extrapolation) with RIFLEx k=1 — for the tiny head_dim=24 the fastest
temporal frequency has period 2*pi ~ 6.3 frames, i.e. it wraps exactly
in the extrapolated range, making k=1 the frequency RIFLEx exists to
rescale. The accelerated config (int8 linears + sparse w=2 built for the
LONG geometry) must stay close to the dense long-T output, and dense
long-T generation itself must still follow its conditioned track.

Measured (CPU, seeds pinned; BASELINE.md round 5 records the table):
dense+RIFLEx adherence 1.7-1.8 px (mismatched-track alternative 16 px);
int8+sparse w=2 vs dense at the long T: worst 39.7 dB PSNR / SSIM 0.996,
adherence 1.7-2.0 px. The no-RIFLEx dense leg measured 47.6 dB vs the
RIFLEx one — at this mild 1.75x extrapolation the rescale is a small
perturbation, consistent with RIFLEx being a frequency-table tweak whose
value shows at larger extrapolations.
"""

import numpy as np
import pytest

from flexam_tpu.ops.sparse_attention import make_sparse_attn_fn
from flexam_tpu.tools import control_follow as cf
from flexam_tpu.tools.compare_latents import psnr, ssim

T_LONG = 25
RIFLEX_K = 1


@pytest.fixture(scope="module")
def stack():
    return cf.cached_stack(cf.default_cache_path(), cf.CACHE_VERSION)


def _long_geometry(stack):
    cfg = stack["cfg"]
    g = stack["geometry"]
    lt = 1 + (T_LONG - 1) // cfg.vae.temporal_compression_ratio
    lh = g["H"] // cfg.vae.spatial_compression_ratio
    lw = g["W"] // cfg.vae.spatial_compression_ratio
    pt, ph, pw = cfg.dit.patch_size
    spatial = (lh // ph) * (lw // pw)
    return lt // pt, spatial, spatial if cfg.dit.add_ref_conv else 0


def _run(stack, **kw):
    return cf.evaluate_adherence(stack, cf.default_holdout_cases(),
                                 num_inference_steps=20,
                                 t_override=T_LONG, riflex_k=RIFLEX_K,
                                 **kw)


@pytest.fixture(scope="module")
def dense_long(stack):
    return _run(stack)


def _scores(variant, base):
    ps, ss, ce = [], [], []
    for rv, rb in zip(variant, base):
        ps.append(psnr(rv["video"], rb["video"], peak=1.0))
        ss.append(ssim(rv["video"], rb["video"], peak=1.0))
        ce.append(rv["centroid_err"])
    return min(ps), min(ss), max(ce)


def test_dense_long_t_adherence(dense_long):
    """Dense long-T generation with RIFLEx still follows its track: the
    extrapolated frames continue the conditioned motion rather than
    collapsing (the failure mode RIFLEx prevents)."""
    for r in dense_long:
        assert r["centroid_err"] < 12.0, (r["case"], r["centroid_err"])
        assert r["centroid_err_alt"] > 1.4 * r["centroid_err"], (
            r["case"], r["centroid_err"], r["centroid_err_alt"])


def test_accelerated_long_t_quality_bound(stack, dense_long):
    """int8 linears + sparse w=2 at the extrapolated length: the
    combined deviation stays within the training-length bounds'
    ballpark and the adherence gate holds through RIFLEx."""
    frames, spatial, ref = _long_geometry(stack)
    fn = make_sparse_attn_fn(frames, spatial, ref_tokens=ref,
                             window=2, group=1, masked_dense=True)
    acc = _run(stack, attn_fn=fn, quant="int8")
    p, s, c = _scores(acc, dense_long)
    print(f"[long-T int8+sparse w=2 riflex] psnr {p:.1f} dB ssim {s:.3f}"
          f" centroid_err {c:.1f} px")
    assert p > 25.0, p
    assert s > 0.9, s
    assert c < 12.0, c
