"""FLUX.1 transformer (models/flux.py): structure, loader, invariants.

No FLUX oracle exists in this environment (the model ships via diffusers,
absent; the reference consumes it as an external checkpoint,
`pipelines.py:137-173`), so these tests pin the implementation the same
way the other no-source ports are pinned: exact loader round-trips
through the official BFL checkpoint naming, mathematical invariants of
the published architecture (RoPE rotations, packing, schedule), and
behavioral properties (guidance embed, control concat)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flexam_tpu.models.flux import (
    FluxConfig, apply_rope, flux_forward, flux_params_from_state_dict,
    flux_params_to_state_dict, flux_schedule, init_flux_params,
    make_img_ids, pack_latents, rope_tables, timestep_embedding,
    unpack_latents,
)
from flexam_tpu.io.verify_load import check_mapping, summarize_mapping


CFG = FluxConfig.tiny()


def _inputs(cfg=CFG, b=1, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    l_img = (h // cfg.patch) * (w // cfg.patch)
    img = rng.standard_normal((b, l_img, cfg.in_channels)).astype(np.float32)
    txt = rng.standard_normal((b, 6, cfg.context_dim)).astype(np.float32)
    txt_ids = np.zeros((6, 3), np.int32)
    img_ids = make_img_ids(h, w, cfg.patch)
    y = rng.standard_normal((b, cfg.vec_dim)).astype(np.float32)
    t = np.full((b,), 0.7, np.float32)
    g = np.full((b,), 4.0, np.float32)
    return img, img_ids, txt, txt_ids, t, y, g


def test_forward_shape_and_finite():
    params = init_flux_params(jax.random.PRNGKey(0), CFG)
    img, img_ids, txt, txt_ids, t, y, g = _inputs()
    out = flux_forward(params, CFG, img, img_ids, txt, txt_ids, t, y, g)
    assert out.shape == (1, img.shape[1], CFG.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_loader_round_trip_exact():
    """init -> BFL state dict -> loader: 100% coverage, identical output."""
    params = init_flux_params(jax.random.PRNGKey(1), CFG)
    sd = flux_params_to_state_dict(params, CFG)
    # BFL naming spot-checks (the official single-file layout)
    assert "double_blocks.0.img_attn.qkv.weight" in sd
    assert "single_blocks.3.modulation.lin.bias" in sd
    assert "final_layer.adaLN_modulation.1.weight" in sd
    assert sd["img_in.weight"].shape == (CFG.hidden, CFG.in_channels)
    loaded, report = flux_params_from_state_dict(sd, CFG)
    assert not report["missed"] and not report["unused"]
    assert check_mapping(report, "flux-tiny", quiet=True)
    args = _inputs()
    a = flux_forward(params, CFG, *args)
    b = flux_forward(loaded, CFG, *args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_loader_reports_missing_keys():
    params = init_flux_params(jax.random.PRNGKey(2), CFG)
    sd = flux_params_to_state_dict(params, CFG)
    dropped = [k for k in sd if k.startswith("double_blocks.1.txt_attn")]
    for k in dropped:
        del sd[k]
    _, report = flux_params_from_state_dict(sd, CFG)
    assert len(report["missed"]) == len(dropped)
    assert summarize_mapping(report)["overall"] < 1.0


def test_rope_norm_preserving_and_identity_at_origin():
    ids = make_img_ids(8, 8)
    cos, sin = rope_tables(jnp.asarray(ids), CFG.axes_dim, CFG.theta)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, ids.shape[0], CFG.num_heads, CFG.head_dim)), jnp.float32)
    r = apply_rope(x, cos, sin)
    # rotations preserve the per-pair L2 norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(r), axis=-1), rtol=1e-5)
    # token (0, 0, 0) has zero phase on every axis -> identity
    np.testing.assert_allclose(np.asarray(r[:, 0]), np.asarray(x[:, 0]),
                               rtol=1e-6, atol=1e-6)


def test_rope_relative_position_property():
    """Post-RoPE dot products depend only on the id DIFFERENCE (the
    property that makes rotary embeddings relative)."""
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((1, 1, 1, CFG.head_dim)),
                    jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 1, CFG.head_dim)),
                    jnp.float32)

    def dot_at(qi, ki):
        ids = jnp.asarray(np.array([qi, ki], np.int32))
        cos, sin = rope_tables(ids, CFG.axes_dim, CFG.theta)
        qr = apply_rope(q, cos[:1], sin[:1])
        kr = apply_rope(k, cos[1:], sin[1:])
        return float(jnp.sum(qr * kr))

    a = dot_at([0, 3, 5], [0, 1, 2])
    b = dot_at([0, 9, 8], [0, 7, 5])   # same (dh, dw) = (2, 3)
    assert a == pytest.approx(b, rel=1e-4)


def test_pack_unpack_inverse_and_order():
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((2, 4, 6, 8)), jnp.float32)
    t = pack_latents(z)
    assert t.shape == (2, 3 * 4, 4 * 4)
    np.testing.assert_array_equal(np.asarray(unpack_latents(t, 6, 8)),
                                  np.asarray(z))
    # token 0 = top-left 2x2 patch, channel-major then row-major in patch
    np.testing.assert_array_equal(
        np.asarray(t[0, 0]), np.asarray(z[0, :, :2, :2]).reshape(-1))


def test_schedule_shift_and_endpoints():
    s = flux_schedule(8, image_seq_len=1024)
    u = flux_schedule(8, image_seq_len=1024, shift=False)
    assert s[0] == 1.0 and s[-1] == 0.0 and len(s) == 9
    assert np.all(np.diff(s) < 0)
    # mu > 0 at seq 1024 -> shifted sigmas sit above the linear ramp
    assert np.all(s[1:-1] > u[1:-1])


def test_guidance_embed_changes_output():
    params = init_flux_params(jax.random.PRNGKey(6), CFG)
    img, img_ids, txt, txt_ids, t, y, g = _inputs()
    a = flux_forward(params, CFG, img, img_ids, txt, txt_ids, t, y,
                     np.full((1,), 1.0, np.float32))
    b = flux_forward(params, CFG, img, img_ids, txt, txt_ids, t, y,
                     np.full((1,), 8.0, np.float32))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4
    with pytest.raises(ValueError):
        flux_forward(params, CFG, img, img_ids, txt, txt_ids, t, y, None)


def test_timestep_embedding_convention():
    """cos-first halves, t scaled by 1000 (the FLUX convention)."""
    e = np.asarray(timestep_embedding(jnp.asarray([0.0]), 8))
    np.testing.assert_allclose(e[0, :4], 1.0)   # cos(0)
    np.testing.assert_allclose(e[0, 4:], 0.0)   # sin(0)
    e2 = np.asarray(timestep_embedding(jnp.asarray([0.5]), 8))
    assert e2[0, 4] == pytest.approx(np.sin(500.0), rel=1e-5)
