"""INT8 dynamic-quantized block linears (`ops/qlinear.py`) — VERDICT r3
item 3's "integrate" branch: the v5e MXU runs int8 at 2x the bf16 rate
and the microbench paid (1.77x proj / 1.50x ffn INCLUDING quant overhead
at flagship shapes — BASELINE.md round 4), so the block GEMMs get an
opt-in quantized path. Reference counterpart: the paifuser fp8 linear
patches (`FlexAM/models/__init__.py:23-103`), retargeted to the MXU's
fast integer path (v5e has no fp8 matmul unit — measured at exactly
bf16 rate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.config import tiny_test_config
from flexam_tpu.core.layers import linear, linear_init
from flexam_tpu.ops.qlinear import (convert_dit_to_int8, is_quantized,
                                    qlinear, quantize_linear_params)


def test_qlinear_matches_fp32():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 64, 256), jnp.float32)
    p = linear_init(k, 256, 128, dtype=jnp.float32)
    y = linear(x, p)
    yq = qlinear(x, quantize_linear_params(p))
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.02, rel    # measured 0.0047 (per-token dynamic scales)


def test_linear_dispatches_on_quantized_params():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (4, 32), jnp.bfloat16)
    p = linear_init(k, 32, 16, dtype=jnp.float32)
    qp = quantize_linear_params(p)
    assert np.array_equal(np.asarray(linear(x, qp)),
                          np.asarray(qlinear(x, qp)))
    assert linear(x, qp).dtype == jnp.bfloat16


def test_quantize_stacked_scan_weights():
    """Block params are scan-stacked [L, out, in]: scales must be
    per-(layer, out-channel)."""
    k = jax.random.PRNGKey(2)
    w1 = linear_init(k, 64, 48, dtype=jnp.float32)
    ws = {"weight": jnp.stack([w1["weight"], w1["weight"] * 3.0]),
          "bias": jnp.stack([w1["bias"], w1["bias"]])}
    qs = quantize_linear_params(ws)
    assert qs["weight_q"].shape == (2, 48, 64)
    assert qs["w_scale"].shape == (2, 48)
    # layer 1's weights are 3x layer 0's -> scales must be 3x too
    np.testing.assert_allclose(np.asarray(qs["w_scale"][1]),
                               np.asarray(qs["w_scale"][0]) * 3.0,
                               rtol=1e-6)


def test_convert_dit_quantizes_blocks_only():
    """Conversion is IN PLACE (replace-as-we-go frees each bf16 source
    before the next quantizes — both trees alive would not fit a 16 GB
    v5e at flagship scale) and touches only the block linears."""
    from flexam_tpu.models.dit import init_dit_params
    cfg = tiny_test_config().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    norm_before = np.asarray(params["blocks"]["self_attn"]["norm_q"])
    patch_before = jax.tree_util.tree_leaves(params["patch_embedding"])[0]
    q = convert_dit_to_int8(params)
    assert q is params and is_quantized(q)
    b = q["blocks"]
    for grp, names in (("self_attn", ("q", "k", "v", "o")),
                       ("cross_attn", ("q", "k", "v", "o")),
                       ("ffn", ("fc1", "fc2"))):
        for n in names:
            assert "weight_q" in b[grp][n], (grp, n)
            assert "weight" not in b[grp][n], (grp, n)
            assert b[grp][n]["weight_q"].dtype == jnp.int8
    # norms / modulation / non-block weights untouched
    np.testing.assert_array_equal(
        np.asarray(b["self_attn"]["norm_q"]), norm_before)
    assert jax.tree_util.tree_leaves(
        q["patch_embedding"])[0] is patch_before
    assert b["modulation"].dtype == jnp.float32


def test_dit_forward_int8_close_to_fp32():
    """Full tiny-DiT forward through the quantized path: measured rel err
    0.0052, corr 0.99999 — bound at 4x."""
    from flexam_tpu.models.dit import dit_forward, init_dit_params

    cfg = tiny_test_config().dit
    k = jax.random.PRNGKey(0)
    params = init_dit_params(k, cfg, jnp.float32)
    qparams = convert_dit_to_int8(params)
    b = 2
    x = jax.random.normal(k, (b, 8, 2, 4, 4), jnp.float32)
    t = jnp.full((b,), 500.0)
    ctx = jax.random.normal(k, (b, 4, cfg.text_dim), jnp.float32)
    y = jax.random.normal(k, (b, 20, 2, 4, 4), jnp.float32)
    ac = jax.random.normal(k, (b, 40, 2, 4, 4), jnp.float32)
    fr = jax.random.normal(k, (b, 8, 4, 4), jnp.float32)
    kw = dict(y=y, additional_control=ac, full_ref=fr)
    v0 = dit_forward(params, cfg, x, t, ctx, **kw)
    v1 = dit_forward(qparams, cfg, x, t, ctx, **kw)
    rel = float(jnp.linalg.norm(v1 - v0) / jnp.linalg.norm(v0))
    assert rel < 0.02, rel
    # and under jit (deployment mode)
    v2 = jax.jit(lambda p, x, t, c: dit_forward(p, cfg, x, t, c, **kw)
                 )(qparams, x, t, ctx)
    rel2 = float(jnp.linalg.norm(v2 - v0) / jnp.linalg.norm(v0))
    assert rel2 < 0.02, rel2


def test_pipeline_quant_flag():
    """quant='int8' converts both DiT experts at pipeline init; unknown
    modes refuse."""
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels

    cfg = tiny_test_config()
    k = jax.random.PRNGKey(0)
    models = FlexAMModels(cfg=cfg,
                          dit_params=init_dit_params(k, cfg.dit),
                          vae_params=init_vae_params(k, cfg.vae),
                          dit2_params=init_dit_params(k, cfg.dit))
    pipe = FlexAMGenerationPipeline(models, compute_dtype=jnp.float32,
                                    quant="int8")
    assert is_quantized(pipe.models.dit_params)
    assert is_quantized(pipe.models.dit2_params)
    with pytest.raises(ValueError, match="quant"):
        FlexAMGenerationPipeline(models, quant="int4")


def test_host_quantize_matches_device():
    """Checkpoint trees arrive as numpy: `quantize_linear_params` must
    quantize them HOST-side (no device round-trip) with results identical
    to the on-device path, so prequantized uploads ship int8 bytes
    (~half a bf16 upload) without changing the math."""
    rng = np.random.RandomState(0)
    w = rng.randn(3, 48, 64).astype(np.float32) * 0.3
    b = rng.randn(3, 48).astype(np.float32)
    q_host = quantize_linear_params({"weight": w, "bias": b})
    q_dev = quantize_linear_params({"weight": jnp.asarray(w),
                                    "bias": jnp.asarray(b)})
    assert isinstance(q_host["weight_q"], np.ndarray)   # stayed on host
    assert q_host["weight_q"].dtype == np.int8
    np.testing.assert_array_equal(q_host["weight_q"],
                                  np.asarray(q_dev["weight_q"]))
    np.testing.assert_allclose(q_host["w_scale"],
                               np.asarray(q_dev["w_scale"]), rtol=1e-7)


def test_convert_dit_host_tree_and_upload():
    """A numpy DiT tree quantizes fully host-side; `pipeline._put_quantized`
    then uploads it with int8 leaves intact, fp32 matrices as bf16, and
    quantization scales kept fp32."""
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.pipeline import _put_quantized

    cfg = tiny_test_config().dit
    params = jax.tree_util.tree_map(
        np.asarray, init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    q = convert_dit_to_int8(params)
    leaves = jax.tree_util.tree_leaves(q)
    assert all(isinstance(l, np.ndarray) for l in leaves)   # no device work
    dev = _put_quantized(q)
    blk = dev["blocks"]["self_attn"]["q"]
    assert isinstance(blk["weight_q"], jax.Array)
    assert blk["weight_q"].dtype == jnp.int8
    assert blk["w_scale"].dtype == jnp.float32              # scales stay wide
    assert dev["patch_embedding"]["weight"].dtype == jnp.bfloat16
    # the uploaded quantized tree computes like the device-quantized one
    dev2 = convert_dit_to_int8(
        jax.device_put(jax.tree_util.tree_map(
            np.asarray, init_dit_params(jax.random.PRNGKey(0), cfg,
                                        jnp.float32))))
    np.testing.assert_array_equal(
        np.asarray(blk["weight_q"]),
        np.asarray(dev2["blocks"]["self_attn"]["q"]["weight_q"]))


def test_host_fp8_tree_uploads_narrow():
    """fp8 conversion also runs host-side on numpy trees; `_put_quantized`
    ships the e4m3 bytes directly."""
    from flexam_tpu.pipeline import _put_quantized
    from flexam_tpu.utils.fp8 import convert_weights_to_fp8

    rng = np.random.RandomState(1)
    tree = {"ffn": {"fc1": {"weight": rng.randn(16, 8).astype(np.float32),
                            "bias": rng.randn(16).astype(np.float32)}},
            "norm": rng.randn(8).astype(np.float32)}
    fp8 = convert_weights_to_fp8(tree)
    assert isinstance(fp8["ffn"]["fc1"]["weight"], np.ndarray)
    assert fp8["ffn"]["fc1"]["weight"].dtype == jnp.float8_e4m3fn
    dev = _put_quantized(fp8)
    assert dev["ffn"]["fc1"]["weight"].dtype == jnp.float8_e4m3fn
    assert dev["norm"].dtype == jnp.float32                 # 1D stays wide
