"""Prequantized checkpoint flow (`tools/prequant_ckpt.py` +
`io.checkpoints.restore_pytree_nested`): quantize offline with numpy,
save one .npz, restore without a like-tree, and serve through the
pipeline with the quantize pass skipped — the deployment cold-start
uploads narrow bytes and does zero conversion work. Reference
counterpart: the fp8 mode converts at every load
(`FlexAM/utils/fp8_optimization.py:19-34`); offline prequantization has
no reference equivalent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flexam_tpu.config import tiny_test_config
from flexam_tpu.io.checkpoints import (restore_pytree_nested, save_pytree)
from flexam_tpu.models.dit import init_dit_params
from flexam_tpu.ops.qlinear import is_quantized


def _host_tiny_dit():
    cfg = tiny_test_config().dit
    return cfg, jax.tree_util.tree_map(
        np.asarray, init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))


def test_prequant_roundtrip_int8(tmp_path):
    from flexam_tpu.tools.prequant_ckpt import _cast_wide_to_bf16, prequantize

    cfg, dit = _host_tiny_dit()
    q = _cast_wide_to_bf16(prequantize(dit, "int8"))
    path = str(tmp_path / "dit_int8.npz")
    save_pytree(path, q)
    back = restore_pytree_nested(path)
    assert is_quantized(back)
    lq, lb = (jax.tree_util.tree_leaves(t) for t in (q, back))
    assert len(lq) == len(lb)
    for a, b in zip(lq, lb):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prequant_fp8_roundtrip(tmp_path):
    """fp8 leaves survive the npz (uint8 view translation in
    save_pytree/load_pytree_state_dict)."""
    import ml_dtypes

    from flexam_tpu.tools.prequant_ckpt import _cast_wide_to_bf16, prequantize

    cfg, dit = _host_tiny_dit()
    q = _cast_wide_to_bf16(prequantize(dit, "fp8"))
    path = str(tmp_path / "dit_fp8.npz")
    save_pytree(path, q)
    back = restore_pytree_nested(path)
    w = back["blocks"]["ffn"]["fc1"]["weight"]
    assert w.dtype == ml_dtypes.float8_e4m3fn
    np.testing.assert_array_equal(
        w.view(np.uint8),
        np.asarray(q["blocks"]["ffn"]["fc1"]["weight"]).view(np.uint8))


def test_prequant_cli_and_pipeline_serve(tmp_path):
    """CLI writes the npz; the pipeline serves from it with conversion
    skipped (already-quantized tree passes through `convert_dit_to_int8`
    untouched) and the weights uploaded."""
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels
    from flexam_tpu.tools.prequant_ckpt import main as prequant_main

    path = str(tmp_path / "tiny_int8.npz")
    assert prequant_main(["--checkpoint", "random:tiny",
                          "--mode", "int8", "--out", path]) == 0
    dit = restore_pytree_nested(path)
    assert is_quantized(dit)
    cfg = tiny_test_config()
    models = FlexAMModels(cfg=cfg, dit_params=dit,
                          vae_params=init_vae_params(
                              jax.random.PRNGKey(1), cfg.vae))
    pipe = FlexAMGenerationPipeline(models, compute_dtype=jnp.float32,
                                    quant="int8")
    blk = pipe.models.dit_params["blocks"]["self_attn"]["q"]
    assert isinstance(blk["weight_q"], jax.Array)
    assert blk["weight_q"].dtype == jnp.int8
    # the prequantized tree must equal quantize-at-load bit for bit
    fresh = jax.tree_util.tree_map(
        np.asarray, init_dit_params(jax.random.PRNGKey(0),
                                    cfg.dit, jnp.float32))
    from flexam_tpu.ops.qlinear import convert_dit_to_int8
    ref = convert_dit_to_int8(fresh)
    np.testing.assert_array_equal(
        np.asarray(blk["weight_q"]),
        np.asarray(ref["blocks"]["self_attn"]["q"]["weight_q"]))


def test_demo_prequant_flag(tmp_path):
    """`--prequant` swaps the DiT for the prequantized tree and infers
    the quant mode; an unquantized npz refuses."""
    from flexam_tpu.demo import _build_models, build_argparser
    from flexam_tpu.tools.prequant_ckpt import main as prequant_main

    path = str(tmp_path / "tiny_int8.npz")
    prequant_main(["--checkpoint", "random:tiny", "--mode", "int8",
                   "--out", path])
    args = build_argparser().parse_args(
        ["--prompt", "x", "--random_init", "tiny", "--prequant", path])
    pipe = _build_models(args)
    assert is_quantized(pipe.models.dit_params)

    bad = str(tmp_path / "plain.npz")
    cfg, dit = _host_tiny_dit()
    save_pytree(bad, dit)
    args = build_argparser().parse_args(
        ["--prompt", "x", "--random_init", "tiny", "--prequant", bad])
    with pytest.raises(ValueError, match="quantized"):
        _build_models(args)


def test_demo_prequant_serve_bundle(tmp_path):
    """A serve bundle (vae/ + dit/, tools/cold_start --with-vae layout)
    through --prequant: the DiT arrives quantized AND the pipeline's VAE
    is the bundle's (bf16-shipped, fp32 on device) — not a random init."""
    import ml_dtypes

    from flexam_tpu.demo import _build_models, build_argparser
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.ops.qlinear import convert_dit_to_int8

    _, dit = _host_tiny_dit()
    vae = jax.tree_util.tree_map(
        lambda a: np.asarray(a, ml_dtypes.bfloat16),
        init_vae_params(jax.random.PRNGKey(7), tiny_test_config().vae))
    path = str(tmp_path / "bundle.npz")
    save_pytree(path, {"vae": vae, "dit": convert_dit_to_int8(dit)})

    args = build_argparser().parse_args(
        ["--prompt", "x", "--random_init", "tiny", "--prequant", path])
    pipe = _build_models(args)
    assert is_quantized(pipe.models.dit_params)
    leaf = jax.tree_util.tree_leaves(pipe.models.vae_params)[0]
    assert leaf.dtype == jnp.float32       # device-side upcast applied
    ref = jax.tree_util.tree_leaves(vae)[0]
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(ref).astype(np.float32))
