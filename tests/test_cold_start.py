"""`tools/cold_start.py` — the time-to-first-video deployment recipe
(VERDICT r4 item 3): fresh process + prequantized int8 npz + warm
serialized-executable dir, with the upload-floor levers (--overlap,
--upload-threads, --stream-upload). The flagship numbers it produced
are in BASELINE.md round 5. Reference counterpart: none — the
reference reloads + re-converts fp8 weights every process
(`FlexAM/utils/fp8_optimization.py:19-34`)."""

import io
import json
from contextlib import redirect_stdout

import numpy as np
import jax
import jax.numpy as jnp

from flexam_tpu.config import tiny_test_config
from flexam_tpu.io.checkpoints import restore_pytree_nested, save_pytree
from flexam_tpu.models.dit import init_dit_params
from flexam_tpu.tools.cold_start import stream_upload_npz


def _tiny_int8_npz(tmp_path):
    from flexam_tpu.tools.prequant_ckpt import (_cast_wide_to_bf16,
                                                prequantize)

    cfg = tiny_test_config().dit
    dit = jax.tree_util.tree_map(
        np.asarray,
        init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    q = _cast_wide_to_bf16(prequantize(dit, "int8"))
    path = str(tmp_path / "tiny_int8.npz")
    save_pytree(path, q)
    return path


def test_stream_upload_matches_eager_restore(tmp_path):
    """The pipelined reader must reproduce restore_pytree_nested
    exactly: same nesting, same dtypes (incl. the bf16/int8 view
    translation), same values, same byte count."""
    path = _tiny_int8_npz(tmp_path)
    eager = restore_pytree_nested(path)
    streamed, nb = stream_upload_npz(path, n_threads=3)
    assert (jax.tree_util.tree_structure(eager)
            == jax.tree_util.tree_structure(streamed))
    for a, b in zip(jax.tree_util.tree_leaves(eager),
                    jax.tree_util.tree_leaves(streamed)):
        assert tuple(a.shape) == tuple(b.shape)
        assert str(a.dtype) == str(b.dtype)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert nb == sum(a.nbytes for a in jax.tree_util.tree_leaves(eager))


def test_stream_upload_cast_matches_put_quantized(tmp_path):
    """Recipe convergence (round-5 aot-cache investigation): streaming
    with cast_wide_prefix must produce the same leaf dtypes as
    restore + _put_quantized, or the two deployment recipes lower
    different HLO and never share aot-cache entries."""
    from flexam_tpu.pipeline import _put_quantized

    tree = {
        "q": {"weight": np.random.rand(8, 8).astype(np.float32),
              "bias": np.random.rand(8).astype(np.float32)},
        "blk": {"weight_q": np.random.randint(-127, 128, (8, 8)
                                              ).astype(np.int8),
                "w_scale": np.random.rand(8, 1).astype(np.float32)},
    }
    path = str(tmp_path / "mixed.npz")
    save_pytree(path, tree)
    ref = _put_quantized(restore_pytree_nested(path))
    streamed, _ = stream_upload_npz(path, n_threads=2,
                                    cast_wide_prefix="")
    ref_flat = jax.tree_util.tree_leaves_with_path(ref)
    st_flat = jax.tree_util.tree_leaves_with_path(streamed)
    assert len(ref_flat) == len(st_flat)
    for (pa, a), (pb, b) in zip(ref_flat, st_flat):
        assert pa == pb
        assert str(a.dtype) == str(b.dtype), (pa, a.dtype, b.dtype)
        assert tuple(a.shape) == tuple(b.shape)


def _tiny_bundle_npz(tmp_path):
    """vae/ + dit/ serve bundle (vae/ written FIRST = streams first)."""
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.tools.prequant_ckpt import (_cast_wide_to_bf16,
                                                prequantize)

    cfg = tiny_test_config()
    dit = jax.tree_util.tree_map(
        np.asarray,
        init_dit_params(jax.random.PRNGKey(0), cfg.dit, jnp.float32))
    vae = jax.tree_util.tree_map(
        lambda a: np.asarray(a, jnp.bfloat16),    # bundles ship bf16 VAE
        init_vae_params(jax.random.PRNGKey(1), cfg.vae))
    q = _cast_wide_to_bf16(prequantize(dit, "int8"))
    path = str(tmp_path / "tiny_bundle.npz")
    save_pytree(path, {"vae": vae, "dit": q})
    return path


def test_stream_upload_priority_callback(tmp_path):
    """A bundle's vae/ members resolve and fire the callback before the
    full tree returns; the callback subtree equals the restored vae."""
    path = _tiny_bundle_npz(tmp_path)
    got = {}
    streamed, _ = stream_upload_npz(
        path, n_threads=2, priority_prefix="vae/",
        on_priority_ready=lambda sub: got.update(vae=sub))
    assert "vae" in got, "priority callback never fired"
    eager = restore_pytree_nested(path)
    assert (jax.tree_util.tree_structure(got["vae"])
            == jax.tree_util.tree_structure(eager["vae"]))
    for a, b in zip(jax.tree_util.tree_leaves(got["vae"]),
                    jax.tree_util.tree_leaves(eager["vae"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (jax.tree_util.tree_structure(streamed)
            == jax.tree_util.tree_structure(eager))


def test_cold_start_tiny_bundle_e2e(tmp_path):
    """The serve-bundle recipe end-to-end: the VAE arrives by stream
    (no on-device random init) and the record marks the bundle."""
    from flexam_tpu.tools import cold_start

    npz = _tiny_bundle_npz(tmp_path)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cold_start.main([
            "--prequant", npz, "--tiny",
            "--size", "32", "32", "--frames", "9", "--steps", "2",
            "--stream-upload", "--overlap", "--upload-threads", "2"])
    assert rc == 0
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["bundle"] is True
    assert "vae_upload_done_s" in rec
    assert rec["video_shape"] == [1, 9, 32, 32, 3]


def test_cold_start_tiny_e2e(tmp_path):
    """Full recipe at tiny scale with every lever on: probe ->
    stream-upload overlapped with prepare -> denoise -> decode; the
    emitted record carries every phase plus the lever flags."""
    from flexam_tpu.tools import cold_start

    npz = _tiny_int8_npz(tmp_path)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cold_start.main([
            "--prequant", npz, "--tiny",
            "--size", "32", "32", "--frames", "9", "--steps", "2",
            "--stream-upload", "--overlap", "--upload-threads", "2"])
    assert rc == 0
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["stream_upload"] and rec["overlap"]
    assert rec["video_shape"] == [1, 9, 32, 32, 3]
    for k in ("probe_rtt_ms", "upload_s", "prepare_s", "denoise_s",
              "decode_s", "ttfv_s", "upload_join_s"):
        assert k in rec, k
    assert rec["ttfv_s"] > 0
