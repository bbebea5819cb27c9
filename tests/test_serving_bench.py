"""`tools/serving_bench.py` — the serving-session benchmark (VERDICT r3
item 6's measurement vehicle) — must run its full loop at tiny scale:
init -> optional quantization -> N x (prepare -> denoise -> decode),
emitting the round-3-log-compatible per-run JSON records + medians
summary. The flagship numbers it produced are in BASELINE.md round 4
(int8-resident warm e2e ~109 s, zero restore)."""

import io
import json
from contextlib import redirect_stdout

import jax.numpy as jnp
import pytest


def _run(mode, runs=1):
    from flexam_tpu.tools import serving_bench

    buf = io.StringIO()
    with redirect_stdout(buf):
        serving_bench.main(["--tiny", "--mode", mode, "--runs", str(runs),
                            "--steps", "1", "--size", "32", "32",
                            "--frames", "9"])
    lines = [json.loads(l) for l in buf.getvalue().splitlines() if l]
    return lines[:-1], lines[-1]


def test_int8_resident_session():
    recs, summary = _run("int8", runs=2)
    assert len(recs) == 2
    for r in recs:
        assert r["mode"] == "int8"
        for k in ("prepare_s", "denoise_s", "decode_s", "e2e_s",
                  "steps_per_s", "probe_rtt_ms"):
            assert k in r, k
        assert "restore_dit_s" not in r          # resident: no offload
        assert r["video_shape"] == [1, 9, 32, 32, 3]
    assert summary["summary"] and summary["mode"] == "int8"
    assert set(summary["warm_medians"]) >= {"prepare_s", "denoise_s",
                                            "decode_s", "e2e_s"}


def test_accelerated_int8_sparse_session(monkeypatch):
    """--attention sparse stacks block-sparse video attention on the int8
    residency mode (the accelerated serving config); the records carry
    the attention/window fields so sessions are attributable."""
    import io
    from contextlib import redirect_stdout
    from flexam_tpu.tools import serving_bench

    monkeypatch.delenv("FLEXAM_ATTENTION", raising=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        serving_bench.main(["--tiny", "--mode", "int8", "--runs", "1",
                            "--steps", "1", "--size", "32", "32",
                            "--frames", "9", "--attention", "sparse",
                            "--sparse-window", "1", "--cfg-skip", "0.0"])
    lines = [json.loads(l) for l in buf.getvalue().splitlines() if l]
    recs, summary = lines[:-1], lines[-1]
    assert recs[0]["attention"] == "sparse"
    assert recs[0]["sparse_window"] == 1
    assert summary["attention"] == "sparse"
    assert recs[0]["video_shape"] == [1, 9, 32, 32, 3]
    monkeypatch.delenv("FLEXAM_ATTENTION", raising=False)


def test_build_models_without_quant_attr():
    """serve.py hands `demo._build_models` a bare Namespace; the function
    must not require the CLI-only quant attribute (regression: adding
    --quant to demo broke serve --host with AttributeError)."""
    import argparse
    from flexam_tpu.demo import _build_models

    pipe = _build_models(argparse.Namespace(
        checkpoint_path=None, random_init="tiny"))
    assert pipe.models.dit_params is not None


def test_bf16_offload_session_pays_restore():
    recs, summary = _run("bf16-offload")
    assert recs[0]["restore_dit_s"] >= 0.0
    assert "restore_dit_s" in summary["warm_medians"]


def test_fp8_quant_flag_on_pipeline():
    """pipeline quant='fp8' stores eligible DiT weights as fp8-e4m3
    (the reference's qfloat8 memory mode) through the same knob as int8."""
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels
    import jax

    cfg = tiny_test_config()
    k = jax.random.PRNGKey(0)
    models = FlexAMModels(cfg=cfg,
                          dit_params=init_dit_params(k, cfg.dit),
                          vae_params=init_vae_params(k, cfg.vae))
    pipe = FlexAMGenerationPipeline(models, compute_dtype=jnp.float32,
                                    quant="fp8")
    blocks = pipe.models.dit_params["blocks"]
    assert blocks["self_attn"]["q"]["weight"].dtype == jnp.float8_e4m3fn
    # precision-critical leaves stay high precision (fp8.DEFAULT_EXCLUDE)
    assert blocks["modulation"].dtype != jnp.float8_e4m3fn
