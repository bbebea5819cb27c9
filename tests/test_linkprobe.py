"""Link-health probe + staged uploads (utils/linkprobe.py) — VERDICT r2
item 5: RTT gating moves from docs into the product."""

import numpy as np
import pytest

from flexam_tpu.utils.linkprobe import (probe_link, reset_probe_cache,
                                        staged_put)


def test_probe_on_cpu_is_healthy_and_cached():
    reset_probe_cache()
    r1 = probe_link()
    assert r1["healthy"] and r1["platform"] == "cpu"
    r2 = probe_link()          # cached within TTL
    assert r2 is r1


def test_staged_put_roundtrip_small_and_large():
    a = np.random.rand(4, 8).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(staged_put(a)), a)
    big = np.arange(3 * 1 << 20, dtype=np.float32).reshape(12, -1)
    out = np.asarray(staged_put(big, chunk_mb=1))
    np.testing.assert_array_equal(out, big)


def test_pipeline_probe_recorded(monkeypatch):
    """generate-side plumbing: the probe result lands on the pipeline and
    in the metrics JSON; a degraded link switches to staged puts."""
    import jax.numpy as jnp

    import flexam_tpu.pipeline as P
    from flexam_tpu.utils import linkprobe
    from flexam_tpu.utils.timing import metrics

    pipe = object.__new__(P.FlexAMGenerationPipeline)
    pipe.last_link_probe = None
    pipe._staged_uploads = False

    monkeypatch.setattr(
        linkprobe, "probe_link",
        lambda force=False: {"rtt_ms_median": 450.0, "rtt_ms_p90": 900.0,
                             "healthy": False, "platform": "tpu"})
    res = P.FlexAMGenerationPipeline.probe_link_health(pipe)
    assert res["healthy"] is False
    assert pipe._staged_uploads is True
    assert metrics.counters["link_rtt_ms_median"] == 450.0
    # degraded puts still deliver correct arrays
    a = np.random.rand(6, 5).astype(np.float32)
    out = P.FlexAMGenerationPipeline._put(pipe, a)
    np.testing.assert_array_equal(np.asarray(out), a)


def test_restore_dit_staged_on_degraded_link():
    """restore_dit under a degraded link goes leaf-wise through
    staged_put and restores identical weights."""
    import time as _time

    import jax.numpy as jnp

    import flexam_tpu.pipeline as P
    from flexam_tpu.utils import linkprobe

    pipe = object.__new__(P.FlexAMGenerationPipeline)

    class _Models:
        dit_params = None
    pipe.models = _Models()
    host = {"a": np.random.rand(32, 16).astype(np.float32),
            "b": {"w": np.random.rand(8).astype(np.float32)}}
    pipe._dit_host = host
    # seed the probe cache with a degraded result (cache is checked
    # before the cpu short-circuit, so this works on any platform)
    linkprobe._CACHE.update(
        t=_time.monotonic(),
        result={"rtt_ms_median": 500.0, "rtt_ms_p90": 900.0,
                "healthy": False, "platform": "tpu"})
    try:
        P.FlexAMGenerationPipeline.restore_dit(pipe)
    finally:
        linkprobe.reset_probe_cache()
    assert pipe.models.dit_params is not None
    np.testing.assert_array_equal(
        np.asarray(pipe.models.dit_params["a"]), host["a"])
    np.testing.assert_array_equal(
        np.asarray(pipe.models.dit_params["b"]["w"]), host["b"]["w"])
    assert pipe._dit_src is pipe.models.dit_params
