"""Serialized-executable cache (`utils/aot_cache.py`): a fresh process
must be able to skip XLA compiles by loading executables persisted by an
earlier one (the cold-start attack, BASELINE.md round 4 — the
toolchain's own HLO compile cache is unusable here). Tests run on CPU:
serialization works on every backend; cross-HOST reuse is fingerprinted
out (cpuinfo flags join the key) but same-process reload exercises the
whole mechanism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flexam_tpu.utils import aot_cache


@pytest.fixture(autouse=True)
def _reset_global():
    yield
    aot_cache.configure("")      # disable between tests ("" -> None path)


def _entries(tmp_path):
    return sorted(p.name for p in tmp_path.iterdir()
                  if p.suffix == ".jexec")


def test_roundtrip_and_fresh_instance_loads(tmp_path, monkeypatch):
    compiles = []
    jit = jax.jit(lambda x, n: jnp.tanh(x) * n, static_argnums=(1,))

    cache = aot_cache.AotCache(str(tmp_path))
    orig = aot_cache.AotCache._load_or_compile

    def counting(self, jit_fn, args, kwargs, statics, tag, **kw):
        compiles.append(tag)
        return orig(self, jit_fn, args, kwargs, statics, tag, **kw)

    monkeypatch.setattr(aot_cache.AotCache, "_load_or_compile", counting)

    x = jnp.arange(12.0).reshape(3, 4)
    out1 = cache.call(jit, (x, 3), static_argnums=(1,), tag="t")
    out2 = cache.call(jit, (x, 3), static_argnums=(1,), tag="t")
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert compiles == ["t"]              # second call hit the mem table
    assert len(_entries(tmp_path)) == 1

    # a fresh instance (fresh process stand-in) must LOAD, not compile:
    # the entry file's mtime must not change
    entry = next(tmp_path.iterdir())
    before = entry.stat().st_mtime_ns
    cache2 = aot_cache.AotCache(str(tmp_path))
    out3 = cache2.call(jit, (x, 3), static_argnums=(1,), tag="t")
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(out1))
    assert entry.stat().st_mtime_ns == before
    # distinct static value -> distinct executable
    out4 = cache2.call(jit, (x, 5), static_argnums=(1,), tag="t")
    np.testing.assert_allclose(np.asarray(out4),
                               np.tanh(np.asarray(x)) * 5, rtol=1e-6)
    assert len(_entries(tmp_path)) == 2


def test_corrupt_entry_recompiles(tmp_path):
    jit = jax.jit(lambda x: x + 1)
    cache = aot_cache.AotCache(str(tmp_path))
    x = jnp.ones((2, 2))
    cache.call(jit, (x,), tag="c")
    entry = next(p for p in tmp_path.iterdir() if p.suffix == ".jexec")
    entry.write_bytes(b"not a pickle")
    cache2 = aot_cache.AotCache(str(tmp_path))
    out = cache2.call(jit, (x,), tag="c")
    np.testing.assert_array_equal(np.asarray(out), np.full((2, 2), 2.0))
    # the corrupt entry was replaced with a working one
    assert entry.read_bytes() != b"not a pickle"


def test_pytree_args_and_kwargs(tmp_path):
    def f(tree, scale, flag, extra=None):
        out = tree["a"] * scale + tree["b"]
        return (out, out.sum()) if extra is None else (out + extra,
                                                       out.sum())

    jit = jax.jit(f, static_argnums=(2,))
    cache = aot_cache.AotCache(str(tmp_path))
    tree = {"a": jnp.ones((2, 3)), "b": jnp.zeros((2, 3))}
    args = (tree, jnp.float32(2.0), True)
    o1 = cache.call(jit, args, {"extra": jnp.ones((2, 3))},
                    static_argnums=(2,), tag="p")
    o2 = aot_cache.AotCache(str(tmp_path)).call(
        jit, args, {"extra": jnp.ones((2, 3))}, static_argnums=(2,),
        tag="p")
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
    assert float(o1[1]) == float(o2[1]) == 12.0   # (1*2+0) summed over 6


def test_complete_blob_despite_warm_hlo_cache(tmp_path):
    """Regression: with jax's persistent HLO compile cache enabled,
    latched used, AND already holding the entry for the function, the
    aot compile must still be a TRUE fresh compile — compile() otherwise
    returns a cache-deserialized executable whose re-serialization drops
    auxiliary functions ("Buffer Definition Event: Function
    wrapped_convert.9 not found" at execution in the next process).
    jax latches is_cache_used() globally, so flipping the config flag
    alone does not prevent the GET (observed 2026-08-19)."""
    from jax._src import compilation_cache as cc

    ref, run, build = _tiny_pipeline_runner()

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    cc.reset_cache()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(tmp_path / "hlo"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        # two populates against the same HLO cache: without the latch
        # bypass the FIRST aot compile PUTs under the aot lowering's
        # key, the SECOND GET-hits it and persists the poisoned blob
        # into aot2
        np.testing.assert_array_equal(ref, run(build(str(tmp_path /
                                                         "aot1"))))
        np.testing.assert_array_equal(ref, run(build(str(tmp_path /
                                                         "aot2"))))
        # fresh instance = fresh process stand-in: the aot2 blob must
        # deserialize AND execute (the fetch inside run() surfaces the
        # missing-function failure). configure() now no-ops on an
        # unchanged path, so drop the instance explicitly first.
        aot_cache.configure("")
        np.testing.assert_array_equal(ref, run(build(str(tmp_path /
                                                         "aot2"))))
    finally:
        cc.reset_cache()
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def _tiny_pipeline_runner():
    """(ref, run, build) on the tiny pipeline: `build(aot_dir)` makes a
    pipeline, `run(pipe)` fetches denoised latents, `ref` is the plain
    no-cache result."""
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels

    cfg = tiny_test_config()
    k = jax.random.PRNGKey(0)

    def build(aot_dir):
        models = FlexAMModels(cfg=cfg,
                              dit_params=init_dit_params(k, cfg.dit),
                              vae_params=init_vae_params(k, cfg.vae))
        return FlexAMGenerationPipeline(models, compute_dtype=jnp.float32,
                                        aot_cache_dir=aot_dir)

    frame = np.random.RandomState(0).rand(1, 3, 1, 32, 32).astype(
        np.float32)
    tracks = np.stack(
        [np.linspace([8, 8, .5], [24, 24, .5], 9)] * 4, 1).astype(
        np.float32)
    ctx = jnp.zeros((2, cfg.t5.text_length, cfg.dit.text_dim), jnp.float32)

    def run(pipe):
        cond = pipe.prepare_conditioning_from_tracks(
            tracks, None, 32, 32, point_wise=4, first_frame=frame)
        return np.asarray(pipe.denoise(cond, ctx, num_inference_steps=2,
                                       guidance_scale=6.0, seed=0))

    ref = run(build(None))
    assert aot_cache.enabled() is None
    return ref, run, build


def test_pipeline_denoise_through_cache(tmp_path):
    """The tiny pipeline produces BIT-IDENTICAL latents with the cache
    off, cold (compiling+persisting), and warm-from-disk (a second
    pipeline whose executables all load)."""
    ref, run, build = _tiny_pipeline_runner()
    cold = run(build(str(tmp_path)))
    np.testing.assert_array_equal(ref, cold)
    names = _entries(tmp_path)
    assert any(n.startswith("denoise_chunk") for n in names), names
    aot_cache.configure("")      # force a fresh instance (process stand-in)
    warm = run(build(str(tmp_path)))
    np.testing.assert_array_equal(ref, warm)


def test_configure_is_stable(tmp_path):
    """Advisor r4: a second pipeline constructed with no aot_cache_dir
    must not tear down a cache configured earlier in-process, and an
    unchanged path must keep the SAME instance (its in-memory executable
    table)."""
    import os
    assert os.environ.get("FLEXAM_AOT_CACHE") is None
    c1 = aot_cache.configure(str(tmp_path))
    assert aot_cache.configure(None) is c1           # no env, no path
    assert aot_cache.configure(str(tmp_path)) is c1  # unchanged path
    c2 = aot_cache.configure(str(tmp_path / "other"))
    assert c2 is not c1
    assert aot_cache.configure("") is None           # explicit disable


def test_static_objects_pinned_against_id_reuse(tmp_path):
    """Advisor r4 (medium): non-primitive statics are keyed by id() in
    the mem table — the cache must hold strong references so a GC'd
    config's id can never be recycled onto a live signature."""
    import gc
    import weakref

    class Cfg:
        scale = 3.0

    cfg = Cfg()
    jit = jax.jit(lambda x, c: x * c.scale, static_argnums=(1,))
    cache = aot_cache.AotCache(str(tmp_path))
    x = jnp.ones((2, 2))
    cache.call(jit, (x, cfg), static_argnums=(1,), tag="pin")
    ref = weakref.ref(cfg)
    del cfg, jit
    gc.collect()
    assert ref() is not None      # the cache keeps the static alive


def test_disk_loaded_executable_failing_first_execution_recompiles(
        tmp_path, monkeypatch):
    """VERDICT r4 weak 1: an entry that DESERIALIZES fine but fails at
    its first execution (stale toolchain, incomplete serialize) must be
    unlinked and recompiled, not crash every process the same way."""
    jit = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((2, 3))
    aot_cache.AotCache(str(tmp_path)).call(jit, (x,), tag="fx")
    entry = next(p for p in tmp_path.iterdir() if p.suffix == ".jexec")
    mtime_before = entry.stat().st_mtime_ns

    from jax.experimental import serialize_executable as se

    class Broken:
        def __call__(self, *a, **k):
            raise RuntimeError("Buffer Definition Event: Function "
                               "wrapped_convert.9 not found")

    real = se.deserialize_and_load
    calls = {"n": 0}

    def fake(*a, **k):
        calls["n"] += 1
        real(*a, **k)             # still exercise real deserialization
        return Broken()

    monkeypatch.setattr(se, "deserialize_and_load", fake)
    out = aot_cache.AotCache(str(tmp_path)).call(jit, (x,), tag="fx")
    np.testing.assert_array_equal(np.asarray(out), np.full((2, 3), 3.0))
    assert calls["n"] == 1
    # the stale entry was unlinked and replaced by the fresh compile's
    # blob (same deterministic filename, rewritten)
    assert entry.exists() and entry.stat().st_mtime_ns != mtime_before
