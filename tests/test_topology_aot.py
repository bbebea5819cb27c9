"""Topology-AOT of the sharded denoise step (VERDICT r3 item 8): the
compile-only PJRT TPU client must accept the dp2 x sp4 GSPMD program WITH
the Pallas flash-attention kernel inside the Ulysses shard_map — proof
the Mosaic+GSPMD path compiles for a real multi-chip TPU target without
multi-chip hardware. The full-5B variant (~36 s compile, 21 MiB
serialized) runs via `python -m flexam_tpu.tools.topology_aot`; the test
uses the reduced-width flagship-token-geometry variant (~35 s)."""

import pytest


def test_aot_compiles_sharded_step_for_v5e8(tmp_path):
    try:
        from jax.experimental import topologies
        topologies.get_topology_desc("v5e:2x4", "tpu")
    except Exception as e:                       # pragma: no cover - env
        pytest.skip(f"no compile-only TPU client here: {e}")

    from flexam_tpu.tools.topology_aot import aot_compile_denoise_step

    blob = tmp_path / "step.exe"
    res = aot_compile_denoise_step(full_5b=False,
                                   serialize_to=str(blob))
    assert res["code_bytes"] > 0
    assert res["serialized_bytes"] > 1_000_000
    assert blob.stat().st_size == res["serialized_bytes"]


def test_fused_kernels_compose_with_mesh(monkeypatch):
    """Round 5 (VERDICT r4 item 1a): the fused elementwise kernels no
    longer stand down under a multi-device mesh — the wrappers shard_map
    them per-shard, so `fused_enabled()` stays on and `_active_mesh()`
    reports the mesh the wrappers will map over."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from flexam_tpu.ops import fused
    from flexam_tpu.parallel.sharding import activation_sharding

    monkeypatch.setenv("FLEXAM_FUSED", "1")
    assert fused._active_mesh() is None
    if len(jax.devices()) >= 2:
        mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1, 1),
                    ("dp", "sp", "tp"))
        with activation_sharding(mesh):
            assert fused.fused_enabled() is True
            assert fused._active_mesh() is mesh
    # single-device mesh: no wrap needed, kernels call directly
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                 ("dp", "sp", "tp"))
    with activation_sharding(mesh1):
        assert fused._active_mesh() is None


def test_aot_compiles_accelerated_step_for_v5p8(tmp_path):
    """VERDICT r4 item 4: the north star names v5p-8 (= 8 TensorCores =
    4 megacore devices = topology `v5p:2x2x1`), which has a different
    geometry/VMEM than the v5e the Mosaic tilings were tuned on. The
    ACCELERATED step (int8 linears + sparse Ulysses inner + fused
    per-shard prologues) must compile for it. Full-5B measured on this
    host: dense 48 s / accelerated 72 s compile, 27.5 MiB serialized
    (`python -m flexam_tpu.tools.topology_aot --topology v5p:2x2x1`)."""
    try:
        from jax.experimental import topologies
        topologies.get_topology_desc("v5p:2x2x1", "tpu")
    except Exception as e:                       # pragma: no cover - env
        pytest.skip(f"no compile-only TPU client here: {e}")

    from flexam_tpu.tools.topology_aot import aot_compile_denoise_step

    res = aot_compile_denoise_step(topology="v5p:2x2x1", dp=2, sp=2,
                                   full_5b=False, quant=True, sparse=True,
                                   fused=True)
    assert res["code_bytes"] > 0


def test_aot_compiles_accelerated_sharded_step(tmp_path):
    """The ACCELERATED sharded step (int8 linears + sparse Ulysses inner
    + fused per-shard prologues) must compile for the real v5e:2x4
    target — the composition VERDICT r4 item 1 requires."""
    try:
        from jax.experimental import topologies
        topologies.get_topology_desc("v5e:2x4", "tpu")
    except Exception as e:                       # pragma: no cover - env
        pytest.skip(f"no compile-only TPU client here: {e}")

    from flexam_tpu.tools.topology_aot import aot_compile_denoise_step

    res = aot_compile_denoise_step(full_5b=False, quant=True, sparse=True,
                                   fused=True)
    assert res["code_bytes"] > 0
