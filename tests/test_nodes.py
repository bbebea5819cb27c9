"""Node-graph front-end smoke: loader + sampler through the node protocol."""

import numpy as np
import pytest

from flexam_tpu.nodes import (NODE_CLASS_MAPPINGS, FlexAMV2VSampler,
                              FunAttention, LoadFlexAMModel,
                              VideoToTrackingVisualize)


def test_mappings_follow_node_protocol():
    for name, cls in NODE_CLASS_MAPPINGS.items():
        assert hasattr(cls, "FUNCTION") and hasattr(cls, "RETURN_TYPES")


def test_resolution_snap():
    s = FlexAMV2VSampler()
    assert s.snap_resolution(512, 896) == (384, 672)
    assert s.snap_resolution(512, 512) == (512, 512)
    h, w = s.snap_resolution(512, 896, base_resolution=768)
    assert h % 16 == 0 and w % 16 == 0 and w > h


def test_loader_and_sampler_tiny():
    pipe, = LoadFlexAMModel().loadmodel("nonexistent", random_init="tiny")
    t, h, w = 9, 32, 32
    rng = np.random.RandomState(0)
    video = rng.rand(1, 3, t, h, w).astype(np.float32)
    out, = FlexAMV2VSampler().process(
        pipe, "a node graph video", video,
        control_video=rng.rand(1, 3, t, h, w).astype(np.float32),
        mask_video=np.ones((1, 1, t, h, w), np.float32),
        video_length=t, base_resolution=32, steps=2, density=10.0)
    assert out.shape[1] == 3 and np.isfinite(out).all()


def test_attention_switch_node():
    import os
    prev = os.environ.get("FLEXAM_ATTENTION")
    try:
        FunAttention().process("xla")
        from flexam_tpu.core.attention import _default_backend
        assert _default_backend() == "xla"
    finally:
        if prev is None:
            os.environ.pop("FLEXAM_ATTENTION", None)
        else:
            os.environ["FLEXAM_ATTENTION"] = prev
        from flexam_tpu.core.attention import _default_backend
        _default_backend.cache_clear()


def test_visualizer_node():
    rng = np.random.RandomState(1)
    tracks = np.stack([rng.uniform(0, 64, (5, 20)),
                       rng.uniform(0, 48, (5, 20)),
                       rng.uniform(0.5, 3, (5, 20))], -1).astype(np.float32)
    vis = np.ones((5, 20), bool)
    tr, cos_list, depth = VideoToTrackingVisualize().process(
        tracks, vis, 48, 64)
    assert tr.shape == (1, 3, 5, 48, 64)
    assert len(cos_list) == 4 and depth.shape == tr.shape
