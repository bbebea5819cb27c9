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
