"""DWPose detection/pose pre+post — parity vs the vendored
`dwpose_utils/onnxdet.py` / `onnxpose.py` with stubbed inference sessions
(the exact vendored numpy code runs as the oracle; cv2.dnn would execute
the same .onnx files at runtime)."""

import sys
import types

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

DWPOSE_DIR = "/root/reference/comfyui/annotator/dwpose_utils"


class _FakeSession:
    """Quacks like a cv2.dnn net; returns canned outputs."""

    def __init__(self, outputs):
        self._outputs = outputs
        self.inputs = []

    def getUnconnectedOutLayersNames(self):
        n = 2 if callable(self._outputs) else len(self._outputs)
        return ["out%d" % i for i in range(n)]

    def setInput(self, x):
        self.inputs.append(np.asarray(x))

    def forward(self, names):
        out = self._outputs
        if callable(out):
            out = out(self.inputs[-1])
        return out


@pytest.fixture(scope="module")
def vendored():
    import importlib.util
    if "onnxruntime" not in sys.modules:
        # a REAL ModuleSpec: a spec-less stub left in sys.modules makes
        # importlib.util.find_spec raise "__spec__ is None" inside
        # transformers' availability probing, erroring every later
        # transformers-based oracle in the same process
        import importlib.machinery
        stub = types.ModuleType("onnxruntime")
        stub.__spec__ = importlib.machinery.ModuleSpec("onnxruntime",
                                                       loader=None)
        sys.modules["onnxruntime"] = stub
    mods = {}
    for mod in ("onnxdet", "onnxpose"):
        spec = importlib.util.spec_from_file_location(
            f"dwp_{mod}", f"{DWPOSE_DIR}/{mod}.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        mods[mod] = m
    return mods


def _n_anchors(size=(640, 640)):
    return sum((size[0] // s) * (size[1] // s) for s in (8, 16, 32))


def test_detector_parity(vendored):
    """detect_people == inference_detector on the same raw YOLOX output."""
    from flexam_tpu.perception.dwpose import detect_people, letterbox
    rng = np.random.RandomState(0)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    a = _n_anchors()
    raw = rng.randn(1, a, 85).astype(np.float32) * 0.5
    # make a few confident "person" anchors
    raw[0, :12, 4] = 4.0
    raw[0, :12, 5] = 4.0
    sess = _FakeSession([raw.copy()])
    ref_boxes = vendored["onnxdet"].inference_detector(sess, img.copy())
    _, ratio = letterbox(img)
    got = detect_people(raw[0].copy(), ratio)
    assert (got is None) == (ref_boxes is None)
    if got is not None:
        np.testing.assert_allclose(got, np.asarray(ref_boxes), rtol=1e-5)


def test_detector_none_when_empty(vendored):
    from flexam_tpu.perception.dwpose import detect_people, letterbox
    rng = np.random.RandomState(1)
    img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    raw = np.zeros((1, _n_anchors(), 85), np.float32)   # obj*cls = 0 < thr
    sess = _FakeSession([raw.copy()])
    assert vendored["onnxdet"].inference_detector(sess, img) is None
    _, ratio = letterbox(img)
    assert detect_people(raw[0], ratio) is None


def test_pose_parity(vendored):
    """crop + SimCC decode + back-projection == inference_pose for the
    same canned SimCC outputs and bboxes."""
    from flexam_tpu.perception.dwpose import (crop_person,
                                              keypoints_from_simcc)
    rng = np.random.RandomState(2)
    img = (rng.rand(200, 260, 3) * 255).astype(np.uint8)
    boxes = np.asarray([[30, 20, 160, 190], [80, 40, 250, 180]],
                       np.float32)
    k, w_in, h_in, ratio = 133, 288, 384, 2.0
    canned = [
        (rng.rand(1, k, int(w_in * ratio)).astype(np.float32),
         rng.rand(1, k, int(h_in * ratio)).astype(np.float32))
        for _ in range(len(boxes))]

    calls = {"i": 0}

    def pose_out(x):
        # cv2.dnn branch of the vendored `inference` runs one crop per
        # forward, in order
        out = canned[calls["i"]]
        calls["i"] += 1
        return out

    sess = _FakeSession(pose_out)
    ref_k, ref_s = vendored["onnxpose"].inference_pose(
        sess, boxes.copy(), img.copy())

    for i, bbox in enumerate(boxes):
        crop, center, scale = crop_person(img, bbox)
        # the vendored path fed the SAME normalized crop to the session
        np.testing.assert_allclose(
            crop.transpose(2, 0, 1),
            sess.inputs[i][0] if sess.inputs[i].ndim == 4
            else sess.inputs[i], rtol=1e-5, atol=1e-5)
        kpts, scores = keypoints_from_simcc(
            canned[i][0], canned[i][1], center, scale)
        np.testing.assert_allclose(kpts[0], ref_k[i], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(scores[0], ref_s[i], rtol=1e-5)


def test_full_video_path_with_fake_models(monkeypatch, tmp_path):
    """dwpose_video end-to-end with stubbed cv2.dnn sessions produces a
    rendered control video."""
    from flexam_tpu.perception import dwpose as dw
    rng = np.random.RandomState(3)
    a = _n_anchors()

    def fake_read(net_path):
        if "det" in net_path:
            raw = rng.randn(1, a, 85).astype(np.float32) * 0.3
            raw[0, :6, 4:6] = 5.0
            return _FakeSession([raw])
        k = 133
        return _FakeSession(lambda x: (
            rng.rand(1, k, 576).astype(np.float32),
            rng.rand(1, k, 768).astype(np.float32)))

    monkeypatch.setattr(cv2.dnn, "readNetFromONNX", fake_read)
    video = rng.rand(2, 96, 128, 3).astype(np.float32)
    out = dw.dwpose_video(video, det_onnx="det.onnx", pose_onnx="pose.onnx")
    assert out.shape == (2, 96, 128, 3)
    assert out.max() <= 1.0 and out.min() >= 0.0
    assert out.sum() > 0          # something was drawn
