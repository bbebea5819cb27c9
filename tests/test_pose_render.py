"""DWPose skeleton rendering — pixel-exact parity vs the VENDORED
reference code (`comfyui/annotator/dwpose_utils/`): the post-ONNX
keypoint transform (neck synthesis + mmpose->openpose reindex), the
part split, and the OpenPose drawing."""

import sys
import types

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

DWPOSE_DIR = "/root/reference/comfyui/annotator"


@pytest.fixture(scope="module")
def vendored():
    """Import the vendored dwpose_utils with an onnxruntime stub (the
    post-ONNX code under test never touches it)."""
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
    import importlib.util
    names = {}
    pkg = types.ModuleType("dwpose_utils")
    pkg.__path__ = [f"{DWPOSE_DIR}/dwpose_utils"]
    sys.modules["dwpose_utils"] = pkg
    for mod in ("util", "onnxdet", "onnxpose", "wholebody"):
        spec = importlib.util.spec_from_file_location(
            f"dwpose_utils.{mod}", f"{DWPOSE_DIR}/dwpose_utils/{mod}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"dwpose_utils.{mod}"] = m
        spec.loader.exec_module(m)
        names[mod] = m
    return names


def _random_keypoints(seed=0, persons=2):
    """Normalized wholebody keypoints with mixed confidence: some parts
    fully below threshold, some joints missing."""
    rng = np.random.RandomState(seed)
    kp = rng.uniform(0.05, 0.95, (persons, 133, 2))
    sc = rng.uniform(0.0, 1.0, (persons, 133))
    # the neck insert at 17 shifts raw indices >= 17 up by one, so the
    # post-transform part slices [92:113] / [24:92] correspond to raw
    # [91:112] / [23:91]
    sc[0, 91:112] = 0.1           # person 0: left hand fully invisible
    sc[1, 23:91] = 0.05           # person 1: face fully invisible
    return kp, sc


def test_openpose_transform_parity(vendored):
    """wholebody_to_openpose == the reference `Wholebody.__call__`
    postprocess (run via monkeypatched inference fns so the EXACT
    vendored lines execute)."""
    from flexam_tpu.perception.pose_render import wholebody_to_openpose
    wb = vendored["wholebody"]
    kp, sc = _random_keypoints()

    inst = object.__new__(wb.Wholebody)
    inst.session_det = inst.session_pose = None
    orig_det, orig_pose = wb.inference_detector, wb.inference_pose
    try:
        wb.inference_detector = lambda s, img: np.zeros((1, 4))
        wb.inference_pose = lambda s, det, img: (kp, sc)
        ref = inst(np.zeros((64, 96, 3), np.uint8))
    finally:
        wb.inference_detector, wb.inference_pose = orig_det, orig_pose
    got = wholebody_to_openpose(kp, sc)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_draw_parity_pixel_exact(vendored):
    """render_pose_video == draw_pose(format_result(...)) byte-for-byte."""
    from flexam_tpu.perception.pose_render import (render_pose_video,
                                                   split_parts,
                                                   wholebody_to_openpose)
    wb, init_mod = vendored["wholebody"], None
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "dwpose_utils.__init__", f"{DWPOSE_DIR}/dwpose_utils/__init__.py")
    init_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(init_mod)

    h, w = 72, 104
    for seed in (0, 1, 2):
        kp, sc = _random_keypoints(seed)
        info = wholebody_to_openpose(kp, sc)
        ref_canvas = init_mod.draw_pose(wb.Wholebody.format_result(info),
                                        h, w)
        ours = render_pose_video(kp[None], sc[None], h, w)[0]
        np.testing.assert_array_equal(
            (ours * 255).round().astype(np.uint8), ref_canvas,
            err_msg=f"seed={seed}")


def test_split_parts_thresholds():
    from flexam_tpu.perception.pose_render import (split_parts,
                                                   wholebody_to_openpose)
    kp, sc = _random_keypoints(3)
    info = wholebody_to_openpose(kp, sc)
    parts0 = split_parts(info[0])
    assert parts0["left_hand"] is None          # suppressed below 0.3
    parts1 = split_parts(info[1])
    assert parts1["face"] is None
    assert parts0["body"].shape == (18, 3)
    if parts1["left_hand"] is not None:
        assert parts1["left_hand"].shape == (21, 3)
