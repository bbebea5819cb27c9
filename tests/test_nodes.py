"""Node-graph front-end smoke: loader + sampler through the node protocol."""

import numpy as np
import pytest

from flexam_tpu.nodes import (NODE_CLASS_MAPPINGS, FlexAMV2VSampler,
                              FunAttention, LoadFlexAMModel,
                              VideoToTrackingVisualizeAll)


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
    tr, depth, *cos_list = VideoToTrackingVisualizeAll().process(
        tracks, vis, 48, 64)
    assert tr.shape == (1, 3, 5, 48, 64)
    assert len(cos_list) == 4 and depth.shape == tr.shape
    # the reference's input_video link supplies the geometry too
    video = np.zeros((1, 3, 5, 48, 64), np.float32)
    tr2, *_ = VideoToTrackingVisualizeAll().process(
        tracks, vis, input_video=video)
    np.testing.assert_array_equal(tr, tr2)


# ---------------------------------------------------------------------------
# Round-2 node surface (VERDICT r1 item 6): reference-name superset,
# ChaoJie camera set, annotators, LoRA wiring, workflow JSONs
# ---------------------------------------------------------------------------

def _load_reference_camera_utils():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_camera_utils", "/root/reference/comfyui/camera_utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_node_mapping_superset_of_reference():
    """Every inference-relevant reference node name resolves here
    (`comfyui_nodes.py:393-419`)."""
    ref_names = [
        "FunTextBox", "FunRiflex", "FunCompile", "FunAttention",
        "LoadWan2_2FunModel_FlexAM", "Wan2_2FunV2VSampler_FlexAM",
        "VideoToCanny", "VideoToDepth", "VideoToOpenpose",
        "VideoToTrackingPredict", "VideoToTrackingVisualize",
        "VideoToCosVisualize", "VideoTodepthVisualize",
        "VideoToTrackingVisualizeAll", "CreateTrajectoryBasedOnKJNodes",
        "CameraBasicFromChaoJie", "CameraTrajectoryFromChaoJie",
        "CameraJoinFromChaoJie", "CameraCombineFromChaoJie",
        "ImageMaximumNode", "ImageCollectNode",
    ]
    missing = [n for n in ref_names if n not in NODE_CLASS_MAPPINGS]
    assert not missing, missing


def test_camera_presets_parity_vs_reference():
    """camera_presets math vs the ACTUAL reference camera_utils.py."""
    ref = _load_reference_camera_utils()
    from flexam_tpu.conditioning import camera_presets as cp
    for name in cp.PRESET_NAMES:
        p = ref.CAMERA[name]
        theirs = ref.get_camera_motion(np.array(p["angle"]),
                                       np.array(p["T"]), 1.3, 16)
        ours = cp.preset_camera_motion(name, 1.3, 16)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7,
                                   err_msg=name)
    rt0 = cp.preset_camera_motion("Pan Up", 1.0, 8)
    rt1 = cp.preset_camera_motion("CW", 2.0, 8)
    theirs = ref.combine_camera_motion(rt0.astype(np.float64).copy(),
                                       rt1.astype(np.float64).copy())
    ours = cp.join_camera_motion(rt0, rt1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_camera_nodes_and_trajectory_json():
    import json
    from flexam_tpu.nodes import (CameraBasicFromChaoJie,
                                  CameraCombineFromChaoJie,
                                  CameraJoinFromChaoJie,
                                  CameraTrajectoryFromChaoJie)
    rt, = CameraBasicFromChaoJie().run("Zoom In", 1.0, 12)
    assert rt.shape == (12, 3, 4)
    rt2, = CameraCombineFromChaoJie().run("Pan Up", "Pan Left")
    joined, = CameraJoinFromChaoJie().run(rt, rt2)
    assert joined.shape == (12 + 16, 3, 4)
    s, n = CameraTrajectoryFromChaoJie().run(rt)
    data = json.loads(s)
    assert n == 12 and len(data) == 12 and len(data[0]) == 6 + 12


def test_split_visualizer_nodes_match_combined():
    from flexam_tpu.nodes import (VideoToCosVisualize,
                                  VideoTodepthVisualize,
                                  VideoToTrackingVisualize)
    rng = np.random.RandomState(1)
    tracks = np.stack([rng.uniform(0, 64, (5, 20)),
                       rng.uniform(0, 48, (5, 20)),
                       rng.uniform(0.5, 3, (5, 20))], -1).astype(np.float32)
    vis = np.ones((5, 20), bool)
    tr_all, depth_all, *cos_all = VideoToTrackingVisualizeAll().process(
        tracks, vis, 48, 64)
    tr, = VideoToTrackingVisualize().process(tracks, vis, 48, 64)
    cos = VideoToCosVisualize().process(tracks, vis, 48, 64)
    dep, = VideoTodepthVisualize().process(tracks, vis, 48, 64)
    np.testing.assert_array_equal(tr, tr_all)
    np.testing.assert_array_equal(dep, depth_all)
    for a, b in zip(cos, cos_all):
        np.testing.assert_array_equal(a, b)


def test_canny_and_image_nodes():
    from flexam_tpu.nodes import (ImageCollectNode, ImageMaximumNode,
                                  VideoToCanny)
    rng = np.random.RandomState(0)
    v = rng.rand(1, 3, 4, 32, 32).astype(np.float32)
    out, = VideoToCanny().process(v, video_length=4)
    assert out.shape == (1, 3, 4, 32, 32)
    a = rng.rand(4, 32, 32, 3).astype(np.float32)
    b = rng.rand(4, 16, 16, 3).astype(np.float32)
    m, = ImageMaximumNode().imagemaximum(a, b)
    assert m.shape == a.shape and (m >= a).all()
    c, = ImageCollectNode().imagecollect(a, b)
    assert len(c) == 8


def test_trajectory_node():
    from flexam_tpu.nodes import CreateTrajectoryBasedOnKJNodes
    coords = str([{"x": 10, "y": 12}, {"x": 20, "y": 24}])
    masks = np.zeros((2, 64, 96), np.float32)
    img, = CreateTrajectoryBasedOnKJNodes().createtrajectory(coords, masks)
    assert img.shape == (2, 64, 96, 3)
    assert img.max() <= 1.0 and img[0, 12, 10].max() > 0.5


def test_annotator_backend_registry_and_fixture(tmp_path):
    from flexam_tpu.nodes import (VideoToDepth, VideoToTrackingPredict,
                                  register_annotator_backend,
                                  ANNOTATOR_BACKENDS)
    rng = np.random.RandomState(0)
    video = rng.rand(1, 3, 3, 16, 16).astype(np.float32)
    import pytest as _pytest
    from flexam_tpu.nodes import VideoToPose
    with _pytest.raises(RuntimeError, match="external model"):
        VideoToPose().process(video, video_length=3)
    # VideoToDepth no longer requires an external: it falls through to the
    # perception depth registry + the reference's percentile normalization
    d, = VideoToDepth().process(video, video_length=3)
    assert d.shape == video.shape and d.min() >= 0 and d.max() <= 1
    fx = str(tmp_path / "tracks.npz")
    np.savez(fx, tracks=rng.rand(3, 7, 3).astype(np.float32),
             visibility=np.ones((3, 7), bool))
    tr, vis = VideoToTrackingPredict().process(video, fixture=fx)
    assert tr.shape == (3, 7, 3) and vis.dtype == bool
    try:
        register_annotator_backend(
            "depth", lambda v, **kw: {"depth": np.repeat(
                v.mean(-1, keepdims=True), 3, -1)})
        d, = VideoToDepth().process(video, video_length=3)
        assert d.shape == video.shape
    finally:
        ANNOTATOR_BACKENDS.pop("depth", None)


def test_load_config_node():
    from flexam_tpu.nodes import LoadConfig
    cfg, = LoadConfig().process("wan2.2/wan_civitai_5b_FlexAM.yaml")
    assert cfg.dit.add_ref_conv and cfg.dit.add_cnn_block
    assert cfg.vae.latent_channels == 48


def test_sampler_lora_input(tmp_path):
    """LoRA safetensors merged via the sampler input with the host-side
    cache (`wan2_2_fun_flexam/nodes.py:595-649`)."""
    from safetensors.numpy import save_file
    pipe, = LoadFlexAMModel().loadmodel("nonexistent", random_init="tiny")
    dim = pipe.cfg.dit.dim
    rng = np.random.RandomState(3)
    lora = {
        "lora_unet_blocks_1_self_attn_q.lora_down.weight":
            rng.randn(2, dim).astype(np.float32) * 0.02,
        "lora_unet_blocks_1_self_attn_q.lora_up.weight":
            rng.randn(dim, 2).astype(np.float32) * 0.02,
        "lora_unet_blocks_1_self_attn_q.alpha": np.array(2.0, np.float32),
    }
    path = str(tmp_path / "l.safetensors")
    save_file(lora, path)
    w_before = np.asarray(pipe.models.dit_params["blocks"]["self_attn"]
                          ["q"]["weight"][1]).copy()
    t, h, w = 5, 32, 32
    video = rng.rand(1, 3, t, h, w).astype(np.float32)
    s = FlexAMV2VSampler()
    out, = s.process(pipe, "x", video, video_length=t, base_resolution=32,
                     steps=1, density=10.0, loras=[path],
                     strength_model=[1.0], lora_cache=True)
    assert np.isfinite(out).all()
    w_merged = np.asarray(pipe.models.dit_params["blocks"]["self_attn"]
                          ["q"]["weight"][1])
    assert np.abs(w_merged - w_before).max() > 0
    # cached pristine weights restore on a different lora set
    out, = s.process(pipe, "x", video, video_length=t, base_resolution=32,
                     steps=1, density=10.0, loras=[path],
                     strength_model=[0.5], lora_cache=True)
    w_half = np.asarray(pipe.models.dit_params["blocks"]["self_attn"]
                        ["q"]["weight"][1])
    np.testing.assert_allclose(w_half - w_before,
                               (w_merged - w_before) * 0.5,
                               rtol=1e-4, atol=1e-6)


def test_loader_config_drives_geometry():
    """The config input must shape what gets built — a post-hoc cfg swap
    left params at the default geometry."""
    import dataclasses

    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.nodes import LoadFlexAMModel

    tiny = tiny_test_config()
    custom = dataclasses.replace(
        tiny, dit=dataclasses.replace(tiny.dit, num_layers=3))
    pipe, = LoadFlexAMModel().loadmodel(model="x", random_init="tiny",
                                        config=custom)
    assert pipe.cfg.dit.num_layers == 3
    # the scan-stacked block params really carry 3 layers
    leaf = pipe.models.dit_params["blocks"]["self_attn"]["q"]["weight"]
    assert np.asarray(leaf).shape[0] == 3


def test_every_node_satisfies_comfyui_protocol():
    """ComfyUI's loader requires INPUT_TYPES/RETURN_TYPES/FUNCTION/
    CATEGORY on every node class, and calls FUNCTION with every input as
    a keyword — each declared input name must be a parameter of the
    bound method."""
    import inspect
    for name, cls in NODE_CLASS_MAPPINGS.items():
        assert callable(getattr(cls, "INPUT_TYPES", None)), name
        assert isinstance(cls.RETURN_TYPES, tuple), name
        fn = getattr(cls, cls.FUNCTION)
        assert cls.CATEGORY, name
        spec = cls.INPUT_TYPES()
        params = inspect.signature(fn).parameters
        takes_var_kw = any(p.kind == inspect.Parameter.VAR_KEYWORD
                           for p in params.values())
        for section in ("required", "optional"):
            for inp in spec.get(section, {}):
                assert takes_var_kw or inp in params, (name, inp)
        if hasattr(cls, "RETURN_NAMES"):
            assert len(cls.RETURN_NAMES) == len(cls.RETURN_TYPES), name


def test_reference_workflow_asset_resolves():
    """The reference's OWN shipped graph (`assets/flexam_workflow.json`)
    drops in: every FlexAM-owned node type resolves here and each node's
    linked input names exist on our INPUT_TYPES. (The remaining types —
    VHS video helpers, SAM2/GroundingDino mask creation, ComfyUI core —
    are third-party ecosystem nodes the reference also does not ship.)"""
    import json
    import os
    ref = "/root/reference/assets/flexam_workflow.json"
    if not os.path.exists(ref):
        import pytest
        pytest.skip("reference asset not available")
    wf = json.load(open(ref))
    ours = 0
    for n in wf["nodes"]:
        cls = NODE_CLASS_MAPPINGS.get(n["type"])
        if cls is None:
            continue
        ours += 1
        spec = cls.INPUT_TYPES()
        known = set(spec.get("required", {})) | set(spec.get("optional", {}))
        for inp in n.get("inputs", []) or []:
            assert inp["name"] in known, (n["type"], inp["name"])
    assert ours >= 5        # loader, sampler, textbox, predict, visualize


def test_workflow_jsons_reference_known_nodes():
    import json
    import os
    wf_dir = os.path.join(os.path.dirname(__file__), "..",
                          "flexam_tpu", "workflows")
    builtin = {"VHS_LoadVideo", "VHS_VideoCombine", "LoadImage", "Note",
               "PrimitiveNode"}
    for f in os.listdir(wf_dir):
        wf = json.load(open(os.path.join(wf_dir, f)))
        for n in wf["nodes"]:
            assert (n["type"] in NODE_CLASS_MAPPINGS
                    or n["type"] in builtin), (f, n["type"])
        ids = {n["id"] for n in wf["nodes"]}
        for link in wf["links"]:
            assert link[1] in ids and link[3] in ids
