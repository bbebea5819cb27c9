"""Training-data layer tests (bucket sampler, timestep sampler, random
masks, annotation-driven dataset)."""

import json
import os

import jax
import numpy as np
import pytest

from flexam_tpu.data import (ASPECT_RATIO_512, AspectRatioBucketSampler,
                             DiscreteSampling, get_closest_ratio)
from flexam_tpu.data.dataset import ImageVideoControlDataset, get_random_mask


def test_aspect_table_matches_reference_values():
    # spot-check entries against the reference table values
    # (`bucket_sampler.py:12-23`)
    assert ASPECT_RATIO_512["1"] == (512.0, 512.0)
    assert ASPECT_RATIO_512["0.25"] == (256.0, 1024.0)
    assert ASPECT_RATIO_512["4"] == (1024.0, 256.0)
    assert ASPECT_RATIO_512["0.57"] == (384.0, 672.0)
    size, ratio = get_closest_ratio(512, 896)
    assert size == (384.0, 672.0) and ratio == pytest.approx(0.57)


def test_bucket_sampler_groups_consistent():
    rng = np.random.RandomState(0)
    sizes = [(512, 512)] * 10 + [(512, 896)] * 10
    is_video = [False] * 10 + [True] * 10
    sampler = AspectRatioBucketSampler(sizes, is_video, batch_size=4)
    for batch in sampler:
        kinds = {is_video[i] for i in batch}
        ratios = {get_closest_ratio(*sizes[i])[1] for i in batch}
        assert len(kinds) == 1 and len(ratios) == 1
        assert len(batch) == 4


def test_discrete_sampling_sp_groups():
    """Ranks in the same SP group sample from the same sigma interval
    (`discrete_sampler.py:5-52`)."""
    key = jax.random.PRNGKey(0)
    world, sp = 8, 4
    samplers = [DiscreteSampling(1000, uniform_sampling=True, sp_size=sp,
                                 world_size=world, rank=r)
                for r in range(world)]
    idx = [np.asarray(s(16, key)) for s in samplers]
    # group width 4 -> ranks 0-3 share interval [0,500), 4-7 share [500,1000)
    for r in range(4):
        assert idx[r].min() >= 0 and idx[r].max() < 500
    for r in range(4, 8):
        assert idx[r].min() >= 500 and idx[r].max() < 1000


def test_random_mask_image_start_only():
    m = get_random_mask((9, 1, 8, 8), np.random.RandomState(0))
    assert m[0].sum() == 0 and (m[1:] == 1).all()


def test_dataset_schema(tmp_path):
    import cv2
    h, w, t = 64, 64, 9

    def write_video(name):
        p = str(tmp_path / name)
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 16, (w, h))
        for i in range(t):
            vw.write(np.full((h, w, 3), i * 20, np.uint8))
        vw.release()
        return name

    ann = [{
        "file_path": write_video("v.mp4"),
        "control_file_path": write_video("v_control.mp4"),
        "depth_file_path": write_video("v_depth.mp4"),
        "cos_file_paths": [write_video("v_cos_i_0.mp4")],
        "density": 10,
        "text": "a test video",
        "generate_type": "full_tracking",
    }]
    # missing cos levels are synthesized files too
    for i in range(1, 4):
        write_video(f"v_cos_i_{i}.mp4")
    ann_path = str(tmp_path / "ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)

    ds = ImageVideoControlDataset(ann_path, video_sample_size=(h, w),
                                  video_sample_n_frames=t)
    s = ds[0]
    assert s["pixel_values"].shape == (3, t, h, w)
    assert s["control_pixel_values"].shape == (3, t, h, w)
    assert s["depth_pixel_values"].shape == (3, t, h, w)
    assert len(s["cos_pixel_values_list"]) == 4
    assert s["density"] == pytest.approx(0.1)
    assert s["mask"].shape == (1, t, h, w)
    assert s["mask"][:, 0].sum() == 0
    assert -1.0 <= s["pixel_values"].min() and s["pixel_values"].max() <= 1.0


def test_pytree_save_restore(tmp_path):
    import jax.numpy as jnp
    from flexam_tpu.io.checkpoints import restore_pytree, save_pytree

    tree = {"a": {"w": np.arange(6, np.float32).reshape(2, 3)
                  if False else np.arange(6, dtype=np.float32).reshape(2, 3),
                  "b16": jnp.ones((4,), jnp.bfloat16) * 1.5},
            "list": [np.zeros(2), np.ones(3)]}
    p = str(tmp_path / "ckpt.npz")
    save_pytree(p, tree)
    restored = restore_pytree(p, tree)
    np.testing.assert_array_equal(restored["a"]["w"], tree["a"]["w"])
    assert restored["a"]["b16"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(restored["a"]["b16"], np.float32),
                                  np.full((4,), 1.5, np.float32))
    np.testing.assert_array_equal(restored["list"][1], tree["list"][1])


def test_reference_yaml_config_loader():
    from flexam_tpu.config import FlexAMConfig
    c = FlexAMConfig.from_reference_yaml(
        "/root/reference/config/wan2.2/wan_civitai_5b_FlexAM.yaml")
    assert c.dit.add_ref_conv and c.dit.add_cnn_block
    assert c.dit.in_dim_cnn_block == 288 and c.dit.out_dim_cnn_block == 48
    assert c.vae.spatial_compression_ratio == 16
    assert c.t5.dim == 4096 and c.t5.num_layers == 24
    assert c.scheduler.shift == 5.0


def test_bundled_configs_standalone(tmp_path, monkeypatch):
    """The framework ships its own configs (generated via
    to_reference_yaml): every bundled file round-trips to its preset,
    the flagship one equals loading the REFERENCE's own yaml, and
    LoadConfig resolves bundled files without FLEXAM_CONFIG_DIR or a
    reference checkout."""
    import os

    from flexam_tpu.config import (WAN21_FUN_1_3B, WAN21_FUN_14B,
                                   WAN22_5B_BASE, WAN22_5B_FLEXAM,
                                   FlexAMConfig)
    from flexam_tpu.nodes import LoadConfig

    cfg_dir = os.path.join(os.path.dirname(__file__), "..",
                           "flexam_tpu", "configs")
    for name, preset in [
            ("wan2.2/wan_civitai_5b_FlexAM.yaml", WAN22_5B_FLEXAM),
            ("wan2.2/wan_civitai_5b.yaml", WAN22_5B_BASE),
            ("wan2.1/wan_fun_1_3b.yaml", WAN21_FUN_1_3B),
            ("wan2.1/wan_fun_14b.yaml", WAN21_FUN_14B)]:
        got = FlexAMConfig.from_reference_yaml(os.path.join(cfg_dir, name))
        assert (got.dit, got.vae, got.t5, got.scheduler) == \
            (preset.dit, preset.vae, preset.t5, preset.scheduler), name

    if os.path.exists("/root/reference/config"):
        ref = FlexAMConfig.from_reference_yaml(
            "/root/reference/config/wan2.2/wan_civitai_5b_FlexAM.yaml")
        ours = FlexAMConfig.from_reference_yaml(os.path.join(
            cfg_dir, "wan2.2/wan_civitai_5b_FlexAM.yaml"))
        assert ref == ours

    # serializer round-trips an arbitrary modified config too
    import dataclasses
    custom = dataclasses.replace(
        WAN22_5B_FLEXAM,
        dit=dataclasses.replace(WAN22_5B_FLEXAM.dit, num_layers=3))
    f = str(tmp_path / "custom.yaml")
    custom.to_reference_yaml(f)
    back = FlexAMConfig.from_reference_yaml(f)
    assert back.dit == custom.dit

    # LoadConfig: bundled resolution only (a wan2.1 name that exists
    # only in the package), no env var
    monkeypatch.delenv("FLEXAM_CONFIG_DIR", raising=False)
    cfg, = LoadConfig().process("wan2.1/wan_fun_1_3b.yaml")
    assert cfg.dit.num_layers == 30 and cfg.dit.dim == 1536


# ---------------------------------------------------------------------------
# Round-2: color jitter parity + joint image/video dataset (VERDICT item 9)
# ---------------------------------------------------------------------------

def _reference_jitter_namespace():
    """Exec the self-contained color-jitter slice of
    dataset_dasv2_enhanced.py (:388-456) — the module itself imports
    torch/decord, but these functions only need numpy/cv2/random."""
    import random
    import cv2
    src = open("/root/reference/FlexAM/data/dataset_dasv2_enhanced.py"
               ).read().splitlines()
    block = "\n".join(src[387:456])
    ns = {"np": np, "cv2": cv2, "random": random}
    exec(block, ns)
    return ns


def test_color_jitter_parity_vs_reference():
    from flexam_tpu.data.augment import (adjust_brightness, adjust_contrast,
                                         adjust_hue, adjust_saturation)
    ref = _reference_jitter_namespace()
    rng = np.random.RandomState(0)
    video = rng.randint(0, 256, (3, 24, 32, 3), np.uint8)
    for name, ours, factor in [
            ("adjust_brightness", adjust_brightness, 1.3),
            ("adjust_contrast", adjust_contrast, 0.7),
            ("adjust_saturation", adjust_saturation, 1.4),
            ("adjust_hue", adjust_hue, 0.07)]:
        theirs = np.stack([ref[name](f, factor) for f in video])
        np.testing.assert_array_equal(ours(video, factor), theirs,
                                      err_msg=name)


def test_video_color_jitter_shared_factors():
    from flexam_tpu.data.augment import video_color_jitter
    rng = np.random.RandomState(1)
    video = np.repeat(rng.randint(0, 256, (1, 16, 16, 3), np.uint8),
                      4, axis=0)
    out = video_color_jitter(video, rng=np.random.RandomState(2))
    assert out.shape == video.shape and out.dtype == np.uint8
    # identical frames stay identical: one factor set for the whole video
    for f in range(1, 4):
        np.testing.assert_array_equal(out[f], out[0])


def test_image_video_dataset_and_type_batches(tmp_path):
    import cv2
    from PIL import Image
    from flexam_tpu.data.dataset import (ImageVideoDataset,
                                         type_separated_batches)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(2):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.randint(0, 255, (20, 20, 3), np.uint8)
                        ).save(str(p))
        rows.append({"file_path": p.name, "text": f"img {i}",
                     "type": "image"})
    for i in range(2):
        p = str(tmp_path / f"vid{i}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 8,
                             (32, 32))
        for _ in range(9):
            wr.write(rng.randint(0, 255, (32, 32, 3), np.uint8))
        wr.release()
        rows.append({"file_path": os.path.basename(p), "text": f"vid {i}",
                     "type": "video"})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(rows))

    ds = ImageVideoDataset(str(ann), image_sample_size=(16, 16),
                           video_sample_size=(32, 32),
                           video_sample_n_frames=9, enable_jitter=True)
    img = ds[0]
    assert img["pixel_values"].shape == (3, 1, 16, 16)
    assert img["data_type"] == "image" and img["mask"].shape == (1, 1, 16, 16)
    vid = ds[2]
    assert vid["pixel_values"].shape == (3, 9, 32, 32)
    assert vid["data_type"] == "video"

    for batch in type_separated_batches(ds, 2,
                                        rng=np.random.RandomState(3)):
        kinds = {ds.sample_type(i) for i in batch}
        assert len(kinds) == 1, kinds
