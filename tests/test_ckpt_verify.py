"""Checkpoint-map verification (VERDICT r2 item 8 + ADVICE r2).

The shape-signature mappers (DELTA/MoGe — sources absent from the
reference snapshot) must not serve low-coverage loads silently: coverage
is summarized per module, dispatch falls back to the flow tracker, and
load_moge refuses outright. Mirrors the reference's own load report
(`wan_transformer3d_FlexAM.py:1321-1329`)."""

import os

import numpy as np
import pytest

from flexam_tpu.io.verify_load import (check_mapping, format_mapping_report,
                                       summarize_mapping)


def _report(loaded, missed, unused=()):
    return {"loaded": list(loaded), "missed": list(missed),
            "unused": list(unused)}


def test_summary_groups_by_module():
    rep = _report(
        loaded=["['enc']['conv1']['weight']", "['enc']['conv1']['bias']",
                "['dec']['conv']['weight']"],
        missed=["['dec']['conv']['bias']", "['head']['w']"],
        unused=["spare.tensor"])
    s = summarize_mapping(rep, depth=1)
    assert s["n_loaded"] == 3 and s["n_total"] == 5 and s["n_unused"] == 1
    assert s["modules"]["enc"]["frac"] == 1.0
    assert s["modules"]["dec"]["loaded"] == 1
    assert s["modules"]["dec"]["total"] == 2
    assert s["modules"]["head"]["loaded"] == 0
    assert abs(s["overall"] - 0.6) < 1e-9


def test_scan_stacked_index_components_skipped():
    # stacked block paths like ['blocks'][3]['q'] group under blocks/q,
    # not under the index
    rep = _report(loaded=["['blocks'][0]['q']", "['blocks'][1]['q']"],
                  missed=["['blocks'][0]['k']"])
    s = summarize_mapping(rep, depth=2)
    assert set(s["modules"]) == {"blocks/q", "blocks/k"}


def test_check_mapping_fails_on_empty_module(capsys):
    rep = _report(loaded=["['a']['w']"] * 9, missed=["['b']['w']"])
    # overall 90% passes the threshold but module b loaded NOTHING
    assert not check_mapping(rep, threshold=0.9, quiet=False)
    out = capsys.readouterr().out
    assert "NO loaded tensors" in out


def test_check_mapping_strict_raises():
    rep = _report(loaded=["['a']['w']"], missed=["['a']['b']"] * 9)
    with pytest.raises(ValueError, match="coverage"):
        check_mapping(rep, strict=True, quiet=True)


def test_format_report_marks_partial_modules():
    rep = _report(loaded=["['enc']['w']"], missed=["['enc']['b']"])
    txt = format_mapping_report("x", summarize_mapping(rep))
    assert "50.0%" in txt and "!" in txt


def test_dispatch_falls_back_on_low_coverage(tmp_path, monkeypatch):
    """A densetrack3d.pth whose tensors match nothing must route to the
    flow tracker, not serve random weights (ADVICE r2 medium)."""
    import torch

    from flexam_tpu.perception import tracking

    ckpt = tmp_path / "densetrack3d.pth"
    torch.save({"model": {"junk.weight": torch.zeros(7, 13)}}, str(ckpt))

    calls = {}

    def fake_flow(video, density=10, depth_backend=None):
        calls["flow"] = True
        t = video.shape[0] if video.ndim == 4 else video.shape[2]
        return (np.zeros((t, 4, 3), np.float32), np.ones((t, 4), bool))

    monkeypatch.setattr(tracking, "track_video_flow", fake_flow)
    monkeypatch.delenv("FLEXAM_FORCE_DELTA", raising=False)
    video = np.random.rand(3, 16, 16, 3).astype(np.float32)
    tracks, vis = tracking.dispatch_tracking(video, "delta",
                                             ckpt=str(ckpt))
    assert calls.get("flow"), "low-coverage ckpt must fall back to flow"
    assert tracks.shape[0] == 3


def test_load_moge_refuses_low_coverage(tmp_path, monkeypatch):
    import torch

    from flexam_tpu.perception.moge import MoGeConfig, load_moge

    ckpt = tmp_path / "model.pt"
    torch.save({"junk.weight": torch.zeros(5, 5)}, str(ckpt))
    monkeypatch.delenv("FLEXAM_MOGE_BESTEFFORT", raising=False)
    tiny = MoGeConfig(patch_size=14, embed_dim=32, depth=2, num_heads=2,
                      output_idx=(1, 2), head_dim=16,
                      predict_normal=False)
    with pytest.raises(ValueError, match="coverage"):
        load_moge(str(ckpt), tiny)
    monkeypatch.setenv("FLEXAM_MOGE_BESTEFFORT", "1")
    model = load_moge(str(ckpt), tiny)   # opt-in accepts the partial load
    assert model.load_ok is False


def test_verify_ckpt_cli(tmp_path):
    import torch

    from flexam_tpu.tools.verify_ckpt import main

    ckpt = tmp_path / "densetrack3d.pth"
    torch.save({"model": {"junk.weight": torch.zeros(3, 3)}}, str(ckpt))
    assert main(["--model", "delta", str(ckpt)]) == 1  # fails loudly


def test_verify_ckpt_single_file_kinds(tmp_path):
    """The round-3 loader families: a junk file fails every kind; a
    correctly-shaped svd-clip file passes."""
    from safetensors.numpy import save_file

    from flexam_tpu.tools.verify_ckpt import verify

    junk = str(tmp_path / "junk.safetensors")
    save_file({"junk": np.zeros((2, 2), np.float32)}, junk)
    for kind in ("flux", "flux-ae", "svd-unet", "svd-vae", "svd-clip"):
        assert verify(kind, junk) is False, kind

    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=16, hidden_act="gelu")
    torch.manual_seed(0)
    m = transformers.CLIPVisionModelWithProjection(cfg).eval()
    good = str(tmp_path / "clip.safetensors")
    save_file({k: np.ascontiguousarray(v.numpy())
               for k, v in m.state_dict().items()}, good)
    assert verify("svd-clip", good) is True
