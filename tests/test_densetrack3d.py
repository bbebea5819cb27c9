"""DenseTrack3D (DELTA-family dense 3D tracker) — structural tests.

No oracle exists: the DELTA submodule is EMPTY in the reference snapshot
(SURVEY.md §2.6), so parity-vs-source is impossible; these tests pin the
contracts instead: the reference call surface (`pipelines.py:1374-1494`),
shape/ordering semantics of the dense grid, the convex-upsample
invariant, correlation-volume correctness vs a naive implementation, and
torch-checkpoint round-tripping through the shape-mapped loader.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flexam_tpu.perception.densetrack3d import (
    DenseTrack3D,
    DensePredictor3D,
    DenseTrack3DConfig,
    _window_starts,
    bilinear_sample,
    build_corr_volumes,
    convex_upsample,
    densetrack3d_init,
    map_torch_state_dict,
    sample_corr,
    upsample_weights,
)

TINY = dict(stride=4, window_len=8, model_resolution=(64, 96),
            upsample_factor=4, latent_dim=32, dim=64, num_heads=4,
            num_blocks=2, iters=2, num_virtual_tracks=8,
            compute="float32")   # tight tolerances; production is bf16


@pytest.fixture(scope="module")
def tiny_model():
    return DenseTrack3D(**TINY)


def test_reference_call_surface(tiny_model):
    """Output dict matches what `generate_tracking_DELTA` consumes:
    trajs_uv [B,T,N,2], vis [B,T,N], trajs_depth [B,T,N,1], dense_reso
    (h, w) with N = h*w row-major (`pipelines.py:1462-1484`)."""
    rng = np.random.RandomState(0)
    t, h_in, w_in = 11, 72, 104
    video = rng.rand(1, t, 3, h_in, w_in).astype(np.float32)
    depth = 1.0 + rng.rand(1, t, 1, h_in, w_in).astype(np.float32)
    out = DensePredictor3D(tiny_model)(video, depth, grid_query_frame=0)
    hd, wd = out["dense_reso"]
    assert (hd, wd) == (64, 96)          # model_res/stride*upsample
    n = hd * wd
    assert out["trajs_uv"].shape == (1, t, n, 2)
    assert out["vis"].shape == (1, t, n)
    assert out["trajs_depth"].shape == (1, t, n, 1)
    uv = np.asarray(out["trajs_uv"])
    assert np.isfinite(uv).all()
    # uv are in INPUT pixel coordinates: the reference rasterizes them
    # directly at video scale
    assert uv[..., 0].mean() == pytest.approx(w_in / 2, rel=0.35)
    assert uv[..., 1].mean() == pytest.approx(h_in / 2, rel=0.35)
    vis = np.asarray(out["vis"])
    assert (vis >= 0).all() and (vis <= 1).all()
    assert (np.asarray(out["trajs_depth"]) > 0).all()
    # row-major (h w) flattening: the density subsample in the reference
    # reshapes with h=dense_reso[0] — frame 0 tracks sit on their query
    # pixels, so track wd is the start of row 1
    f0 = uv[0, 0].reshape(hd, wd, 2)
    assert abs(f0[0, :, 1].mean() - f0[0, 0, 1]) < 2.0


def test_density_downsample_matches_reference_rearrange(tiny_model):
    """predictor(downsample=k) == reference's rearrange + [::k, ::k]
    (`pipelines.py:1466-1484`) applied to the full dense output."""
    rng = np.random.RandomState(1)
    video = rng.rand(1, 9, 3, 64, 96).astype(np.float32)
    depth = 1.0 + rng.rand(1, 9, 1, 64, 96).astype(np.float32)
    pred = DensePredictor3D(tiny_model)
    full = pred(video, depth)
    sub = pred(video, depth, downsample=10)
    hd, wd = full["dense_reso"]
    ref = np.asarray(full["trajs_uv"])[0].reshape(9, hd, wd, 2)
    ref = ref[:, ::10, ::10].reshape(9, -1, 2)
    np.testing.assert_allclose(np.asarray(sub["trajs_uv"])[0], ref,
                               rtol=1e-5, atol=1e-5)
    assert sub["dense_reso"] == ((hd + 9) // 10, (wd + 9) // 10)


def test_window_starts_cover_all_frames():
    cfg = DenseTrack3DConfig(window_len=16)
    for t in (16, 17, 24, 40, 97):
        starts = _window_starts(t, cfg)
        covered = set()
        for s in starts:
            covered.update(range(s, s + 16))
        assert covered == set(range(t)), t
        assert starts[0] == 0 and starts[-1] + 16 >= t


def test_bilinear_sample_matches_numpy():
    rng = np.random.RandomState(2)
    field = rng.rand(7, 9, 3).astype(np.float32)
    pts = np.stack([rng.uniform(0, 8, 50), rng.uniform(0, 6, 50)],
                   axis=-1).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(field), jnp.asarray(pts)))
    x, y = pts[:, 0], pts[:, 1]
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    x0, y0 = np.minimum(x0, 7), np.minimum(y0, 5)
    fx, fy = (x - x0)[:, None], (y - y0)[:, None]
    want = (field[y0, x0] * (1 - fx) * (1 - fy)
            + field[y0, x0 + 1] * fx * (1 - fy)
            + field[y0 + 1, x0] * (1 - fx) * fy
            + field[y0 + 1, x0 + 1] * fx * fy)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_corr_volume_matches_naive():
    """Diagonal shifted-product volume == naive per-cell dot products."""
    cfg = DenseTrack3DConfig(**{**TINY, "corr_levels": 2,
                                "corr_volume_radius": 2, "corr_radius": 1})
    rng = np.random.RandomState(3)
    tw, h, w, c = 3, 8, 12, 5
    f0 = rng.rand(h, w, c).astype(np.float32)
    fmaps = rng.rand(tw, h, w, c).astype(np.float32)
    vols = build_corr_volumes(jnp.asarray(f0), jnp.asarray(fmaps), cfg)
    rv = cfg.corr_volume_radius
    v0 = np.asarray(vols[0])          # [tw, h, w, S, S]
    pad = np.pad(fmaps, ((0, 0), (rv, rv), (rv, rv), (0, 0)), mode="edge")
    for t in (0, 2):
        for (y, x) in [(0, 0), (3, 7), (7, 11)]:
            for (sy, sx) in [(-2, -2), (0, 0), (1, -1), (2, 2)]:
                want = f0[y, x] @ pad[t, y + sy + rv, x + sx + rv]
                want /= np.sqrt(c)
                got = v0[t, y, x, sy + rv, sx + rv]
                np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sample_corr_zero_disp_center():
    """At zero displacement the center tap reads the volume center."""
    cfg = DenseTrack3DConfig(**{**TINY, "corr_levels": 1,
                                "corr_volume_radius": 2, "corr_radius": 1})
    rng = np.random.RandomState(4)
    tw, h, w = 2, 4, 6
    s = 2 * cfg.corr_volume_radius + 1
    vol = jnp.asarray(rng.rand(tw, h, w, s, s).astype(np.float32))
    disp = jnp.zeros((tw, h, w, 2))
    out = np.asarray(sample_corr([vol], disp, cfg))
    taps = (2 * cfg.corr_radius + 1) ** 2
    assert out.shape == (tw, h, w, taps)
    center = taps // 2
    np.testing.assert_allclose(
        out[..., center], np.asarray(vol)[..., s // 2, s // 2], rtol=1e-5)


def test_convex_upsample_invariant():
    """Every fine value is a convex combination of the coarse 3x3
    neighborhood -> bounded by the local coarse min/max."""
    cfg = DenseTrack3DConfig(**TINY)
    rng = np.random.RandomState(5)
    h, w = cfg.grid_hw
    f0 = jnp.asarray(rng.rand(h, w, cfg.latent_dim).astype(np.float32))
    params = densetrack3d_init(jax.random.key(0), cfg)
    wts = upsample_weights(params["upsampler"], f0, cfg)
    np.testing.assert_allclose(np.asarray(wts).sum(axis=2), 1.0, atol=1e-5)
    field = jnp.asarray(rng.rand(h, w, 2).astype(np.float32))
    up = np.asarray(convex_upsample(field, wts, cfg.upsample_factor))
    assert up.shape == (h * 4, w * 4, 2)
    assert up.min() >= float(field.min()) - 1e-5
    assert up.max() <= float(field.max()) + 1e-5


def test_torch_checkpoint_roundtrip(tiny_model, tmp_path):
    """Saving the params as a torch state_dict (conv kernels in OIHW like
    torch) and loading through the shape-mapper reproduces identical
    predictions — the loader is exact when names/shapes line up."""
    torch = pytest.importorskip("torch")
    flat, _ = jax.tree_util.tree_flatten_with_path(tiny_model.params)
    sd = {}
    for i, (path, leaf) in enumerate(flat):
        arr = np.asarray(leaf)
        if arr.ndim == 4:      # HWIO -> torch OIHW
            arr = arr.transpose(3, 2, 0, 1)
        sd[f"tensor_{i}"] = torch.from_numpy(np.ascontiguousarray(arr))
    pth = tmp_path / "densetrack3d.pth"
    torch.save({"model": sd}, pth)

    fresh = DenseTrack3D(**TINY, seed=99)
    rng = np.random.RandomState(6)
    video = rng.rand(1, 8, 3, 64, 96).astype(np.float32)
    depth = 1.0 + rng.rand(1, 8, 1, 64, 96).astype(np.float32)
    base = np.asarray(DensePredictor3D(tiny_model)(video, depth)["trajs_uv"])
    before = np.asarray(DensePredictor3D(fresh)(video, depth)["trajs_uv"])
    assert not np.allclose(base, before)

    from flexam_tpu.perception.densetrack3d import load_densetrack3d
    loaded = load_densetrack3d(str(pth), model=fresh)
    after = np.asarray(DensePredictor3D(loaded)(video, depth)["trajs_uv"])
    np.testing.assert_allclose(after, base, rtol=1e-5, atol=1e-4)


def test_mapper_reports_unmatched():
    cfg = DenseTrack3DConfig(**TINY)
    params = densetrack3d_init(jax.random.key(0), cfg)
    sd = {"odd_tensor": np.zeros((13, 17), np.float32)}
    _, report = map_torch_state_dict(params, sd)
    assert "odd_tensor" in report["unused"]
    assert len(report["missed"]) > 0
    with pytest.raises(ValueError):
        map_torch_state_dict(params, sd, strict=True)


def test_short_clip_padding(tiny_model):
    """T < window_len pads internally and slices back."""
    rng = np.random.RandomState(7)
    video = rng.rand(1, 5, 3, 64, 96).astype(np.float32)
    depth = 1.0 + rng.rand(1, 5, 1, 64, 96).astype(np.float32)
    out = DensePredictor3D(tiny_model)(video, depth)
    assert out["trajs_uv"].shape[1] == 5
    assert np.isfinite(np.asarray(out["trajs_uv"])).all()


def test_track_video_delta_wrapper(tiny_model):
    """generate_tracking_DELTA-equivalent wrapper: video -> depth backend
    -> tracker -> density subsample, in the rasterizer's [T,N,3] contract
    (`pipelines.py:1461-1494`)."""
    from flexam_tpu.perception import track_video_delta
    rng = np.random.RandomState(8)
    video = rng.rand(9, 40, 56, 3).astype(np.float32)      # [T,H,W,3]
    tracks, vis = track_video_delta(video, density=12, model=tiny_model)
    assert tracks.ndim == 3 and tracks.shape[0] == 9
    assert tracks.shape[2] == 3 and tracks.shape[1] > 0
    assert vis.shape == tracks.shape[:2] and vis.dtype == bool
    assert np.isfinite(tracks).all()
    assert (tracks[..., 2] > 0).all()                      # metric depth
