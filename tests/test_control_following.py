"""The FlexAM system property, end to end (VERDICT r3 item 1): a model
TRAINED on track-conditioned clips generates video that FOLLOWS held-out
tracks — measured by re-tracking the generated pixels with the repo's own
flow tracker and by the brightness-centroid trajectory, each scored
against the conditioned track AND a mismatched alternative.

Reference counterpart: the pipelines.py apply_tracking flow
(`/root/reference/pipelines.py:1905` -> `pipeline...FlexAM.py:843-949`)
whose demo videos are the only "proof" the reference ships.

The trained stack (tiny VAE recon + tiny FlexAM DiT flow-matching, both
via repo trainers on pipeline-built conditioning) takes ~5 min on this
1-core host, so it is cached on disk keyed by a version stamp — delete
tests/.cache_control_follow.npz after changing the training recipe.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.tools import control_follow as cf

@pytest.fixture(scope="module")
def stack():
    return cf.cached_stack(cf.default_cache_path(), cf.CACHE_VERSION)


@pytest.fixture(scope="module")
def adherence(stack):
    return cf.evaluate_adherence(stack, cf.default_holdout_cases(),
                                 num_inference_steps=20)


def test_vae_learns_reconstruction(stack):
    from flexam_tpu.models.vae import vae_decode, vae_encode_mode

    losses = stack["vae_losses"]
    assert losses[-1] < 0.03, losses[-1]
    vid, centers = cf.make_blob_clip([16, 16], [48, 48])
    z = vae_encode_mode(stack["vae_params"], stack["cfg"].vae,
                        jnp.asarray(vid[None] * 2 - 1))
    rec = np.asarray(vae_decode(stack["vae_params"], stack["cfg"].vae, z)
                     )[0] * 0.5 + 0.5
    traj = cf.centroid_trajectory(rec)
    err = np.linalg.norm(traj - centers, axis=1)
    assert err.mean() < 4.0, err


def test_dit_training_converges(stack):
    losses = stack["dit_losses"]
    assert np.mean(losses[-100:]) < 0.3 * np.mean(losses[:100]), (
        np.mean(losses[:100]), np.mean(losses[-100:]))


def test_generated_video_follows_heldout_tracks(adherence):
    """THE functional gate: centroid trajectory of the generated video
    matches the conditioned track, and is far closer to it than to the
    mismatched alternative (prototype: ~5 px vs ~19 px)."""
    for r in adherence:
        assert r["centroid_err"] < 12.0, (r["case"], r["centroid_err"])
        assert r["centroid_err_alt"] > 1.6 * r["centroid_err"], (
            r["case"], r["centroid_err"], r["centroid_err_alt"])


def test_retracked_motion_matches_conditioning(adherence):
    """Re-track the OUTPUT with the repo's own flow tracker: the
    recovered blob displacement must match the conditioned displacement
    and discriminate against the alternative (prototype: 8-22 px err vs
    ~65 px mismatched, 36-px motions)."""
    for r in adherence:
        assert r["tracker_disp"] is not None, r["case"]
        assert r["tracker_err"] < 35.0, (r["case"], r["tracker_err"])
        assert r["tracker_err"] < 0.7 * r["tracker_err_alt"], (
            r["case"], r["tracker_err"], r["tracker_err_alt"])


def test_artifact_dump(stack, tmp_path):
    """The reference's artifact set (`pipelines.py:1852-1903`): tracking /
    depth / cos control videos + generated clip, as playable mp4s."""
    out = str(tmp_path / "artifacts")
    res = cf.evaluate_adherence(stack, cf.default_holdout_cases()[:1],
                                num_inference_steps=4,
                                artifacts_dir=out)
    assert len(res) == 1
    files = os.listdir(out)
    for want in ("case0_generated.mp4", "case0_tracking.mp4",
                 "case0_depth.mp4", "case0_cos_0.mp4"):
        assert want in files, files
    for f in files:
        assert os.path.getsize(os.path.join(out, f)) > 0
