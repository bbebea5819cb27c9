"""Perception subsystem — native replacements for the reference's
external GPU checkpoints (all shipped as EMPTY submodules in the
snapshot, SURVEY.md §2.6):

  densetrack3d  DELTA-family dense 3D tracker (trainability-tested;
                shape-mapped densetrack3d.pth loader)
  unidepth      UniDepth V2 metric depth — ORACLE-PARITY port of the
                vendored torch source (exact checkpoint name map)
  moge          MoGe-2 point map / mask / intrinsics (exact focal/shift
                camera-recovery solver)
  dwpose        DWPose person detection + pose decode (parity vs the
                vendored pre/post; cv2.dnn ONNX inference)
  pose_render   OpenPose skeleton drawing (pixel-exact vs vendored)
  pose_solver   camera extrinsics from 3D tracks (robust Kabsch) — the
                no-checkpoint fallback for the VGGT/Pi3 pose step
  pi3           native Pi3 multi-view pose model (permutation-equivariant
                alternating-attention decoder; exact reference surface)
  tracking      optical-flow baseline tracker + DELTA dispatch
  depth         pluggable depth-backend registry
  poses         VGGT/Pi3 pose-encoding post-processing + npz fixtures

Checkpoint env vars: FLEXAM_DELTA_CKPT, FLEXAM_UNIDEPTH_CKPT,
FLEXAM_MOGE_CKPT, FLEXAM_PI3_CKPT, FLEXAM_DWPOSE_DET +
FLEXAM_DWPOSE_POSE. Every path degrades gracefully without weights
(flow tracker, luminance depth, Kabsch poses, fixtures)."""

from flexam_tpu.perception.depth import (  # noqa: F401
    estimate_depth,
    register_depth_backend,
)
from flexam_tpu.perception.poses import (  # noqa: F401
    pi3_poses_to_extri_intri,
    pose_encoding_to_extri_intri,
    poses_npz_to_extri_intri,
    quat_to_rotmat,
    rotmat_to_quat,
)
from flexam_tpu.perception.pose_solver import (  # noqa: F401
    default_intrinsics,
    solve_camera_poses,
)
from flexam_tpu.perception.tracking import (  # noqa: F401
    find_delta_checkpoint,
    track_video_delta,
    track_video_flow,
)


def __getattr__(name):
    # DenseTrack3D pulls in jax; keep the package import light for
    # host-only users (depth/pose fixtures).
    if name in ("DenseTrack3D", "DensePredictor3D", "load_densetrack3d",
                "DenseTrack3DConfig"):
        from flexam_tpu.perception import densetrack3d as _m
        return getattr(_m, name)
    if name in ("UniDepthV2", "UniDepthV2Config", "load_unidepth",
                "predict_depth_video"):
        from flexam_tpu.perception import unidepth as _m
        return getattr(_m, name)
    if name in ("MoGeModel", "MoGeConfig", "load_moge",
                "recover_focal_shift"):
        from flexam_tpu.perception import moge as _m
        return getattr(_m, name)
    if name in ("Pi3", "Pi3Config", "load_pi3", "load_images_as_tensor",
                "pi3_video_poses"):
        from flexam_tpu.perception import pi3 as _m
        return getattr(_m, name)
    if name in ("VGGT", "VGGTConfig", "load_vggt", "vggt_video_poses"):
        from flexam_tpu.perception import vggt as _m
        return getattr(_m, name)
    if name in ("ZoeDepth", "ZoeDepthConfig", "load_zoedepth",
                "zoe_depth_video"):
        from flexam_tpu.perception import zoedepth as _m
        return getattr(_m, name)
    if name in ("track_video_flow_device", "dense_flow"):
        from flexam_tpu.perception import flow_jax as _m
        return getattr(_m, name)
    if name in ("DWPoseDetector", "dwpose_video"):
        from flexam_tpu.perception import dwpose as _m
        return getattr(_m, name)
    if name in ("render_pose_video", "draw_pose", "wholebody_to_openpose"):
        from flexam_tpu.perception import pose_render as _m
        return getattr(_m, name)
    raise AttributeError(name)
