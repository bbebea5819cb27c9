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
from flexam_tpu.perception.tracking import track_video_flow  # noqa: F401
