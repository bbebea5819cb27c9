from flexam_tpu.conditioning.camera import (  # noqa: F401
    Camera,
    CameraMotionGenerator,
    get_relative_pose,
    ray_condition,
)
from flexam_tpu.conditioning.object_motion import ObjectMotionGenerator  # noqa: F401
from flexam_tpu.conditioning.tracks import (  # noqa: F401
    cosine_positional_encoding,
    tracking_colors,
)
from flexam_tpu.conditioning.rasterize import (  # noqa: F401
    rasterize_cos_videos,
    rasterize_depth_video,
    rasterize_tracking_video,
)
