from flexam_tpu.utils.media import (  # noqa: F401
    get_image_latent,
    get_image_to_video_input,
    get_maskvideo_input,
    get_video_input,
    save_video,
    save_videos_grid,
)
from flexam_tpu.utils.masks import (  # noqa: F401
    generate_mask_bg_tracking,
    generate_mask_fg_tracking,
)
from flexam_tpu.utils.timing import metrics, timer  # noqa: F401
from flexam_tpu.utils.fp8 import cast_weights, convert_weights_to_fp8  # noqa: F401
from flexam_tpu.utils.lora import merge_lora, unmerge_lora  # noqa: F401
