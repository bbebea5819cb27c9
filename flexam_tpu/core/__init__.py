from flexam_tpu.core.layers import (  # noqa: F401
    rms_norm,
    layer_norm,
    gelu_tanh,
    silu,
    group_norm,
    sinusoidal_embedding_1d,
    linear,
    linear_init,
)
from flexam_tpu.core.rope import (  # noqa: F401
    rope_angles,
    riflex_rope_angles,
    build_video_rope,
    apply_rope,
)
