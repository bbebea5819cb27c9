from flexam_tpu.models.dit import (  # noqa: F401
    init_dit_params,
    dit_forward,
)
