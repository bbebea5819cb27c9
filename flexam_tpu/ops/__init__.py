from flexam_tpu.ops.flash_attention import flash_attention  # noqa: F401
from flexam_tpu.ops.int8_attention import int8_flash_attention  # noqa: F401
