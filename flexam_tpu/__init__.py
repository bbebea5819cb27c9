"""flexam_tpu — a TPU-native rebuild of the FlexAM controllable video-diffusion stack.

FlexAM ("Flexible Appearance-Motion Decomposition for Versatile Video Generation
Control") decomposes a video into appearance (a repainted/reference first frame)
and motion (dense 3D point tracks rasterized into control videos), then
regenerates a video following the motion via a Wan2.2-Fun-5B control DiT.

This package is a from-scratch JAX/XLA/Pallas implementation designed for TPU:
  * functional models over parameter pytrees, jitted once,
  * Pallas flash attention on the MXU,
  * whole-clip causal 3D VAE (streaming-equivalent, XLA-fused),
  * fused flow-matching sampler loops under `lax.scan`,
  * SPMD sharding over a `jax.sharding.Mesh` (dp/sp axes) instead of NCCL.

Reference behavior surface: IGL-HKUST/FlexAM (PyTorch/CUDA), see SURVEY.md.
"""

__version__ = "0.1.0"

from flexam_tpu.config import (  # noqa: F401
    DiTConfig,
    VAEConfig,
    T5Config,
    SchedulerConfig,
    FlexAMConfig,
    WAN22_5B_FLEXAM,
    tiny_test_config,
)


def __getattr__(name):
    """Lazy top-level API (keeps `import flexam_tpu` light)."""
    if name == "FlexAMGenerationPipeline":
        from flexam_tpu.pipeline import FlexAMGenerationPipeline
        return FlexAMGenerationPipeline
    if name == "FlexAMModels":
        from flexam_tpu.pipeline import FlexAMModels
        return FlexAMModels
    if name == "FlexAMOrchestrator":
        from flexam_tpu.orchestrator import FlexAMOrchestrator
        return FlexAMOrchestrator
    if name == "FirstFrameRepainter":
        from flexam_tpu.repaint import FirstFrameRepainter
        return FirstFrameRepainter
    raise AttributeError(name)
