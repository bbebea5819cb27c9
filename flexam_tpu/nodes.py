"""Graph-node front-end (ComfyUI-compatible node surface).

Behavioral reference: `comfyui/wan2_2_fun_flexam/nodes.py` (model loader
:220-357 with 5 GPU-memory modes, V2V sampler :455-687),
`comfyui/comfyui_nodes.py` (FunAttention :102-125, FunRiflex :36-51,
FunCompile :53-100), `comfyui/annotator/nodes.py` (tracking visualizers
:436-863).

The classes follow the ComfyUI node protocol (INPUT_TYPES / RETURN_TYPES /
FUNCTION / CATEGORY + NODE_CLASS_MAPPINGS) so they can be dropped into a
ComfyUI install, but every `process` method is a plain function over numpy
arrays and runs standalone.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from flexam_tpu.data.bucket_sampler import ASPECT_RATIO_512, get_closest_ratio


class LoadFlexAMModel:
    """`LoadWan2_2FunModel_FlexAM` (`wan2_2_fun_flexam/nodes.py:220-357`).

    GPU_memory_mode mapping (the reference's 5 CUDA offload modes ->
    TPU-native equivalents):
      model_full_load            -> bf16 weights resident
      model_full_load_and_qfloat8-> fp8 weight storage (utils/fp8.py)
      model_cpu_offload*         -> host numpy weights, device_put per call
      sequential_cpu_offload     -> host weights + group-streamed VAE
    """

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model": ("STRING", {"default": "Wan2.2-Fun-5B-FLEXAM"}),
            "GPU_memory_mode": ([
                "model_full_load", "model_full_load_and_qfloat8",
                "model_cpu_offload", "model_cpu_offload_and_qfloat8",
                "sequential_cpu_offload"],),
            "model_type": (["Inpaint", "Control"],),
        }}

    RETURN_TYPES = ("FLEXAM_MODEL",)
    FUNCTION = "loadmodel"
    CATEGORY = "FlexAM-TPU"

    def loadmodel(self, model, GPU_memory_mode="model_full_load",
                  model_type="Inpaint", random_init=None):
        import jax
        import jax.numpy as jnp

        from flexam_tpu.config import WAN22_5B_FLEXAM, tiny_test_config
        from flexam_tpu.pipeline import (FlexAMGenerationPipeline,
                                         FlexAMModels)

        if random_init is not None or not os.path.isdir(str(model)):
            from flexam_tpu.models.dit import init_dit_params
            from flexam_tpu.models.t5 import init_t5_params
            from flexam_tpu.models.vae import init_vae_params
            cfg = (tiny_test_config() if random_init == "tiny"
                   else WAN22_5B_FLEXAM)
            dtype = jnp.float32 if random_init == "tiny" else jnp.bfloat16
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
            models = FlexAMModels(
                cfg=cfg, dit_params=init_dit_params(k1, cfg.dit, dtype=dtype),
                vae_params=init_vae_params(k2, cfg.vae),
                t5_params=init_t5_params(k3, cfg.t5))
        else:
            from flexam_tpu.io.checkpoints import (load_dit_checkpoint,
                                                   load_t5_checkpoint,
                                                   load_vae_checkpoint)
            cfg = WAN22_5B_FLEXAM
            dit = load_dit_checkpoint(str(model), cfg.dit)
            models = FlexAMModels(
                cfg=cfg, dit_params=dit,
                vae_params=load_vae_checkpoint(
                    os.path.join(model, "Wan2.2_VAE.pth"), cfg.vae),
                t5_params=load_t5_checkpoint(
                    os.path.join(model, "models_t5_umt5-xxl-enc-bf16.pth"),
                    cfg.t5))
        if "qfloat8" in GPU_memory_mode:
            from flexam_tpu.utils.fp8 import convert_weights_to_fp8
            models.dit_params = convert_weights_to_fp8(models.dit_params)
        pipe = FlexAMGenerationPipeline(models)
        return (pipe,)


class FlexAMV2VSampler:
    """`Wan2_2FunV2VSampler_FlexAM.process` (`wan2_2_fun_flexam/nodes.py
    :455-687`): aspect-bucket resolution snap, TeaCache/cfg-skip/riflex
    wiring, fg/bg mask pipelines, generation."""

    GENERATE_TYPES = ("motion_transfer", "fg_generation", "bg_generation")

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "flexam_model": ("FLEXAM_MODEL",),
            "prompt": ("STRING", {"multiline": True}),
            "video_length": ("INT", {"default": 49}),
            "base_resolution": ("INT", {"default": 512}),
            "steps": ("INT", {"default": 50}),
            "cfg": ("FLOAT", {"default": 6.0}),
            "seed": ("INT", {"default": 43}),
            "scheduler": (["Flow", "Flow_Unipc", "Flow_DPM++"],),
            "generate_type": (list(cls.GENERATE_TYPES),),
            "density": ("FLOAT", {"default": 15.0}),
            "enable_teacache": ("BOOLEAN", {"default": False}),
            "teacache_threshold": ("FLOAT", {"default": 0.10}),
            "cfg_skip_ratio": ("FLOAT", {"default": 0.0}),
            "enable_riflex": ("BOOLEAN", {"default": False}),
            "riflex_k": ("INT", {"default": 6}),
        }}

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "process"
    CATEGORY = "FlexAM-TPU"

    SCHEDULER_MAP = {"Flow": "flow_match_euler", "Flow_Unipc": "flow_unipc",
                     "Flow_DPM++": "flow_dpm"}

    def snap_resolution(self, height, width, base_resolution=512):
        """Aspect-bucket snap (`:474-503`): closest ASPECT_RATIO_512 bucket
        scaled by base_resolution/512, floored to a /16 grid."""
        (bh, bw), _ = get_closest_ratio(height, width, ASPECT_RATIO_512)
        scale = base_resolution / 512.0
        return (int(bh * scale) // 16 * 16, int(bw * scale) // 16 * 16)

    def process(self, flexam_model, prompt, validation_video,
                control_video=None, depth_video=None, cos_videos=None,
                ref_image=None, mask_video=None, video_length=49,
                base_resolution=512, steps=50, cfg=6.0, seed=43,
                scheduler="Flow", generate_type="motion_transfer",
                density=15.0, enable_teacache=False,
                teacache_threshold=0.10, teacache_skip_start=5,
                cfg_skip_ratio=0.0, enable_riflex=False, riflex_k=6,
                negative_prompt=None):
        pipe = flexam_model
        v = np.asarray(validation_video, np.float32)
        h, w = v.shape[-2:]
        th, tw = self.snap_resolution(h, w, base_resolution)
        if (th, tw) != (h, w):
            import jax
            import jax.numpy as jnp
            b, c, t = v.shape[:3]
            v = np.asarray(jax.image.resize(
                jnp.asarray(v), (b, c, t, th, tw), method="bilinear"))

        if enable_riflex:
            lat_frames = (video_length - 1) // \
                pipe.cfg.vae.temporal_compression_ratio + 1
            pipe.enable_riflex(k=riflex_k, L_test=lat_frames)

        # mask pipelines (`:537-572`)
        if generate_type == "fg_generation" and mask_video is not None:
            from flexam_tpu.utils.masks import generate_mask_fg_tracking
            m = generate_mask_fg_tracking(np.asarray(mask_video))
            mask_video = m.astype(np.float32).transpose(1, 0, 2, 3)[None]
        elif generate_type == "bg_generation" and mask_video is not None:
            from flexam_tpu.utils.masks import generate_mask_bg_tracking
            m = generate_mask_bg_tracking(np.asarray(mask_video))
            mask_video = m.astype(np.float32).transpose(1, 0, 2, 3)[None]

        out = pipe.generate(
            video=v, prompt=prompt, mask_video=mask_video,
            control_video=control_video, depth_video=depth_video,
            cos_videos=cos_videos, ref_image=ref_image,
            negative_prompt=negative_prompt,
            num_inference_steps=steps, guidance_scale=cfg, seed=seed,
            density=1.0 / density,      # `:656-677` hardcodes 1/15
            scheduler_type=self.SCHEDULER_MAP[scheduler],
            cfg_skip_ratio=cfg_skip_ratio,
            teacache_thresh=teacache_threshold if enable_teacache else 0.0,
            teacache_skip_start=teacache_skip_start)
        if enable_riflex:
            pipe.disable_riflex()
        return (out,)


class FunAttention:
    """`FunAttention` (`comfyui_nodes.py:102-125`): attention backend
    switch — sets FLEXAM_ATTENTION (our VIDEOX_ATTENTION_TYPE)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"attention_type": (["pallas", "xla"],)}}

    RETURN_TYPES = ("STRING",)
    FUNCTION = "process"
    CATEGORY = "FlexAM-TPU"

    def process(self, attention_type):
        os.environ["FLEXAM_ATTENTION"] = attention_type
        from flexam_tpu.core.attention import _default_backend
        _default_backend.cache_clear()
        return (attention_type,)


class VideoToTrackingVisualize:
    """`VideoToTrackingVisualize`/`VideoToCosVisualize`/
    `VideoTodepthVisualize` (`annotator/nodes.py:436,560,763`) in one node:
    rasterize precomputed tracks into the 6 control videos."""

    RETURN_TYPES = ("IMAGE", "IMAGE_LIST", "IMAGE")
    FUNCTION = "process"
    CATEGORY = "FlexAM-TPU"

    def process(self, pred_tracks, pred_visibility, height, width,
                point_wise=4, cos_level=4, generate_type="full_edit",
                mask_video=None):
        from flexam_tpu.conditioning import (cosine_positional_encoding,
                                             rasterize_cos_videos,
                                             rasterize_depth_video,
                                             rasterize_tracking_video)
        tracking = rasterize_tracking_video(
            pred_tracks, pred_visibility, height, width,
            point_wise=point_wise, mask_video=mask_video,
            generate_type=generate_type)
        enc = cosine_positional_encoding(pred_tracks, height, width,
                                         L=cos_level)
        cos = rasterize_cos_videos(enc, pred_tracks, pred_visibility,
                                   height, width, mask_video=mask_video,
                                   generate_type=generate_type)
        depth = rasterize_depth_video(
            pred_tracks, pred_visibility, height, width,
            point_wise=point_wise, mask_video=mask_video,
            generate_type=generate_type)
        return (tracking, [cos[k] for k in sorted(cos)], depth)


NODE_CLASS_MAPPINGS = {
    "LoadFlexAMModel": LoadFlexAMModel,
    "FlexAMV2VSampler": FlexAMV2VSampler,
    "FunAttention": FunAttention,
    "VideoToTrackingVisualize": VideoToTrackingVisualize,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "LoadFlexAMModel": "Load FlexAM Model (TPU)",
    "FlexAMV2VSampler": "FlexAM V2V Sampler (TPU)",
    "FunAttention": "FlexAM Attention Backend",
    "VideoToTrackingVisualize": "Tracking -> Control Videos",
}
