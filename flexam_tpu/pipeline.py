"""FlexAM generation pipeline, TPU-native.

Behavioral reference: `FlexAM/pipeline/pipeline_wan2_2_fun_control_FlexAM.py`
(`Wan2_2FunControlPipeline_FlexAM.__call__`, :505-965).

TPU-first structure — three jitted stages instead of a python step loop:
  1. `prepare`: ALL VAE encodes in one batched call (the reference loops
     7 separate bs=1 encodes: masked video, control, depth, 4 cos levels,
     :647-827) + mask-latent construction;
  2. `denoise`: the N-step CFG loop as `lax.scan` chunks launched from the
     host (static chunk length -> one compiled executable; chunking keeps
     each device launch under the runtime's execution watchdog and gives
     free checkpoint/resume) — CFG pair on the batch axis, sampler as
     linear coefficient tables (flexam_tpu.sampling), TI2V per-token
     timesteps via the binary (t, 0) fast path (:891-898), known-latent
     reinjection (:937-938), timestep-MoE boundary split (:903-909) and
     CFG-skip (`cfg_optimization.py`) as statically-partitioned step
     ranges;
  3. `decode`: whole-clip VAE decode (group-streamed / mesh-sharded when
     large).

Everything data-dependent in the reference (`mask_video == 255` check,
first-frame-known check :683-686) is resolved host-side from the inputs
before tracing, so the compiled graphs are static.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.config import FlexAMConfig
from flexam_tpu.models.dit import (dit_forward, dit_forward_teacache,
                                   init_teacache_state, make_rope_tables_for)
from flexam_tpu.models.t5 import t5_encode
from flexam_tpu.models.vae import vae_decode, vae_encode_mode
from flexam_tpu.models.vae_stream import (vae_decode_streamed,
                                          vae_decode_streamed_u8,
                                          vae_encode_mode_streamed)
from flexam_tpu.core.attention import attention as default_attention
from flexam_tpu.sampling import build_schedule
from flexam_tpu.sampling.flow_match import (sampler_init_state, sampler_step,
                                            schedule_arrays)


# ---------------------------------------------------------------------------
# Host-side image/mask utilities
# ---------------------------------------------------------------------------

def resize_trilinear(x: jnp.ndarray, size: Tuple[int, int, int],
                     align_corners: bool = False) -> jnp.ndarray:
    """torch F.interpolate(mode='trilinear') over [B, C, T, H, W]."""
    if align_corners:
        def axis_resize(arr, axis, out_n):
            in_n = arr.shape[axis]
            if in_n == out_n:
                return arr
            if out_n == 1 or in_n == 1:
                idx = jnp.zeros((out_n,), jnp.int32)
                return jnp.take(arr, idx, axis=axis)
            pos = jnp.arange(out_n) * (in_n - 1) / (out_n - 1)
            lo = jnp.floor(pos).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, in_n - 1)
            w = (pos - lo).astype(arr.dtype)
            shape = [1] * arr.ndim
            shape[axis] = out_n
            w = w.reshape(shape)
            return (jnp.take(arr, lo, axis=axis) * (1 - w)
                    + jnp.take(arr, hi, axis=axis) * w)

        y = x
        for ax, n in zip((2, 3, 4), size):
            y = axis_resize(y, ax, n)
        return y
    # half-pixel centers == align_corners=False == jax.image 'linear'
    b, c = x.shape[:2]
    return jax.image.resize(x, (b, c) + tuple(size), method="trilinear")


def resize_mask_like_reference(mask: jnp.ndarray,
                               latent_shape: Tuple[int, int, int]
                               ) -> jnp.ndarray:
    """`resize_mask(..., process_first_frame_only=True)`
    (`pipeline...FlexAM.py:100-130`): frame 0 and frames 1.. are resized
    separately so the first latent frame sees only pixel frame 0."""
    t, h, w = latent_shape
    first = resize_trilinear(mask[:, :, 0:1], (1, h, w))
    if t > 1:
        rest = resize_trilinear(mask[:, :, 1:], (t - 1, h, w))
        return jnp.concatenate([first, rest], axis=2)
    return first


def group_mask_to_latent_channels(mask: jnp.ndarray) -> jnp.ndarray:
    """First frame repeated 4x, then frames folded into 4 channels
    (`pipeline...FlexAM.py:675-684`). mask: [B, 1, T, H, W] -> [B, 4, T', H, W]."""
    b, _, t, h, w = mask.shape
    m = jnp.concatenate(
        [jnp.repeat(mask[:, :, 0:1], 4, axis=2), mask[:, :, 1:]], axis=2)
    tt = m.shape[2]
    m = m.reshape(b, tt // 4, 4, h, w)
    return m.transpose(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FlexAMModels:
    """Parameter bundle for one generation setup.

    `t5_from_checkpoint` records loader provenance: True means t5_params
    came from a real checkpoint file, in which case running without the
    matching tokenizer would silently condition generation on garbage —
    `tokenize()` refuses that combination loudly (verify_load philosophy:
    never serve scrambled conditioning quietly)."""
    cfg: FlexAMConfig
    dit_params: dict
    vae_params: dict
    t5_params: Optional[dict] = None
    dit2_params: Optional[dict] = None   # high-noise expert (timestep MoE)
    t5_from_checkpoint: bool = False


def _put_quantized(tree, wide_dtype=jnp.bfloat16):
    """Upload a quantized HOST (numpy) parameter tree to device.

    Checkpoint loaders return numpy trees; `convert_dit_to_int8` /
    `convert_weights_to_fp8` quantize numpy leaves host-side, and this
    ships the result: int8/fp8 leaves at storage width (~half the bytes
    of a bf16 upload, ~quarter of fp32 — the 5B's block linears are
    4.6 GB int8 vs 9.3 GB bf16 over a ~75 MB/s tunnel), remaining fp32
    matrices cast to `wide_dtype` host-side first (the demo loader's
    rule) so fp32 bytes never cross the link. Quantization scales
    (`w_scale`) stay fp32. Device trees pass through untouched — the
    on-device quantize path (random-init benches, already-resident
    weights) is unchanged."""
    def visit(key, node):
        if isinstance(node, dict):
            return {k: visit(k, v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [visit(key, v) for v in node]
            return tuple(out) if isinstance(node, tuple) else out
        if isinstance(node, np.ndarray):
            if (node.dtype == np.float32 and node.ndim >= 2
                    and key != "w_scale"):
                return jnp.asarray(node, wide_dtype)
            return jnp.asarray(node)
        return node
    return visit("", tree)


# `pipelines.py:1170` — the reference's hardcoded default negative prompt.
DEFAULT_NEGATIVE_PROMPT = (
    "Bright tones, overexposed, static, blurred details, subtitles, style, "
    "works, paintings, images, static, overall gray, worst quality, low "
    "quality, JPEG compression residue, ugly, incomplete, extra fingers, "
    "poorly drawn hands, poorly drawn faces, deformed, disfigured, "
    "misshapen limbs, fused fingers, still picture, messy background, "
    "three legs, many people in the background, walking backwards"
)


class FlexAMGenerationPipeline:
    """Functional-core pipeline. All model math happens inside three jits;
    this class only resolves static structure host-side."""

    def __init__(self, models: FlexAMModels, tokenizer=None,
                 compute_dtype=jnp.bfloat16, attn_fn=None,
                 quant: Optional[str] = None,
                 aot_cache_dir: Optional[str] = None):
        self.models = models
        self.cfg = models.cfg
        self.tokenizer = tokenizer
        self.compute_dtype = compute_dtype
        self.attn_fn = attn_fn or default_attention
        # serialized-executable cache (utils/aot_cache.py): a fresh
        # process skips ~3 min of XLA compiles at flagship scale. The
        # knob is process-global (vae_stream's module jits share it);
        # also enabled by FLEXAM_AOT_CACHE=<dir>.
        from flexam_tpu.utils import aot_cache
        self._aot = aot_cache.configure(aot_cache_dir)
        # opt-in DiT weight quantization, quant=... or FLEXAM_QUANT=...:
        #   "int8": block GEMMs via ops/qlinear.py — 1.5-1.77x the bf16 MXU
        #           rate (dynamic per-token scales, approximate; 64 dB PSNR
        #           on the trained quality gate) AND ~half the weight HBM;
        #   "fp8":  storage-only fp8-e4m3 (utils/fp8.py, the reference's
        #           qfloat8 memory mode) — halves weight HBM, computes at
        #           bf16 rate via in-jit autocast.
        # Both applied to both DiT experts; both let the flagship decode
        # run NEXT TO the resident weights on a 16 GB chip (no
        # offload/restore cycle — tools/serving_bench.py measures this).
        quant = quant if quant is not None else os.environ.get(
            "FLEXAM_QUANT", "")
        if quant == "int8":
            from flexam_tpu.ops.qlinear import convert_dit_to_int8
            if models.dit_params is not None:
                models.dit_params = _put_quantized(
                    convert_dit_to_int8(models.dit_params))
            if models.dit2_params is not None:
                models.dit2_params = _put_quantized(
                    convert_dit_to_int8(models.dit2_params))
        elif quant == "fp8":
            from flexam_tpu.utils.fp8 import convert_weights_to_fp8
            if models.dit_params is not None:
                models.dit_params = _put_quantized(
                    convert_weights_to_fp8(models.dit_params))
            if models.dit2_params is not None:
                models.dit2_params = _put_quantized(
                    convert_weights_to_fp8(models.dit2_params))
        elif quant not in ("", "none"):
            raise ValueError(f"unknown quant mode {quant!r} "
                             "(supported: 'int8', 'fp8')")
        self.rope_tables = jnp.asarray(
            make_rope_tables_for(models.cfg.dit), jnp.float32)
        self.last_link_probe = None     # utils.linkprobe result
        self._staged_uploads = False    # degraded link -> chunked puts

    # -- link resilience (VERDICT r2 item 5) --------------------------------

    def probe_link_health(self, force: bool = False) -> dict:
        """RTT-probe the device link once per TTL window; on a degraded
        tunnel switch host->device transfers to staged uploads with
        retry and record the probe in the metrics JSON so inflated
        prepare/decode timings are attributable to the link."""
        from flexam_tpu.utils.linkprobe import probe_link
        from flexam_tpu.utils.timing import metrics
        res = probe_link(force=force)
        self.last_link_probe = res
        self._staged_uploads = not res["healthy"]
        metrics.counters["link_rtt_ms_median"] = res["rtt_ms_median"]
        metrics.counters["link_healthy"] = float(res["healthy"])
        return res

    def _put(self, arr):
        """Host->device upload; staged+retried under a degraded link."""
        if self._staged_uploads:
            from flexam_tpu.utils.linkprobe import staged_put
            return staged_put(np.asarray(arr))
        return jnp.asarray(arr)

    def enable_riflex(self, k: int, L_test: int,
                      L_test_scale: Optional[float] = None):
        """RIFLEx long-video RoPE (`wan_transformer3d_FlexAM.py:774-790`,
        ComfyUI `FunRiflex` node): rescale the k-th temporal frequency to
        0.9*2pi/L_test so extrapolated frames stay within one period."""
        riflex = {"k": k, "L_test": L_test}
        if L_test_scale is not None:
            riflex["L_test_scale"] = L_test_scale
        self.rope_tables = jnp.asarray(
            make_rope_tables_for(self.cfg.dit, riflex=riflex), jnp.float32)

    def disable_riflex(self):
        self.rope_tables = jnp.asarray(
            make_rope_tables_for(self.cfg.dit), jnp.float32)

    # -- prompts ------------------------------------------------------------

    def tokenize(self, prompts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        """umT5 tokenization, max_length pad/truncate to text_length
        (`pipeline...FlexAM.py:205-213`). Without a tokenizer (random-init
        smoke runs) prompts hash to deterministic ids — but NEVER when the
        T5 weights came from a real checkpoint: hashed ids through trained
        embeddings are garbage conditioning, and generation would silently
        ignore the prompt. FLEXAM_ALLOW_HASHED_IDS=1 overrides (debug)."""
        tl = self.cfg.t5.text_length
        if self.tokenizer is None:
            if (getattr(self.models, "t5_from_checkpoint", False)
                    and os.environ.get("FLEXAM_ALLOW_HASHED_IDS") != "1"):
                raise RuntimeError(
                    "T5 weights were loaded from a checkpoint but no "
                    "tokenizer is attached: hashed prompt ids would run "
                    "trained weights on garbage token ids and the output "
                    "would silently ignore the prompt. Pass tokenizer= to "
                    "FlexAMGenerationPipeline (AutoTokenizer.from_pretrained"
                    "(<ckpt>/google/umt5-xxl)), or set "
                    "FLEXAM_ALLOW_HASHED_IDS=1 to override for debugging.")
            ids = np.zeros((len(prompts), tl), np.int32)
            for i, p in enumerate(prompts):
                raw = np.frombuffer(p.encode()[:tl] or b"\x01",
                                    np.uint8).astype(np.int32)
                ids[i, :len(raw)] = raw % max(self.cfg.t5.vocab, 2)
            return ids, (ids > 0).astype(np.int32)
        enc = self.tokenizer(
            prompts, padding="max_length",
            max_length=tl, truncation=True,
            add_special_tokens=True, return_tensors="np")
        return enc["input_ids"].astype(np.int32), \
            enc["attention_mask"].astype(np.int32)

    def encode_prompt(self, prompt: str,
                      negative_prompt: Optional[str] = None,
                      do_cfg: bool = True) -> jnp.ndarray:
        """Returns context [2 or 1, text_len, text_dim]: [uncond, cond]
        order (`in_prompt_embeds = negative + prompt`, :598-601). Padded
        positions are ZEROED (the reference trims per-prompt and the
        transformer re-pads with zeros, :219-232 + transformer :957-964)."""
        if negative_prompt is None:
            negative_prompt = DEFAULT_NEGATIVE_PROMPT
        prompts = ([negative_prompt, prompt] if do_cfg else [prompt])
        ids, mask = self.tokenize(prompts)
        return self.encode_prompt_ids(ids, mask)

    # NOTE on jit structure: model parameters are always passed as jit
    # ARGUMENTS — arrays closed over by a jitted function are inlined as
    # MLIR constants, which for the 5B DiT means ~10 GB of constants and
    # an immediate RESOURCE_EXHAUSTED on the chip.

    def encode_prompt_ids(self, ids: jnp.ndarray,
                          mask: jnp.ndarray) -> jnp.ndarray:
        return self._t5_jit(self.models.t5_params, ids, mask)

    @partial(jax.jit, static_argnums=(0,))
    def _t5_jit(self, t5_params, ids, mask):
        emb = t5_encode(t5_params, self.cfg.t5, ids, mask)
        return (emb * mask[:, :, None]).astype(self.compute_dtype)

    # -- VAE stages ----------------------------------------------------------

    # whole-clip VAE compute above this many pixel-frame-elements switches
    # to the group-streamed path. Whole-clip decode needs ~46 GB HBM at
    # 512x896x97f (44.5 M) — scaling that linearly, a 16 GB v5e fits only
    # ~15 M whole-clip; 8 M leaves headroom for resident weights (a 49f
    # 512x896 decode at 23.8 M measured OOM under the old 24 M threshold).
    # Streaming is exact (see flexam_tpu/models/vae_stream.py), so the
    # only cost of streaming smaller clips is a few extra launches.
    VAE_STREAM_THRESHOLD = 8_000_000

    def _use_streaming(self, n_clips, t, h, w) -> bool:
        return n_clips * t * h * w > self.VAE_STREAM_THRESHOLD

    def _encode_clips(self, clips: jnp.ndarray) -> jnp.ndarray:
        """Batched encode of N same-shape clips [N, 3, T, H, W] in [-1,1]."""
        n, _, t, h, w = clips.shape
        if isinstance(clips, np.ndarray):
            clips = self._put(clips)
        clips = clips.astype(self.compute_dtype)
        mesh = getattr(self, "vae_mesh", None)
        if mesh is not None:
            from flexam_tpu.parallel.vae_parallel import vae_encode_sharded
            return vae_encode_sharded(self.models.vae_params, self.cfg.vae,
                                      clips, mesh)
        if self._use_streaming(n, t, h, w):
            # stream per clip: the grouped compiles are reused across clips
            # and per-clip activations stay bounded
            outs = [vae_encode_mode_streamed(
                self.models.vae_params, self.cfg.vae, clips[i:i + 1])
                for i in range(n)]
            return jnp.concatenate(outs, axis=0)
        return self._vae_encode_jit(self.models.vae_params, clips)

    @partial(jax.jit, static_argnums=(0, 2))
    def _mask_latents_jit(self, mask01, latent_shape):
        """Mask -> 4ch latent mask + TI2V mask in one fused launch
        (`pipeline...FlexAM.py:675-686`). Accepts uint8 masks (the
        device-prepare path keeps masks packed in HBM)."""
        mask01 = mask01.astype(jnp.float32)
        grouped = group_mask_to_latent_channels(mask01)   # [1,4,T',H,W]
        mask_latents = resize_mask_like_reference(1.0 - grouped, latent_shape)
        mask_ti2v = resize_trilinear(grouped[:, :1], latent_shape,
                                     align_corners=True)
        return mask_latents, mask_ti2v

    @partial(jax.jit, static_argnums=(0,))
    def _vae_encode_jit(self, vae_params, clips):
        return vae_encode_mode(vae_params, self.cfg.vae,
                               clips.astype(self.compute_dtype))

    def _decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        n, _, lt, lh, lw = latents.shape
        mesh = getattr(self, "vae_mesh", None)
        if mesh is not None:
            # parallel_magvit_vae equivalent: width-sharded whole-clip
            # decode over the mesh (flexam_tpu/parallel/vae_parallel.py)
            from flexam_tpu.parallel.vae_parallel import vae_decode_sharded
            return vae_decode_sharded(
                self.models.vae_params, self.cfg.vae,
                latents.astype(self.compute_dtype), mesh)
        if self._use_streaming(n, lt * 4, lh * 16, lw * 16):
            # small groups: the decoder's full-res 512-ch activations must
            # coexist with the resident DiT weights (~10 GB of 16 GB)
            big = n * lt * lh * lw * 4 * 256 > self.VAE_STREAM_THRESHOLD
            return vae_decode_streamed(
                self.models.vae_params, self.cfg.vae,
                latents.astype(self.compute_dtype),
                group_size=2 if big else 4)
        return self._vae_decode_jit(self.models.vae_params, latents)

    @partial(jax.jit, static_argnums=(0,))
    def _vae_decode_jit(self, vae_params, latents):
        return vae_decode(vae_params, self.cfg.vae,
                          latents.astype(self.compute_dtype))

    # -- conditioning --------------------------------------------------------

    def prepare_conditioning(
        self,
        video: np.ndarray,                 # [1, 3, T, H, W] in [0,1]
        mask_video: Optional[np.ndarray],  # [1, 1, T, H, W] in [0,1]; None=all-generate
        control_video: Optional[np.ndarray],
        depth_video: Optional[np.ndarray],
        cos_videos: Optional[Sequence[np.ndarray]],
        ref_image: Optional[np.ndarray],   # [1, 3, 1, H, W] in [0,1]
    ) -> Dict[str, jnp.ndarray]:
        """VAE-encode every conditioning stream (one batched call) and build
        the latent masks. Mirrors `pipeline...FlexAM.py:643-830`."""
        self.probe_link_health()
        cfgv = self.cfg.vae
        b, _, t, h, w = video.shape
        assert b == 1, "reference semantics are per-sample; vmap upstream"
        lt = (t - 1) // cfgv.temporal_compression_ratio + 1
        lh = h // cfgv.spatial_compression_ratio
        lw = w // cfgv.spatial_compression_ratio
        dt = self.compute_dtype

        # conditioning clips are prepared HOST-side and encoded one at a
        # time when large: materializing all 7 full-res fp32 clips on the
        # chip next to the 5B weights OOMs a 16 GB v5e
        video = np.asarray(video, np.float32)

        if mask_video is not None:
            mask01_np = (np.asarray(mask_video, np.float32) > 0.5
                         ).astype(np.uint8)
            # the reference masks AFTER [-1,1] normalization, so masked
            # pixels are 0 = mid-gray (`:662`)
            masked_np = ((video * 2.0 - 1.0)
                         * (mask01_np < 0.5)).astype(np.float16)
        else:
            mask01_np = np.ones((1, 1, t, h, w), np.uint8)
            masked_np = np.zeros(video.shape, np.float16)
        # host->device over the tunnel dominates prepare at full res:
        # clips travel as fp16, the mask as uint8
        mask01 = jnp.asarray(mask01_np).astype(jnp.float32)

        def norm(v):
            return (np.asarray(v, np.float32) * 2.0 - 1.0).astype(np.float16)

        zeros = np.zeros(video.shape, np.float16)
        clips = [masked_np,
                 norm(control_video) if control_video is not None else zeros,
                 norm(depth_video) if depth_video is not None else zeros]
        n_cos = len(cos_videos) if cos_videos else 0
        if cos_videos:
            clips.extend(norm(v) for v in cos_videos)

        if self._use_streaming(1, t, h, w):
            lats = [self._encode_clips(c) for c in clips]
            lat = jnp.concatenate(lats, axis=0)
        else:
            lat = self._encode_clips(np.concatenate(clips, axis=0))
        idx = 0
        masked_video_latents = lat[idx:idx + 1]; idx += 1
        control_latents = lat[idx:idx + 1]; idx += 1
        depth_latents = lat[idx:idx + 1]; idx += 1
        # level-major channel order, `torch.cat(cos_latents_list, dim=1)`
        # (`pipeline...FlexAM.py:772`)
        cos_latents = (lat[idx:idx + n_cos].reshape(1, -1, lt, lh, lw)
                       if n_cos else None)

        if mask_video is not None:
            mask_latents, mask_ti2v = self._mask_latents_jit(
                mask01, (lt, lh, lw))
        else:
            # mask_video == 255 path (`:645-655`): zeros mask latents,
            # zero masked video, all-ones TI2V mask
            mask_latents = jnp.zeros((1, 4, lt, lh, lw), jnp.float32)
            masked_video_latents = jnp.zeros_like(masked_video_latents)
            mask_ti2v = jnp.ones((1, 1, lt, lh, lw), jnp.float32)

        # first-frame-known trick (`:684-686`): host-static decision
        first_frame_known = bool(
            np.asarray(mask_ti2v[:, :, 0]).max() == 0.0)
        if first_frame_known:
            m = mask_ti2v.at[:, :, 1:].set(1.0)
        else:
            m = mask_ti2v

        if ref_image is not None:
            ref_lat = self._vae_encode_jit(
                self.models.vae_params,
                norm(jnp.asarray(ref_image, jnp.float32)))[:, :, 0]
        else:
            ref_lat = jnp.zeros((1, cfgv.latent_channels, lh, lw), jnp.float32)

        additional = (jnp.concatenate([depth_latents, cos_latents], axis=1)
                      if cos_latents is not None else
                      jnp.concatenate(
                          [depth_latents,
                           jnp.zeros((1, 4 * cfgv.latent_channels, lt, lh, lw),
                                     depth_latents.dtype)], axis=1))

        return {
            "per_token_t": mask_video is not None,
            "control_latents": control_latents.astype(dt),
            "mask_latents": mask_latents.astype(dt),
            "masked_video_latents": masked_video_latents.astype(dt),
            "additional_control": additional.astype(dt),
            "ref_latents": ref_lat.astype(dt),
            "mask_ti2v": m.astype(jnp.float32),
            "first_frame_known": first_frame_known,
            "latent_shape": (cfgv.latent_channels, lt, lh, lw),
        }

    # -- device-side conditioning (tracks cross the tunnel, videos don't) ----

    @partial(jax.jit, static_argnums=(0, 2))
    def _first_masked_group_jit(self, first, n):
        """full_edit image-to-video masked-video GROUP 0 built ON DEVICE
        from the single first frame (`get_image_to_video_latent`
        semantics, `utils.py:303-397`): video = first frame tiled, mask =
        frame 0 known / rest generate, so masked = [first*2-1, zeros...]."""
        b, c, _, h, w = first.shape
        f0 = (first.astype(jnp.float32) * 2.0 - 1.0).astype(self.compute_dtype)
        return jnp.concatenate(
            [f0, jnp.zeros((b, c, n - 1, h, w), self.compute_dtype)], axis=2)

    @partial(jax.jit, static_argnums=(0,))
    def _masked_group_jit(self, video, mask_u8):
        """(video*2-1) * (mask<0.5) for one frame group
        (`pipeline...FlexAM.py:662`); video resides fp16, mask uint8."""
        v = video.astype(jnp.float32) * 2.0 - 1.0
        keep = (mask_u8 < 1).astype(jnp.float32)
        return (v * keep).astype(self.compute_dtype)

    def prepare_conditioning_from_tracks(
        self,
        tracks: np.ndarray,                # [T, N, 3] (u, v, depth)
        visibility: Optional[np.ndarray],  # [T, N] bool
        height: int, width: int,
        point_wise: int = 4,
        generate_type: str = "full_edit",
        raster_mask: Optional[np.ndarray] = None,   # [T, H, W] {0,1} fg/bg draw filter
        video: Optional[np.ndarray] = None,         # [1,3,T,H,W] in [0,1]; None = first-frame tiled
        first_frame: Optional[np.ndarray] = None,   # [1,3,1,H,W] in [0,1]
        mask_video: Optional[np.ndarray] = None,    # [1,1,T,H,W] in [0,1]
        ref_image: Optional[np.ndarray] = None,     # default: first frame
        cos_level: int = 4,
        rng: Optional[np.random.RandomState] = None,
        return_videos: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Device-side `prepare_conditioning`: rasterize the 6 control
        streams from tracks ON the chip (conditioning.rasterize_device) and
        VAE-encode them in place — only tracks [T,N,3] + tiny color tables
        (+ the first frame, or the real video for fg/bg edits) cross the
        host<->device tunnel, collapsing the round-1 123 s prepare phase.

        Output dict is identical to `prepare_conditioning`'s (parity test:
        tests/test_pipeline.py). `return_videos` additionally returns the
        rasterized streams for artifact saving (forces a device fetch)."""
        self.probe_link_health()
        from flexam_tpu.conditioning.rasterize_device import DeviceRasterizer

        cfgv = self.cfg.vae
        t = int(tracks.shape[0])
        lt = (t - 1) // cfgv.temporal_compression_ratio + 1
        lh = height // cfgv.spatial_compression_ratio
        lw = width // cfgv.spatial_compression_ratio
        dt = self.compute_dtype

        rast = DeviceRasterizer(
            tracks, visibility, height, width, point_wise=point_wise,
            cos_level=cos_level, raster_mask=raster_mask,
            generate_type=generate_type, rng=rng)

        # masked-video stream + mask: only the first frame (full_edit)
        # or the real video+mask (fg/bg) ever reach the device; the
        # masked clip itself is produced group-by-group below
        video_dev = mask_dev = ff = None
        if video is None:
            if first_frame is None:
                raise ValueError("track conditioning needs video= or "
                                 "first_frame=")
            ff = self._put(np.asarray(first_frame, np.float16))
            if ff.ndim == 4:
                ff = ff[:, :, None]
            # mask = frame 0 known / rest generate (uint8 resident)
            mask01 = jnp.concatenate(
                [jnp.zeros((1, 1, 1, height, width), jnp.uint8),
                 jnp.ones((1, 1, t - 1, height, width), jnp.uint8)], axis=2)
            have_mask = True

            def masked_fn(a, n):
                if a == 0:
                    return self._first_masked_group_jit(ff, n)
                return jnp.zeros((1, 3, n, height, width), dt)
        else:
            video_dev = self._put(np.asarray(video, np.float16))
            if mask_video is not None:
                mask01 = jnp.asarray(
                    (np.asarray(mask_video, np.float32) > 0.5
                     ).astype(np.uint8))
                have_mask = True

                def masked_fn(a, n):
                    return self._masked_group_jit(
                        video_dev[:, :, a:a + n], mask01[:, :, a:a + n])
            else:
                mask01 = jnp.ones((1, 1, t, height, width), jnp.uint8)
                have_mask = False

                def masked_fn(a, n):
                    return jnp.zeros((1, 3, n, height, width), dt)

        # encode streams via frame producers: the full-res clips never
        # materialize next to the resident DiT weights; rank images are
        # freed as soon as their consumers ran. prepare_encode_batch
        # stacks streams on the encoder batch axis (activation memory
        # scales with it — 2 fits next to the resident 5B on 16 GB).
        from flexam_tpu.models.vae_stream import vae_encode_stream_fn
        videos = {}
        use_sharded = getattr(self, "vae_mesh", None) is not None
        ebatch = max(1, int(getattr(self, "prepare_encode_batch", 1)))

        def enc_group(fns, names):
            if return_videos:
                for fn, name in zip(fns, names):
                    if name is None:
                        continue
                    chunks = [np.asarray(fn(a, min(8, t - a)))
                              for a in range(0, t, 8)]
                    videos[name] = (np.concatenate(chunks, axis=2)
                                    .astype(np.float32) + 1.0) / 2.0
            if use_sharded or not self._use_streaming(1, t, height, width):
                outs = []
                for fn in fns:
                    clip = jnp.concatenate(
                        [fn(0, min(9, t))]
                        + [fn(a, min(8, t - a))
                           for a in range(9, t, 8)], axis=2)
                    outs.append(self._encode_clips(clip))
                return outs
            if len(fns) == 1:
                stacked = fns[0]
            else:
                def stacked(a, n_, fns=tuple(fns)):
                    return jnp.concatenate([f(a, n_) for f in fns], axis=0)
            mu = vae_encode_stream_fn(self.models.vae_params, cfgv,
                                      stacked, t, b=len(fns))[0]
            return [mu[i:i + 1] for i in range(len(fns))]

        def enc_all(items):
            outs = []
            for i in range(0, len(items), ebatch):
                chunk = items[i:i + ebatch]
                outs.extend(enc_group([c[0] for c in chunk],
                                      [c[1] for c in chunk]))
            return outs

        if have_mask:
            mask_latents, mask_ti2v = self._mask_latents_jit(
                mask01, (lt, lh, lw))
        else:
            mask_latents = jnp.zeros((1, 4, lt, lh, lw), jnp.float32)
            mask_ti2v = jnp.ones((1, 1, lt, lh, lw), jnp.float32)

        masked_video_latents = enc_all([(masked_fn, None)])[0]
        if not have_mask:
            masked_video_latents = jnp.zeros_like(masked_video_latents)
        items = ([(rast.tracking_frame_fn(dt), "tracking"),
                  (rast.depth_frame_fn(dt), "depth")]
                 + [(rast.cos_frame_fn(lvl, dt), f"cos_{lvl}")
                    for lvl in range(rast.num_cos_levels)])
        lats = enc_all(items)
        rast.free()
        control_latents, depth_latents = lats[0], lats[1]
        cos_lat_list = lats[2:]
        cos_latents = (jnp.concatenate(cos_lat_list, axis=1)
                       if cos_lat_list else None)

        first_frame_known = bool(
            np.asarray(mask_ti2v[:, :, 0]).max() == 0.0)
        if first_frame_known:
            mask_ti2v = mask_ti2v.at[:, :, 1:].set(1.0)

        ref = ref_image if ref_image is not None else first_frame
        if ref is not None:
            r = self._put(np.asarray(ref, np.float16))
            if r.ndim == 4:
                r = r[:, :, None]
            ref_lat = self._vae_encode_jit(
                self.models.vae_params,
                (r.astype(jnp.float32) * 2.0 - 1.0))[:, :, 0]
        else:
            ref_lat = jnp.zeros((1, cfgv.latent_channels, lh, lw),
                                jnp.float32)

        additional = (jnp.concatenate([depth_latents, cos_latents], axis=1)
                      if cos_latents is not None else
                      jnp.concatenate(
                          [depth_latents,
                           jnp.zeros((1, 4 * cfgv.latent_channels,
                                      lt, lh, lw),
                                     depth_latents.dtype)], axis=1))

        cond = {
            "per_token_t": have_mask,
            "control_latents": control_latents.astype(dt),
            "mask_latents": mask_latents.astype(dt),
            "masked_video_latents": masked_video_latents.astype(dt),
            "additional_control": additional.astype(dt),
            "ref_latents": ref_lat.astype(dt),
            "mask_ti2v": mask_ti2v.astype(jnp.float32),
            "first_frame_known": first_frame_known,
            "latent_shape": (cfgv.latent_channels, lt, lh, lw),
        }
        if return_videos:
            cond["videos"] = videos
        return cond

    # -- denoise -------------------------------------------------------------

    def _resolve_attn_fn(self, lt, lh, lw):
        """Denoise-time attention resolution (None = `self.attn_fn`
        inside the chunk jit). Two orthogonal upgrades, both skipped when
        an explicit attn_fn was injected:

          * `FLEXAM_ATTENTION=sparse` — the block-sparse video kernel for
            this latent geometry (`ops/sparse_attention`);
          * an active >1-device mesh with sp>1 — the Ulysses shard_map
            wrapper (`parallel/ulysses.py`), so the per-shard Pallas
            kernels never meet GSPMD (which cannot partition Mosaic
            custom calls). When both apply the sparse closure rides as
            the Ulysses INNER — the reference's paifuser-under-xDiT
            stack (`FlexAM/models/__init__.py:23-103`).

        Closures are cached per (mesh, geometry, window) so repeated
        denoise calls reuse the compiled chunk executable (attn_fn is a
        static jit argument)."""
        import os
        env = os.environ.get("FLEXAM_ATTENTION", "").lower()
        want_sparse = env in ("sparse", "pallas_sparse")
        if self.attn_fn is not default_attention:
            return None
        from flexam_tpu.parallel import sharding as _sh
        mesh = _sh._ACTIVE_MESH
        sp = mesh.shape.get("sp", 1) if mesh is not None else 1
        use_mesh = mesh is not None and mesh.size > 1 and sp > 1
        if not (want_sparse or use_mesh):
            return None
        cache = getattr(self, "_sparse_attn_cache", None)
        if cache is None:
            cache = self._sparse_attn_cache = {}
        window = int(os.environ.get("FLEXAM_SPARSE_WINDOW", "2"))
        key = (id(mesh) if use_mesh else None, lt, lh, lw, window,
               want_sparse)
        if key not in cache:
            dcfg = self.cfg.dit
            inner = None
            if want_sparse:
                from flexam_tpu.ops.sparse_attention import \
                    sparse_attn_fn_for_latent
                inner = sparse_attn_fn_for_latent(
                    (lt, lh, lw), patch=dcfg.patch_size,
                    has_ref=dcfg.add_ref_conv, window=window)
            if use_mesh:
                pt, ph, pw = dcfg.patch_size
                spatial = (lh // ph) * (lw // pw)
                video_len = (lt // pt) * spatial + (
                    spatial if dcfg.add_ref_conv else 0)
                if dcfg.num_heads % sp == 0 and video_len % sp == 0:
                    from flexam_tpu.parallel.ulysses import \
                        make_ulysses_attention
                    inner = make_ulysses_attention(
                        mesh, inner=inner or default_attention)
                # else: keep GSPMD partitioning (inner stays as resolved)
            cache[key] = inner
        return cache[key]

    def denoise(
        self,
        cond: Dict,
        context: jnp.ndarray,              # [2, text_len, text_dim]
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        seed: int = 1245644,
        scheduler_type: Optional[str] = None,
        shift: Optional[float] = None,
        boundary: Optional[float] = None,      # MoE switch; None = cfg's
        density: Optional[float] = None,
        cfg_skip_ratio: float = 0.0,
        latents: Optional[jnp.ndarray] = None,
        teacache_thresh: float = 0.0,          # 0 = off; reference: 0.10
        teacache_skip_start: int = 5,
        teacache_coefficients=None,            # 5-tuple; None = WAN22 table
        resume: Optional[dict] = None,         # from a previous checkpoint_cb
        checkpoint_cb=None,                    # cb(step:int, snapshot:dict)
        progress_cb=None,                      # cb(done:int, total:int) per
                                               # chunk DISPATCH (no fetch);
                                               # raise to abort the run
    ) -> jnp.ndarray:
        """The 50-step CFG loop as scan(s) inside jit."""
        scfg = self.cfg.scheduler
        tables = build_schedule(
            scheduler_type or scfg.scheduler_type,
            num_inference_steps,
            shift=shift if shift is not None else scfg.shift,
            num_train_timesteps=scfg.num_train_timesteps,
            solver_order=scfg.solver_order)

        c, lt, lh, lw = cond["latent_shape"]
        if latents is None:
            key = jax.random.PRNGKey(seed)
            latents = jax.random.normal(key, (1, c, lt, lh, lw), jnp.float32)

        # static step partition for the timestep-MoE boundary (`:903-909`)
        boundary_t = ((boundary if boundary is not None
                       else self.cfg.boundary) * scfg.num_train_timesteps)
        use_moe = self.models.dit2_params is not None
        high_steps = int(np.sum(tables.timesteps >= boundary_t)) if use_moe else 0
        # cfg-skip: drop uncond for the last ratio fraction
        # (`cfg_optimization.py:5-39`)
        skip_from = (num_inference_steps
                     - int(cfg_skip_ratio * num_inference_steps)
                     if cfg_skip_ratio > 0 else num_inference_steps)

        do_cfg = guidance_scale > 1.0 and context.shape[0] == 2

        # static step partition: timestep-MoE boundary x cfg-skip tail
        n = tables.num_steps
        segments = []
        bounds = sorted({0, high_steps, min(skip_from, n), n})
        for a, b in zip(bounds[:-1], bounds[1:]):
            if a >= b:
                continue
            use_dit2 = b <= high_steps
            segments.append((a, b, use_dit2, do_cfg and a < skip_from))

        sched = schedule_arrays(tables)
        state = sampler_init_state(jnp.asarray(latents, jnp.float32),
                                   tables.order)
        c_lat, lt, lh, lw = cond["latent_shape"]
        seq_len = (lt * (lh // self.cfg.dit.patch_size[1])
                   * (lw // self.cfg.dit.patch_size[2]))
        l_ref = ((lh // self.cfg.dit.patch_size[1])
                 * (lw // self.cfg.dit.patch_size[2]))
        use_teacache = teacache_thresh > 0.0
        # hoist the fused-kernel availability probe OUTSIDE the chunk jit:
        # at trace time the probe cannot run (tracer leak) and would
        # silently disable the fusions
        from flexam_tpu.ops.fused import fused_enabled
        fused_enabled()
        # opt-in block-sparse video self-attention (the paifuser sparse
        # attention equivalent, ops/sparse_attention.py):
        # FLEXAM_ATTENTION=sparse. Resolved here because the sparsity
        # pattern is a function of the latent geometry; cached per
        # geometry so the chunk executable is not retraced per call.
        attn_fn = self._resolve_attn_fn(lt, lh, lw)
        # calibrated polynomial (tools/teacache_calibrate fits one per
        # checkpoint); default = the reference's fitted Wan2.2 table
        # (`cache_utils.py:4-18`) — passed as a dynamic arg so swapping
        # coefficients does not retrace the chunk executable
        from flexam_tpu.models.dit import WAN22_TEACACHE_COEFFICIENTS
        tea_coeffs = jnp.asarray(
            teacache_coefficients if teacache_coefficients is not None
            else WAN22_TEACACHE_COEFFICIENTS, jnp.float32)

        # the denoise scan is split into host-launched chunks: a single
        # >60 s device executable trips the runtime watchdog at full scale
        # (50 steps x 2.6 s); chunk length is static so all full chunks
        # share one compiled executable
        spl = max(1, int(self.steps_per_launch))
        spl = self._watchdog_safe_spl(spl, seq_len + l_ref)
        # denoise-run checkpoint/resume (a capability the reference lacks,
        # SURVEY.md §5.3 "No checkpoint-resume of a denoise run"): the
        # chunked launches make the full solver state snapshottable
        resume_step = -1
        if resume is not None:
            state = tuple(jnp.asarray(s) for s in resume["sampler_state"])
            resume_step = int(resume["step"])
        tea_computed = 0.0
        for a, b, use_dit2, with_cfg in segments:
            params = (self.models.dit2_params if use_dit2
                      else self.models.dit_params)
            tea = (init_teacache_state(2 if with_cfg else 1,
                                       seq_len + l_ref, self.cfg.dit.dim,
                                       self.compute_dtype)
                   if use_teacache else jnp.zeros(()))
            c0 = a
            while c0 < b:
                length = min(spl, b - c0)
                if c0 + length <= resume_step + 1:
                    c0 += length
                    continue
                chunk_args = (
                    self, params, state, tea, jnp.int32(c0),
                    cond["control_latents"], cond["mask_latents"],
                    cond["masked_video_latents"],
                    cond["additional_control"], cond["ref_latents"],
                    cond["mask_ti2v"],
                    context if with_cfg else context[-1:],
                    sched, tea_coeffs, float(guidance_scale),
                    float(density) if density is not None else 0.0,
                    length, bool(cond["first_frame_known"]), with_cfg,
                    tables.convert, density is not None,
                    bool(cond.get("per_token_t", True)),
                    float(teacache_thresh), int(teacache_skip_start),
                    attn_fn, cond.get("y_camera"))
                if self._aot is not None:
                    # serialized-executable cache: statics must mirror
                    # the _denoise_chunk_jit decorator's static_argnums
                    from flexam_tpu.utils.aot_cache import aot_call
                    state, tea = aot_call(
                        type(self)._denoise_chunk_jit, chunk_args,
                        static_argnums=(0, 16, 17, 18, 19, 20, 21, 22,
                                        23, 24),
                        tag="denoise_chunk")
                else:
                    state, tea = self._denoise_chunk_jit(*chunk_args[1:])
                c0 += length
                if progress_cb is not None:
                    progress_cb(min(c0, n), n)
                if checkpoint_cb is not None:
                    checkpoint_cb(c0 - 1, {
                        "step": c0 - 1,
                        "sampler_state": [np.asarray(s) for s in state],
                    })
            if use_teacache and isinstance(tea, dict):
                tea_computed += float(np.asarray(tea["computed"]))
        # observability: TeaCache skip-rate diagnostics (the `computed`
        # counter carried through the scan; reference prints nothing)
        if use_teacache:
            self.last_denoise_info = {
                "steps": n,
                "teacache_computed_forwards": tea_computed,
                "teacache_skipped_forwards": float(n - tea_computed),
            }
        else:
            self.last_denoise_info = {"steps": n}
        return state[0]

    # device-execution chunk length per launch (~2.5 s/step at the
    # flagship scale; the tunnel watchdog kills executables > ~60 s, so
    # 14 steps ≈ 35 s keeps margin while amortizing per-launch overhead)
    steps_per_launch = 14
    # auto-shrink the chunk for sequences LONGER than the flagship
    # 11,648 tokens the default was tuned at: per-step time grows
    # ~0.5*r^2 + 0.5*r with r = tokens/11648 (quadratic attention band +
    # linear GEMM band, v5e roofline in BASELINE.md), so a 14-step chunk
    # at 161f/225f would blow the watchdog. Off = trust steps_per_launch.
    auto_steps_per_launch = True
    _SPL_REFERENCE_TOKENS = 11648

    def _watchdog_safe_spl(self, spl: int, tokens: int) -> int:
        """Shrink (never grow) the denoise chunk length so its device
        time stays near the flagship-tuned budget at longer sequences
        (the ~60 s executable watchdog applies to EVERY launch). The
        safe length scales the TUNED default (14 steps @ 11,648 tokens),
        so an explicit smaller steps_per_launch is never shrunk twice —
        only capped by the geometry's own safe bound."""
        if not self.auto_steps_per_launch:
            return spl
        r = tokens / float(FlexAMGenerationPipeline._SPL_REFERENCE_TOKENS)
        if r <= 1.0:
            return spl
        safe = max(1, int(FlexAMGenerationPipeline.steps_per_launch
                          / (0.5 * r * r + 0.5 * r)))
        return min(spl, safe)

    @partial(jax.jit,
             static_argnums=(0, 16, 17, 18, 19, 20, 21, 22, 23, 24))
    def _denoise_chunk_jit(self, params, state, tea, start,
                           control_latents, mask_latents,
                           masked_video_latents, additional_control,
                           ref_latents, mask_ti2v, context, sched,
                           tea_coeffs, guidance_scale, density, length,
                           first_frame_known, with_cfg, solver_convert,
                           has_density, per_token_t, teacache_thresh,
                           teacache_skip_start, attn_fn=None,
                           y_camera=None):
        cfg = self.cfg.dit
        dt = self.compute_dtype
        timesteps = sched["timesteps"]

        # y = control(48) ++ mask(4) ++ masked video(48)  (`:868-875`)
        y_single = jnp.concatenate(
            [control_latents, mask_latents.astype(dt),
             masked_video_latents], axis=1)

        # per-token timestep pattern (`:891-898`): latent mask subsampled by
        # the 2x2 patch; tokens of known content get timestep 0
        c_lat, lt, lh, lw = control_latents.shape[1:]
        seq_len = lt * (lh // cfg.patch_size[1]) * (lw // cfg.patch_size[2])
        tok_pattern = mask_ti2v[0, 0, :, ::cfg.patch_size[1],
                                ::cfg.patch_size[2]].reshape(-1)
        tok_pattern = jnp.concatenate(
            [tok_pattern,
             jnp.ones((seq_len - tok_pattern.shape[0],), jnp.float32)])

        if first_frame_known:
            # idempotent known-region pin (`:684-686`), re-applied at chunk
            # entry so the very first step sees seeded latents
            x0 = ((1 - mask_ti2v) * masked_video_latents.astype(jnp.float32)
                  + mask_ti2v * state[0])
            state = (x0,) + state[1:]

        use_teacache = teacache_thresh > 0.0

        def velocity(params, x, t_scalar, ctx, batch, tea, i):
            """One transformer forward, batch = 1 (cond) or 2 (CFG pair)."""
            xb = jnp.tile(x.astype(dt), (batch, 1, 1, 1, 1))
            yb = jnp.tile(y_single, (batch, 1, 1, 1, 1))
            acb = jnp.tile(additional_control, (batch, 1, 1, 1, 1))
            refb = jnp.tile(ref_latents, (batch, 1, 1, 1))
            t_in = jnp.full((batch,), t_scalar, jnp.float32)
            # binary-timestep fast path: the TI2V per-token pattern has
            # exactly two values (t / 0), so the DiT runs the time MLP on
            # the pair and selects per token (see dit.py)
            bmask = (jnp.repeat(tok_pattern[None], batch, 0)
                     if per_token_t else None)
            dens = (jnp.full((batch,), density, jnp.float32)
                    if has_density else None)
            kw = dict(density=dens, y=yb, additional_control=acb,
                      full_ref=refb, rope_tables=self.rope_tables,
                      attn_fn=attn_fn or self.attn_fn,
                      binary_t_mask=bmask)
            if y_camera is not None:    # Control-Camera adapter tokens
                kw["y_camera"] = jnp.tile(y_camera.astype(dt),
                                          (batch, 1, 1, 1, 1))
            if use_teacache:
                return dit_forward_teacache(
                    params, cfg, xb, t_in, ctx, tea, i,
                    coefficients=tea_coeffs,
                    rel_l1_thresh=teacache_thresh,
                    num_skip_start_steps=teacache_skip_start, **kw)
            return dit_forward(params, cfg, xb, t_in, ctx, **kw), tea

        def body(carry, i):
            st, te = carry
            x = st[0]
            t_scalar = timesteps[i]
            if with_cfg:
                pred, te = velocity(params, x, t_scalar, context, 2, te, i)
                uncond, cond_p = pred[0:1], pred[1:2]
                v = uncond + guidance_scale * (cond_p - uncond)
            else:
                pred, te = velocity(params, x, t_scalar, context, 1, te, i)
                v = pred
            st, x_next = sampler_step(
                sched, solver_convert, st, v.astype(jnp.float32), i)
            if first_frame_known:
                x_next = ((1 - mask_ti2v)
                          * masked_video_latents.astype(jnp.float32)
                          + mask_ti2v * x_next)
                st = (x_next,) + st[1:]
            return (st, te), None

        (state, tea), _ = jax.lax.scan(
            body, (state, tea), jnp.arange(length, dtype=jnp.int32) + start)
        return state, tea

    # -- full generate --------------------------------------------------------

    def offload_dit_to_host(self):
        """Move DiT weights to host memory (the reference's
        cpu-offload/sequential modes, `wan2_2_fun_flexam/nodes.py:322-346`).
        `restore_dit()` puts them back; `release_dit()` drops them (the
        one-shot demo pattern — the reference deletes each model after its
        phase, `pipelines.py:187-193,1496-1499`).

        The host copy is CACHED across offload cycles: over the axon link
        a 10 GB device_get takes minutes, and the weights don't change
        between decodes. Anything that swaps the device weights (LoRA
        merge, fp8 conversion) must call `set_dit_params` so the cache
        invalidates."""
        cur = self.models.dit_params
        # identity-checked cache: if anything swapped the device weights
        # since the cached copy was taken (even via direct assignment,
        # bypassing set_dit_params), re-fetch rather than risk restoring
        # stale weights silently
        if (getattr(self, "_dit_host", None) is None
                or getattr(self, "_dit_src", None) is not cur):
            self._dit_host = jax.device_get(cur)
        self.models.dit_params = None
        self._dit_src = None

    def set_dit_params(self, params):
        """Replace the DiT weights AND invalidate the offload host copy
        (direct assignment is also detected via identity, but this is
        the explicit path)."""
        self.models.dit_params = params
        self._dit_host = None
        self._dit_src = None

    def restore_dit(self):
        """Put the offloaded DiT weights back on device. On a degraded
        link (RTT probe) the ~10 GB upload goes leaf-wise through
        `staged_put` — bounded chunks with per-chunk retry — instead of
        one all-or-nothing transfer that a transport hiccup aborts."""
        if self.models.dit_params is None and getattr(self, "_dit_host", None) is not None:
            from flexam_tpu.utils.linkprobe import probe_link, staged_put
            if probe_link().get("healthy", True):
                self.models.dit_params = jax.device_put(self._dit_host)
            else:
                self.models.dit_params = jax.tree_util.tree_map(
                    staged_put, self._dit_host)
            self._dit_src = self.models.dit_params

    def release_dit(self):
        self.models.dit_params = None
        self._dit_host = None
        self._dit_src = None

    def release_t5(self):
        """Drop the text encoder after prompt encoding — the sequential
        memory mode (`wan2_2_fun_flexam/nodes.py:322-346`): umT5-XXL
        (~11 GB bf16) and the 5B DiT (~9.6 GB) cannot be co-resident on
        a 16 GB chip; encode first, release, then run the DiT."""
        self.models.t5_params = None

    def generate(self, video, prompt, mask_video=None, control_video=None,
                 depth_video=None, cos_videos=None, ref_image=None,
                 camera_video=None, negative_prompt=None,
                 num_inference_steps=50,
                 guidance_scale=6.0, seed=1245644, density=None,
                 scheduler_type=None, shift=None, boundary=None,
                 cfg_skip_ratio=0.0,
                 teacache_thresh=0.0, teacache_skip_start=5,
                 teacache_coefficients=None,
                 offload_dit_for_decode: Optional[bool] = None,
                 output_type="np", progress_cb=None) -> np.ndarray:
        """demo-equivalent end-to-end call. video in [0,1], [1,3,T,H,W].

        `offload_dit_for_decode` (default: auto — on for workloads that
        stream the VAE): on a 16 GB chip the full-res decode cannot run
        next to the resident 5B weights; the DiT round-trips to host RAM
        around the decode."""
        context = self.encode_prompt(prompt, negative_prompt,
                                     do_cfg=guidance_scale > 1.0)
        cond = self.prepare_conditioning(video, mask_video, control_video,
                                         depth_video, cos_videos, ref_image)
        if camera_video is not None:
            # Plucker camera video [B, 6, T, H, W] -> the Control-Camera
            # adapter input (first-frame repeat + 4-frame channel fold,
            # `pipeline_wan2_2_fun_control_FlexAM.py:697-707`)
            if not getattr(self.cfg.dit, "add_control_adapter", False):
                raise ValueError(
                    "camera_video given but this model config has no "
                    "Control-Camera adapter (add_control_adapter is "
                    "false) — the conditioning would be silently "
                    "ignored; use a Camera-variant config")
            from flexam_tpu.conditioning.camera import fold_camera_video
            cond["y_camera"] = jnp.asarray(
                fold_camera_video(np.asarray(camera_video, np.float32)),
                self.compute_dtype)
        return self.generate_from_cond(
            cond, context, num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, seed=seed, density=density,
            scheduler_type=scheduler_type, shift=shift, boundary=boundary,
            cfg_skip_ratio=cfg_skip_ratio,
            teacache_thresh=teacache_thresh,
            teacache_skip_start=teacache_skip_start,
            teacache_coefficients=teacache_coefficients,
            offload_dit_for_decode=offload_dit_for_decode,
            output_type=output_type, progress_cb=progress_cb)

    def generate_from_cond(self, cond, context, num_inference_steps=50,
                           guidance_scale=6.0, seed=1245644, density=None,
                           scheduler_type=None, shift=None, boundary=None,
                           cfg_skip_ratio=0.0,
                           teacache_thresh=0.0, teacache_skip_start=5,
                           teacache_coefficients=None,
                           offload_dit_for_decode: Optional[bool] = None,
                           output_type="np", progress_cb=None) -> np.ndarray:
        """Denoise + decode from a prepared conditioning dict (shared by
        the host-video and device-rasterized prepare paths)."""
        latents = self.denoise(cond, context,
                               num_inference_steps=num_inference_steps,
                               guidance_scale=guidance_scale, seed=seed,
                               density=density,
                               scheduler_type=scheduler_type,
                               shift=shift, boundary=boundary,
                               cfg_skip_ratio=cfg_skip_ratio,
                               teacache_thresh=teacache_thresh,
                               teacache_skip_start=teacache_skip_start,
                               teacache_coefficients=teacache_coefficients,
                               progress_cb=progress_cb)
        if output_type == "latent":
            return np.asarray(latents)
        if offload_dit_for_decode is None:
            _, lt, lh, lw = cond["latent_shape"]
            cfgv = self.cfg.vae
            offload_dit_for_decode = self._use_streaming(
                1, (lt - 1) * cfgv.temporal_compression_ratio + 1,
                lh * cfgv.spatial_compression_ratio,
                lw * cfgv.spatial_compression_ratio)
        if offload_dit_for_decode:
            self.offload_dit_to_host()
        # fetch as uint8: the tunnel moves tens of MB/s, and the video is
        # written to 8-bit media anyway (fp32 fetch of a flagship clip is
        # 510 MB ≈ half a minute; uint8 is 127 MB). On the streamed path
        # each group's fetch overlaps the next group's decode.
        u8 = self._decode_u8_host(latents)               # [B, T, H, W, 3]
        out = u8.transpose(0, 4, 1, 2, 3).astype(np.float32) / 255.0
        if offload_dit_for_decode:
            self.restore_dit()
        return out

    def _decode_u8_host(self, latents: jnp.ndarray) -> np.ndarray:
        """Decode -> host uint8 [B, T, H, W, 3]; group-wise async fetch on
        the streamed path (see `vae_decode_streamed_u8`)."""
        n, _, lt, lh, lw = latents.shape
        mesh = getattr(self, "vae_mesh", None)
        if mesh is None and self._use_streaming(n, lt * 4, lh * 16, lw * 16):
            big = n * lt * lh * lw * 4 * 256 > self.VAE_STREAM_THRESHOLD
            # tiny groups exist to coexist with the resident 5B weights;
            # with the DiT offloaded/released the whole chip is the
            # decoder's — bigger groups halve the launch count (the axon
            # link is per-launch-latency bound when degraded)
            dit_resident = self.models.dit_params is not None
            import os as _os
            env_g = _os.environ.get("FLEXAM_DECODE_GROUP")
            first = int(env_g) if env_g else (
                (2 if big else 4) if dit_resident else 4)
            # OOM retry ladder: toolchain/XLA versions move the streamed
            # decoder's HLO-temp footprint by gigabytes at flagship
            # resolution (measured 2026-08-17: the same group-4 program
            # went from fitting to 16.6 GB under a compiler swap).
            # Halving the group trades launches for memory instead of
            # failing the whole generate().
            sizes = [g for g in (first, 2, 1) if g <= first]
            sizes = sorted(set(sizes), reverse=True)
            # FLEXAM_DECODE_FETCH=yuv420 fetches device-subsampled 4:2:0
            # (1.5 B/px vs 3) and reassembles RGB on host — halves the
            # decode phase's tunnel bytes; lossless w.r.t. the yuv420p
            # media encode the video gets anyway.
            yuv = _os.environ.get("FLEXAM_DECODE_FETCH", "") == "yuv420"
            last = None
            for i, g in enumerate(sizes):
                try:
                    if yuv:
                        from flexam_tpu.models.vae_stream import (
                            vae_decode_streamed_yuv420, yuv420_to_rgb)
                        luma, uv = vae_decode_streamed_yuv420(
                            self.models.vae_params, self.cfg.vae,
                            latents.astype(self.compute_dtype), group_size=g)
                        return yuv420_to_rgb(luma, uv)
                    return vae_decode_streamed_u8(
                        self.models.vae_params, self.cfg.vae,
                        latents.astype(self.compute_dtype), group_size=g)
                except Exception as e:       # OOM surfaces as
                    msg = str(e)             # JaxRuntimeError OR ValueError
                    if ("RESOURCE_EXHAUSTED" not in msg
                            and "out of memory" not in msg.lower()):
                        raise
                    print(f"WARNING: streamed decode OOM at group_size="
                          f"{g}; retrying smaller", flush=True)
                    last = e
                    import gc
                    import time as _time
                    gc.collect()
                    if i == len(sizes) - 2:
                        # last resort next: also drop cached executables
                        # (their device allocations) before the smallest
                        # group attempt
                        jax.clear_caches()
                    _time.sleep(2.0)
            raise last
        out = self._to_u8_jit(self._decode(latents))     # [B, 3, T, H, W]
        return np.asarray(out).transpose(0, 2, 3, 4, 1)

    @partial(jax.jit, static_argnums=(0,))
    def _to_u8_jit(self, out):
        x = (out.astype(jnp.float32) + 1.0) * (255.0 / 2.0)
        return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
