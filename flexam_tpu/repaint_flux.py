"""Native FLUX.1-Depth repaint backend.

The reference's first-frame repainter builds a ``FluxControlPipeline``
around FLUX.1-Depth-dev and runs 30 steps at guidance 7.5
(`pipelines.py:137-173`). This module assembles that pipeline from the
native ports: `models/flux.py` (MMDiT), `models/flux_vae.py` (KL VAE),
`models/t5.py` (T5-v1.1 shared-pos mode) and `models/clip_text.py`
(CLIP-L pooled), all TPU-resident under jit.

Flow (the Control-pipeline contract):
  1. depth map -> RGB control image -> VAE-encode (posterior mean) ->
     2x2-pack -> control tokens [1, L, 64];
  2. text: T5 features [1, 512, 4096] + CLIP pooled [1, 768]
     (tokenizers are injectable; absent ones fall back to the same
     deterministic prompt-hash ids the main pipeline uses);
  3. rectified-flow Euler over the resolution-shifted schedule, the
     guidance scale embedded (dev models are guidance-distilled — no
     CFG pair);
  4. VAE-decode -> uint8 image.

The denoise loop is a `lax.scan` inside ONE jit per chunk
(`steps_per_launch`, same ~60 s executable-watchdog discipline as the
main pipeline), with params passed as jit arguments (never closed over).

Weights: `load_flux_repainter()` reads the official single-file
checkpoints (FLEXAM_FLUX_CKPT -> flux1-depth-dev.safetensors,
FLEXAM_FLUX_AE -> ae.safetensors, optional FLEXAM_FLUX_T5 /
FLEXAM_FLUX_CLIP HF state dicts) through the exact name maps with
`io/verify_load` coverage gating.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.config import T5Config
from flexam_tpu.io.verify_load import check_mapping
from flexam_tpu.models.clip_text import (CLIPTextConfig, clip_text_forward,
                                         clip_text_params_from_state_dict,
                                         init_clip_text_params)
from flexam_tpu.models.flux import (FluxConfig, flux_forward,
                                    flux_params_from_state_dict,
                                    flux_schedule, init_flux_params,
                                    make_img_ids, pack_latents,
                                    unpack_latents)
from flexam_tpu.models.flux_vae import (FluxVAEConfig, flux_vae_decode,
                                        flux_vae_encode,
                                        flux_vae_params_from_state_dict,
                                        init_flux_vae_params)
from flexam_tpu.models.t5 import (init_t5_params, t5_encode,
                                  t5_params_from_hf_state_dict)

FLUX_T5_CONFIG = T5Config(vocab=32128, dim=4096, dim_attn=4096,
                          dim_ffn=10240, num_heads=64, num_layers=24,
                          num_buckets=32, shared_pos=True, text_length=512)


class FluxDepthRepainter:
    """Depth-conditioned FLUX image generation behind the reference's
    repaint call shape (30 steps, guidance 7.5, `pipelines.py:166-173`).

    Use `as_repaint_fn()` to plug into `repaint.FirstFrameRepainter`.
    """

    def __init__(self, params: dict, vae_params: dict,
                 t5_params: Optional[dict] = None,
                 clip_params: Optional[dict] = None,
                 cfg: FluxConfig = FluxConfig(),
                 vae_cfg: FluxVAEConfig = FluxVAEConfig(),
                 t5_cfg: T5Config = FLUX_T5_CONFIG,
                 clip_cfg: CLIPTextConfig = CLIPTextConfig(),
                 t5_tokenizer=None, clip_tokenizer=None,
                 dtype=jnp.bfloat16, steps_per_launch: int = 10,
                 text_from_checkpoint: bool = False):
        # text_from_checkpoint: loader provenance — True means the text
        # towers hold REAL weights, so hashed prompt ids are refused in
        # encode_text (they would silently ignore the prompt).
        self.text_from_checkpoint = text_from_checkpoint
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), params)
        self.vae_params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), vae_params)
        self.t5_params = t5_params
        self.clip_params = clip_params
        self.cfg, self.vae_cfg = cfg, vae_cfg
        self.t5_cfg, self.clip_cfg = t5_cfg, clip_cfg
        self.t5_tokenizer, self.clip_tokenizer = t5_tokenizer, clip_tokenizer
        self.dtype = dtype
        self.steps_per_launch = steps_per_launch
        self._vae_factor = 2 ** (len(vae_cfg.ch_mult) - 1)

    # -- text ---------------------------------------------------------------

    def _hash_ids(self, prompt: str, length: int, vocab: int) -> np.ndarray:
        ids = np.zeros((1, length), np.int32)
        raw = np.frombuffer(prompt.encode()[:length] or b"\x01",
                            np.uint8).astype(np.int32)
        ids[0, :len(raw)] = raw % max(vocab, 2)
        return ids

    def _refuse_hashed(self, tower: str):
        import os
        if (self.text_from_checkpoint
                and os.environ.get("FLEXAM_ALLOW_HASHED_IDS") != "1"):
            raise RuntimeError(
                f"FLUX {tower} weights were loaded from a checkpoint but "
                f"no {tower} tokenizer is attached: hashed prompt ids "
                "through trained embeddings are garbage conditioning. "
                "Pass the tokenizer (FLEXAM_FLUX_T5_TOKENIZER / "
                "FLEXAM_FLUX_CLIP_TOKENIZER point at HF tokenizer dirs) "
                "or set FLEXAM_ALLOW_HASHED_IDS=1 to override (debug).")

    def encode_text(self, prompt: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(T5 features [1, L, context_dim], CLIP pooled [1, vec_dim])."""
        if self.t5_params is not None:
            if self.t5_tokenizer is None:
                self._refuse_hashed("T5")
            if self.t5_tokenizer is not None:
                enc = self.t5_tokenizer(
                    [prompt], padding="max_length", truncation=True,
                    max_length=self.t5_cfg.text_length, return_tensors="np")
                ids = enc["input_ids"].astype(np.int32)
            else:
                ids = self._hash_ids(prompt, self.t5_cfg.text_length,
                                     self.t5_cfg.vocab)
            txt = t5_encode(self.t5_params, self.t5_cfg, jnp.asarray(ids))
        else:   # random-init smoke path: hashed pseudo-features
            import zlib
            rng = np.random.default_rng(
                zlib.crc32(prompt.encode()) & 0x7FFFFFFF)
            txt = jnp.asarray(rng.standard_normal(
                (1, 64, self.cfg.context_dim)), jnp.float32)
        if self.clip_params is not None:
            if self.clip_tokenizer is None:
                self._refuse_hashed("CLIP")
            if self.clip_tokenizer is not None:
                enc = self.clip_tokenizer(
                    [prompt], padding="max_length", truncation=True,
                    max_length=self.clip_cfg.max_positions,
                    return_tensors="np")
                cids = enc["input_ids"].astype(np.int32)
            else:
                cids = self._hash_ids(prompt, self.clip_cfg.max_positions,
                                      self.clip_cfg.vocab)
            _, pooled = clip_text_forward(self.clip_params, self.clip_cfg,
                                          jnp.asarray(cids))
        else:
            import zlib
            rng = np.random.default_rng(
                zlib.crc32(("clip" + prompt).encode()) & 0x7FFFFFFF)
            pooled = jnp.asarray(rng.standard_normal(
                (1, self.cfg.vec_dim)), jnp.float32)
        return txt.astype(self.dtype), pooled.astype(self.dtype)

    # -- generation ---------------------------------------------------------

    def __call__(self, prompt: str, control_depth: np.ndarray,
                 height: int, width: int, num_inference_steps: int = 30,
                 guidance_scale: float = 7.5, seed: int = 0) -> np.ndarray:
        """control_depth: [H, W] float (any range) or [H, W, 3] uint8 —
        rendered to the RGB control image, VAE-encoded, packed, and
        channel-concatenated each step. Returns uint8 [H, W, 3]."""
        f, p = self._vae_factor, self.cfg.patch
        height -= height % (f * p)
        width -= width % (f * p)
        ctrl = np.asarray(control_depth, np.float32)
        if ctrl.ndim == 2:
            lo, hi = float(ctrl.min()), float(ctrl.max())
            ctrl = (ctrl - lo) / max(hi - lo, 1e-6)
            ctrl = np.repeat(ctrl[..., None], 3, axis=-1)
        elif ctrl.dtype != np.float32 or ctrl.max() > 1.5:
            ctrl = ctrl / 255.0
        if ctrl.shape[:2] != (height, width):
            ctrl = np.asarray(jax.image.resize(
                jnp.asarray(ctrl), (height, width, 3), "bilinear"))
        ctrl = jnp.asarray(ctrl * 2.0 - 1.0, self.dtype)[None]

        ctrl_z = flux_vae_encode(self.vae_params, self.vae_cfg, ctrl)
        ctrl_tok = pack_latents(
            jnp.transpose(ctrl_z, (0, 3, 1, 2)), p)           # [1, L, 64]

        lh, lw = height // f, width // f
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(
            key, (1, self.vae_cfg.z_channels, lh, lw), jnp.float32)
        img = pack_latents(noise, p).astype(self.dtype)
        img_ids = jnp.asarray(make_img_ids(lh, lw, p))
        txt, pooled = self.encode_text(prompt)
        txt_ids = jnp.zeros((txt.shape[1], 3), jnp.int32)
        guidance = jnp.full((1,), guidance_scale, jnp.float32)

        sigmas = flux_schedule(num_inference_steps, img.shape[1])
        done = 0
        while done < num_inference_steps:
            n = min(self.steps_per_launch, num_inference_steps - done)
            img = self._run_chunk(
                img, ctrl_tok, img_ids, txt, txt_ids, pooled, guidance,
                sigmas[done:done + n + 1], n)
            done += n

        z = unpack_latents(img.astype(jnp.float32), lh, lw, p)
        out = flux_vae_decode(self.vae_params, self.vae_cfg,
                              jnp.transpose(z, (0, 2, 3, 1)))
        out = np.asarray(out.astype(jnp.float32))[0]
        return (np.clip(out * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8)

    def _run_chunk(self, img, ctrl_tok, img_ids, txt, txt_ids, pooled,
                   guidance, sigmas, n):
        return _denoise_chunk_ctrl(
            self.params, self.cfg, img, ctrl_tok, img_ids, txt, txt_ids,
            pooled, guidance, jnp.asarray(sigmas), n)

    def as_repaint_fn(self, seed: int = 0) -> Callable:
        """Adapter for `FirstFrameRepainter(repaint_fn=...)`."""
        def fn(prompt, depth, height, width, num_inference_steps=30,
               guidance_scale=7.5):
            return self(prompt, depth, height, width,
                        num_inference_steps=num_inference_steps,
                        guidance_scale=guidance_scale, seed=seed)
        return fn


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"))
def _denoise_chunk_ctrl(params, cfg: FluxConfig, img, ctrl_tok, img_ids,
                        txt, txt_ids, vec_y, guidance, sigmas,
                        n_steps: int):
    """Control variant: the packed control tokens concat to the packed
    latents on the channel axis EVERY step (in_channels = 64 + 64)."""
    def step(carry, i):
        x = carry
        t = jnp.full((x.shape[0],), sigmas[i], jnp.float32)
        xin = jnp.concatenate([x, ctrl_tok.astype(x.dtype)], axis=-1)
        v = flux_forward(params, cfg, xin, img_ids, txt, txt_ids, t,
                         vec_y, guidance)
        # fp32 Euler update, carry stays in the storage dtype (bf16 path)
        nxt = (x.astype(jnp.float32)
               + (sigmas[i + 1] - sigmas[i]) * v.astype(jnp.float32))
        return nxt.astype(x.dtype), None

    img, _ = jax.lax.scan(step, img, jnp.arange(n_steps))
    return img


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_flux_repainter(ckpt: Optional[str] = None,
                        ae: Optional[str] = None,
                        t5: Optional[str] = None,
                        clip: Optional[str] = None,
                        cfg: FluxConfig = FluxConfig(),
                        vae_cfg: FluxVAEConfig = FluxVAEConfig(),
                        dtype=jnp.bfloat16,
                        coverage_threshold: float = 0.95
                        ) -> "FluxDepthRepainter":
    """Build a repainter from the official checkpoint files (paths or the
    FLEXAM_FLUX_CKPT / FLEXAM_FLUX_AE / FLEXAM_FLUX_T5 / FLEXAM_FLUX_CLIP
    env vars). Transformer + VAE maps are coverage-gated (strict): a
    mis-shaped file refuses loudly instead of repainting with noise.
    Missing T5/CLIP fall back to hashed pseudo-conditioning (smoke runs).
    """
    from flexam_tpu.io.checkpoints import _load_one

    ckpt = ckpt or os.environ.get("FLEXAM_FLUX_CKPT")
    ae = ae or os.environ.get("FLEXAM_FLUX_AE")
    t5 = t5 or os.environ.get("FLEXAM_FLUX_T5")
    clip = clip or os.environ.get("FLEXAM_FLUX_CLIP")
    if not ckpt or not ae:
        raise FileNotFoundError(
            "FLUX repaint needs the transformer (FLEXAM_FLUX_CKPT) and "
            "autoencoder (FLEXAM_FLUX_AE) checkpoint files")
    params, rep = flux_params_from_state_dict(_load_one(ckpt), cfg)
    check_mapping(rep, f"flux:{os.path.basename(ckpt)}",
                  threshold=coverage_threshold, strict=True)
    vae_params, vrep = flux_vae_params_from_state_dict(_load_one(ae),
                                                       vae_cfg)
    check_mapping(vrep, f"flux-ae:{os.path.basename(ae)}",
                  threshold=coverage_threshold, strict=True)
    t5_params = clip_params = None
    t5_tok = clip_tok = None
    if t5:
        t5_params = t5_params_from_hf_state_dict(
            _load_one(t5), FLUX_T5_CONFIG, dtype=np.float32)
        t5_params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), t5_params)
    if clip:
        clip_params = clip_text_params_from_state_dict(
            _load_one(clip), CLIPTextConfig())
        clip_params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), clip_params)
    # real text weights demand real tokenizers (encode_text refuses the
    # hashed-id fallback when text_from_checkpoint is set)
    t5_tok_dir = os.environ.get("FLEXAM_FLUX_T5_TOKENIZER")
    clip_tok_dir = os.environ.get("FLEXAM_FLUX_CLIP_TOKENIZER")
    if t5_params is not None and t5_tok_dir:
        from transformers import AutoTokenizer
        t5_tok = AutoTokenizer.from_pretrained(t5_tok_dir)
    if clip_params is not None and clip_tok_dir:
        from transformers import AutoTokenizer
        clip_tok = AutoTokenizer.from_pretrained(clip_tok_dir)
    return FluxDepthRepainter(params, vae_params, t5_params, clip_params,
                              cfg=cfg, vae_cfg=vae_cfg, dtype=dtype,
                              t5_tokenizer=t5_tok, clip_tokenizer=clip_tok,
                              text_from_checkpoint=bool(t5 or clip))


def make_tiny_repainter(seed: int = 0,
                        dtype=jnp.float32) -> FluxDepthRepainter:
    """Random-init tiny-geometry repainter (tests / smoke runs)."""
    cfg = FluxConfig.tiny(in_channels=32)
    vae_cfg = FluxVAEConfig.tiny()
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    return FluxDepthRepainter(
        init_flux_params(k1, cfg), init_flux_vae_params(k2, vae_cfg),
        cfg=cfg, vae_cfg=vae_cfg, dtype=dtype, steps_per_launch=4)
