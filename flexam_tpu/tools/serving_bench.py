"""Serving-session benchmark: N sequential flagship generates on the
attached chip, per-phase timed and probe-gated (VERDICT r3 item 6).

The deployment question this answers: on a 16 GB v5e, the bf16 5B DiT
(9.6 GB) cannot stay resident through the full-resolution VAE decode, so
the r3 serving sessions paid a 212-378 s host->device restore after every
run. The quantized residency modes keep the weights on-chip the whole
session:

  bf16-offload   r3 default: bf16 denoise; DiT offloads to host around
                 the decode; the per-run restore dominates session cost.
  fp8            storage fp8-e4m3 (~5 GB, `utils/fp8.py`): decode runs
                 next to the weights; denoise at bf16 rate (in-jit
                 autocast).
  int8           block linears int8 (~5.7 GB, `ops/qlinear.py`): decode
                 next to the weights AND 1.31x faster denoise
                 (1.610 vs 2.113 s/step measured round 4).

`--attention sparse` stacks the block-sparse video attention on top of
the residency mode (the fully ACCELERATED serving config: int8 linears +
sparse attention — combined quality bound measured on the trained gate,
tests/test_sparse_quality.py `test_combined_int8_sparse_quality_bound`),
and `--cfg-skip R` drops the uncond branch for the last R fraction of
steps (the reference's `cfg_skip()`).

Usage:
  python -m flexam_tpu.tools.serving_bench --mode int8 --runs 5
  python -m flexam_tpu.tools.serving_bench --mode int8 --attention sparse
  python -m flexam_tpu.tools.serving_bench --mode bf16-offload --runs 2

Emits one JSON line per run {run, probe_rtt_ms, prepare_s, denoise_s,
decode_s, e2e_s, restore_dit_s?} plus a final summary line with phase
medians — the format of the round-3 evidence log
(artifacts_medians_r3.log), so sessions are comparable across rounds.

Workload: the reference default geometry (512x896x97f, 50 CFG steps,
SURVEY.md §2.7) from an image + synthetic linear tracks, random weights
(throughput is value-independent), random text context (no T5 tower —
its encode is a one-off per prompt, not a serving-loop cost).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(msg):
    print(f"[serve_bench] {msg}", file=sys.stderr, flush=True)


def enable_compile_cache():
    """Point jax at the repo's persistent compile cache when it is safe:
    the cache's serialize RPC can wedge the axon tunnel for minutes, so
    pre-flight it in a SUBPROCESS with a timeout first (bench.py
    `_cache_is_safe` pattern). FLEXAM_JAX_CACHE=0/1 overrides."""
    import os
    import subprocess

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    env = os.environ.get("FLEXAM_JAX_CACHE", "")
    if env == "0" or not os.path.isdir(cache_dir):
        return
    if env != "1":
        code = ("import jax\n"
                f"jax.config.update('jax_compilation_cache_dir', "
                f"{cache_dir!r})\n"
                "import jax.numpy as jnp\n"
                "float(jnp.sum(jax.jit(lambda x: x + 1)"
                "(jnp.ones((8, 128)))))\n")
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=75,
                               capture_output=True)
            if r.returncode != 0:
                return
        except subprocess.TimeoutExpired:
            log("compile cache disabled: serialize RPC wedged")
            return
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"persistent compile cache on: {cache_dir}")


def fast_random_params(init_fn, dtype, tag="init"):
    """Random params from the shape skeleton in ONE fused jit — the
    structured xavier init compiles ~10 min on a 1-core host (same trick
    as bench.py). Even the fused-RNG jit compiles for ~2 min at 5B scale
    (1100+ rng ops), so it routes through the executable cache: a warm
    .aot_cache turns the 135 s "DiT init" of a fresh serving process
    into a sub-second load."""
    import jax
    import jax.numpy as jnp

    from flexam_tpu.utils.aot_cache import aot_call

    skeleton = jax.eval_shape(lambda k: init_fn(k, dtype), jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(skeleton)

    @jax.jit
    def make(key):
        keys = jax.random.split(key, len(leaves))
        return treedef.unflatten([
            (jax.random.normal(k, l.shape, jnp.float32) * 0.02).astype(l.dtype)
            for k, l in zip(keys, leaves)])

    return aot_call(make, (jax.random.PRNGKey(0),), tag=tag)


def synthetic_inputs(height, width, frames, n_side=3):
    """First frame (bright blob on a gradient) + linear tracks riding it."""
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    base = np.stack([xs / width, ys / height, 0.5 * np.ones_like(xs)])
    p0 = np.array([width * 0.25, height * 0.3])
    p1 = np.array([width * 0.7, height * 0.7])
    sig = min(height, width) / 10.0
    g = np.exp(-(((xs - p0[0]) ** 2 + (ys - p0[1]) ** 2) / (2 * sig * sig)))
    frame = np.clip(base + g[None] * 0.7, 0, 1)[None, :, None]   # [1,3,1,H,W]
    centers = np.linspace(p0, p1, frames)
    offs = np.linspace(-sig, sig, n_side)
    grid = np.stack(np.meshgrid(offs, offs), -1).reshape(-1, 2)
    pts = centers[:, None, :] + grid[None]
    depth = np.full((frames, pts.shape[1], 1), 0.5, np.float32)
    tracks = np.concatenate([pts.astype(np.float32), depth], -1)
    return frame.astype(np.float32), tracks


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--mode", default="int8",
                    choices=("bf16-offload", "fp8", "int8"))
    ap.add_argument("--attention", default="default",
                    choices=("default", "sparse"),
                    help="sparse = block-sparse video self-attention "
                         "(ops/sparse_attention.py) on top of the "
                         "residency mode")
    ap.add_argument("--sparse-window", type=int, default=2)
    ap.add_argument("--cfg-skip", type=float, default=0.0,
                    help="cfg_skip_ratio for the denoise loop")
    ap.add_argument("--aot-cache", default=None, metavar="DIR",
                    help="serialized-executable cache dir "
                         "(utils/aot_cache.py): a fresh process skips "
                         "the XLA compile bill when the dir is warm")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, nargs=2, default=(512, 896),
                    metavar=("H", "W"))
    ap.add_argument("--frames", type=int, default=97)
    ap.add_argument("--guidance", type=float, default=6.0)
    ap.add_argument("--steps-per-launch", type=int, default=None,
                    help="denoise chunk length per device launch "
                         "(pipeline.steps_per_launch, default 14). The "
                         "tunnel watchdog kills executables > ~60 s, so "
                         "long-sequence runs must shrink it: ~8 at 161f "
                         "(18,816 tokens), ~5 at 225f (25,984 tokens)")
    ap.add_argument("--riflex", type=int, default=None, metavar="K",
                    help="RIFLEx long-video RoPE: rescale the K-th "
                         "temporal frequency for this run's latent "
                         "frame count (`pipe.enable_riflex`; reference "
                         "`wan_transformer3d_FlexAM.py:774-799`). Use "
                         "K=6 with --frames 161/225 for the long-video "
                         "regime (VERDICT r4 item 5)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config smoke (CI / off-chip); pair with "
                         "--size 32 32 --frames 9 --steps 2")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args(argv)

    import os

    if args.attention == "sparse":
        # resolved per latent geometry by pipeline._resolve_attn_fn
        os.environ["FLEXAM_ATTENTION"] = "sparse"
        os.environ["FLEXAM_SPARSE_WINDOW"] = str(args.sparse_window)
    if args.aot_cache:
        os.environ["FLEXAM_AOT_CACHE"] = args.aot_cache
    # configure the executable cache BEFORE param init so the fused-RNG
    # init jits hit it too (the pipeline constructor configures it again,
    # idempotently, for its own jits)
    from flexam_tpu.utils import aot_cache
    aot_cache.configure(None)            # reads FLEXAM_AOT_CACHE

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if not args.tiny:
        enable_compile_cache()
    import jax.numpy as jnp

    from flexam_tpu.config import WAN22_5B_FLEXAM, tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels
    from flexam_tpu.utils.linkprobe import probe_link

    cfg = tiny_test_config() if args.tiny else WAN22_5B_FLEXAM
    t0 = time.perf_counter()
    dit_params = fast_random_params(
        lambda k, d: init_dit_params(k, cfg.dit, dtype=d), jnp.bfloat16)
    float(jnp.sum(dit_params["head"]["head"]["bias"].astype(jnp.float32)))
    log(f"DiT init {time.perf_counter() - t0:.1f}s on {jax.devices()[0]}")
    t0 = time.perf_counter()
    vae_params = fast_random_params(
        lambda k, d: init_vae_params(k, cfg.vae), jnp.float32)
    jax.block_until_ready(jax.tree_util.tree_leaves(vae_params)[0])
    log(f"VAE init {time.perf_counter() - t0:.1f}s")

    quant = {"fp8": "fp8", "int8": "int8"}.get(args.mode)
    models = FlexAMModels(cfg=cfg, dit_params=dit_params,
                          vae_params=vae_params)
    del dit_params, vae_params          # the pipeline owns the buffers now
    t0 = time.perf_counter()
    pipe = FlexAMGenerationPipeline(models, compute_dtype=jnp.bfloat16,
                                    quant=quant)
    if quant:
        jax.block_until_ready(jax.tree_util.tree_leaves(
            pipe.models.dit_params)[0])
        log(f"quantize({quant}) {time.perf_counter() - t0:.1f}s")
    resident = args.mode != "bf16-offload"

    if args.steps_per_launch is not None:
        pipe.steps_per_launch = max(1, args.steps_per_launch)
        log(f"steps_per_launch={pipe.steps_per_launch}")

    h, w = args.size
    frame, tracks = synthetic_inputs(h, w, args.frames)
    ctx = jnp.asarray(np.random.RandomState(0).randn(
        2, cfg.t5.text_length, cfg.dit.text_dim) * 0.02, jnp.bfloat16)
    if args.riflex is not None:
        lat_frames = 1 + (args.frames - 1) // cfg.vae.temporal_compression_ratio
        pipe.enable_riflex(k=args.riflex, L_test=lat_frames)
        log(f"RIFLEx on: k={args.riflex}, L_test={lat_frames}")

    init_s = round(time.perf_counter() - t0, 1)
    records = []
    for run in range(args.runs):
        probe = probe_link()
        rec = {"run": run, "mode": args.mode,
               "probe_rtt_ms": probe.get("rtt_ms_median"),
               "healthy": probe.get("healthy")}
        if args.attention != "default":
            rec["attention"] = args.attention
            rec["sparse_window"] = args.sparse_window
        if args.cfg_skip:
            rec["cfg_skip"] = args.cfg_skip
        if args.riflex is not None:
            rec["riflex_k"] = args.riflex
            rec["frames"] = args.frames
        t_run = time.perf_counter()

        t0 = time.perf_counter()
        cond = pipe.prepare_conditioning_from_tracks(
            tracks, None, h, w, point_wise=4, first_frame=frame)
        float(jnp.sum(cond["control_latents"][:, :1, :1, :1, :1]
                      .astype(jnp.float32)))
        rec["prepare_s"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        latents = pipe.denoise(cond, ctx,
                               num_inference_steps=args.steps,
                               guidance_scale=args.guidance, seed=run,
                               cfg_skip_ratio=args.cfg_skip)
        float(jnp.sum(latents[:, :1, :1, :1, :1].astype(jnp.float32)))
        dt = max(time.perf_counter() - t0, 1e-6)
        rec["denoise_s"] = round(dt, 1)
        rec["steps_per_s"] = round(args.steps / dt, 4)

        t0 = time.perf_counter()
        if not resident:
            pipe.offload_dit_to_host()
        u8 = pipe._decode_u8_host(latents)
        rec["decode_s"] = round(time.perf_counter() - t0, 1)
        if not resident:
            t0 = time.perf_counter()
            pipe.restore_dit()
            rec["restore_dit_s"] = round(time.perf_counter() - t0, 1)
        rec["e2e_s"] = round(time.perf_counter() - t_run, 1)
        rec["video_shape"] = list(u8.shape)
        del latents, u8
        print(json.dumps(rec), flush=True)
        records.append(rec)

    warm = records[1:] or records
    med = {k: round(float(np.median([r[k] for r in warm if k in r])), 2)
           for k in ("prepare_s", "denoise_s", "decode_s", "e2e_s",
                     "steps_per_s", "restore_dit_s")
           if any(k in r for r in warm)}
    summary = {"summary": True, "mode": args.mode,
               "runs": args.runs, "init_s": init_s,
               "warm_medians": med,
               "run0_e2e_s": records[0]["e2e_s"]}
    if args.attention != "default":
        summary["attention"] = args.attention
        summary["sparse_window"] = args.sparse_window
    if args.cfg_skip:
        summary["cfg_skip"] = args.cfg_skip
    if args.riflex is not None:
        summary["riflex_k"] = args.riflex
        summary["frames"] = args.frames
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
