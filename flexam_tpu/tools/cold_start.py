"""Time-to-first-video for a COLD serving process (VERDICT r4 item 3).

The deployment recipe under test: fresh process + prequantized int8 DiT
.npz (`tools/prequant_ckpt.py`) + warm serialized-executable dir
(`utils/aot_cache.py`) + link probe. Round-4 measured the pieces
separately (227 s cold start, ~136 s of it the ~5 GB bf16 weight upload);
this tool measures the composed stack end-to-end and attacks the upload
floor with two levers:

  --upload-threads N   split the host tree across N concurrent
                       device_puts — the axon tunnel multiplexes
                       streams, so a single sequential put leaves
                       bandwidth on the table.
  --overlap            run the DiT upload in a background thread while
                       the main thread does everything that does NOT
                       need the DiT: VAE upload, prepare-stage compiles
                       or aot-cache loads, and the conditioning
                       pipeline itself (prepare only touches the VAE).
  --stream-upload      pipeline the npz read with the upload: each zip
                       member device_puts as soon as it decodes, so the
                       ~95 s host load hides under the ~180 s tunnel
                       transfer instead of preceding it (npz members
                       decode lazily on access — io/checkpoints.py
                       save_pytree layout).

Usage (flagship, on the chip):
  python -m flexam_tpu.tools.cold_start --make-prequant /tmp/dit5b_int8.npz
  python -m flexam_tpu.tools.cold_start --prequant /tmp/dit5b_int8.npz \
      --aot-cache .aot_cache --overlap --upload-threads 4

Emits one JSON line: every phase in seconds since PROCESS START
(time-to-first-video is `ttfv_s`), plus the probe verdict so a degraded
tunnel window is attributable (CLAUDE.md: tunnel health varies >10x).

The reference has no counterpart — its serving story reloads + re-converts
the fp8 weights every process (`fp8_optimization.py:19-34`) and
torch.compile caches nothing across processes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def log(msg):
    print(f"[cold_start +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def make_prequant(out_path: str) -> None:
    """Write a flagship-shape prequantized int8 DiT .npz WITHOUT a real
    checkpoint (pure host work, values random): the artifact a deploy
    would produce with tools/prequant_ckpt from real weights. Upload and
    compile timing are value-independent."""
    import jax

    jax.config.update("jax_platforms", "cpu")     # never touch the chip
    import jax.numpy as jnp
    import ml_dtypes

    from flexam_tpu.config import WAN22_5B_FLEXAM
    from flexam_tpu.io.checkpoints import save_pytree
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.ops.qlinear import convert_dit_to_int8

    skeleton = jax.eval_shape(
        lambda k: init_dit_params(k, WAN22_5B_FLEXAM.dit,
                                  dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    qskel = jax.eval_shape(convert_dit_to_int8, skeleton)
    rng = np.random.RandomState(0)

    def leaf(path, sds):
        shape = tuple(sds.shape)
        if path.endswith("weight_q"):
            return rng.randint(-127, 128, shape).astype(np.int8)
        if path.endswith("w_scale"):
            return np.full(shape, 0.01, np.float32)
        return (rng.rand(*shape).astype(np.float32) * 0.02 - 0.01
                ).astype(ml_dtypes.bfloat16)

    def visit(prefix, node):
        if isinstance(node, dict):
            return {k: visit(f"{prefix}/{k}", v) for k, v in node.items()}
        return leaf(prefix, node)

    tree = visit("", qskel)
    n = sum(a.nbytes for a in jax.tree_util.tree_leaves(tree))
    save_pytree(out_path, tree)
    log(f"wrote {n / 1e9:.2f} GB prequantized 5B tree -> {out_path}")


def parallel_put(tree, n_threads: int):
    """device_put every leaf via N concurrent streams (leaves sorted
    largest-first onto the emptiest thread — classic LPT binpack), then
    block. Returns the device tree."""
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if n_threads <= 1:
        dev = [jnp.asarray(x) for x in leaves]
        jax.block_until_ready(dev)
        return jax.tree_util.tree_unflatten(treedef, dev)
    order = sorted(range(len(leaves)),
                   key=lambda i: -getattr(leaves[i], "nbytes", 0))
    out = [None] * len(leaves)

    def put(i):
        out[i] = jnp.asarray(leaves[i])
        return out[i]

    with cf.ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(put, order))
    jax.block_until_ready(out)
    return jax.tree_util.tree_unflatten(treedef, out)


def stream_upload_npz(path: str, n_threads: int):
    """Pipelined npz read -> device_put: the single host core decodes
    the next zip member while earlier members are already in flight on
    the tunnel, so disk decode and upload overlap instead of serialize.
    Returns (nested device tree, total bytes)."""
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    futs = {}
    n_bytes = 0
    with np.load(path) as z, cf.ThreadPoolExecutor(
            max_workers=max(n_threads, 1)) as ex:
        for k in z.files:
            arr = z[k]                    # zip decode (CPU-bound)
            if k.endswith("::bf16"):
                key, arr = k[:-6], arr.view(ml_dtypes.bfloat16)
            elif k.endswith("::f8e4m3"):
                key, arr = k[:-8], arr.view(ml_dtypes.float8_e4m3fn)
            else:
                key = k
            n_bytes += arr.nbytes
            futs[key] = ex.submit(jnp.asarray, arr)
        flat = {k: f.result() for k, f in futs.items()}
    jax.block_until_ready(list(flat.values()))
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree, n_bytes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--make-prequant", metavar="OUT.npz",
                    help="write a flagship-shape int8 npz (host-only) "
                         "and exit")
    ap.add_argument("--prequant", metavar="NPZ",
                    help="prequantized DiT tree to serve")
    ap.add_argument("--aot-cache", default=None, metavar="DIR")
    ap.add_argument("--overlap", action="store_true",
                    help="upload the DiT concurrently with the "
                         "prepare stage")
    ap.add_argument("--upload-threads", type=int, default=1)
    ap.add_argument("--stream-upload", action="store_true",
                    help="pipeline the npz read with the upload "
                         "(device_put each member as it decodes)")
    ap.add_argument("--size", type=int, nargs=2, default=(512, 896),
                    metavar=("H", "W"))
    ap.add_argument("--frames", type=int, default=97)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=6.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config smoke (pair with --size 32 32 "
                         "--frames 9 --steps 2); --prequant should then "
                         "be a tiny-tree npz (tools/prequant_ckpt "
                         "--checkpoint random:tiny)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.make_prequant:
        make_prequant(args.make_prequant)
        return 0
    if not args.prequant:
        ap.error("--prequant or --make-prequant required")

    rec = {"recipe": "prequant-int8 + warm-aot + probe",
           "overlap": args.overlap, "upload_threads": args.upload_threads,
           "stream_upload": args.stream_upload}

    if args.aot_cache:
        os.environ["FLEXAM_AOT_CACHE"] = args.aot_cache
    from flexam_tpu.utils import aot_cache
    aot_cache.configure(None)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from flexam_tpu.config import WAN22_5B_FLEXAM, tiny_test_config
    from flexam_tpu.io.checkpoints import restore_pytree_nested
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import (FlexAMGenerationPipeline,
                                     FlexAMModels, _put_quantized)
    from flexam_tpu.tools.serving_bench import (fast_random_params,
                                                synthetic_inputs)
    from flexam_tpu.utils.linkprobe import probe_link

    cfg = tiny_test_config() if args.tiny else WAN22_5B_FLEXAM

    probe = probe_link()
    rec["probe_rtt_ms"] = probe.get("rtt_ms_median")
    rec["healthy"] = probe.get("healthy")
    rec["probe_done_s"] = round(time.perf_counter() - _T0, 1)
    log(f"probe: rtt {rec['probe_rtt_ms']} ms healthy={rec['healthy']}")

    if args.stream_upload:
        host_dit = None
        n_bytes = os.path.getsize(args.prequant)   # ~= tree bytes (stored)
        rec["npz_load_s"] = 0.0                    # folded into upload
        rec["dit_gb"] = round(n_bytes / 1e9, 2)
    else:
        t0 = time.perf_counter()
        host_dit = restore_pytree_nested(args.prequant)
        n_bytes = sum(a.nbytes
                      for a in jax.tree_util.tree_leaves(host_dit))
        rec["npz_load_s"] = round(time.perf_counter() - t0, 1)
        rec["dit_gb"] = round(n_bytes / 1e9, 2)
        log(f"npz load: {rec['npz_load_s']}s ({rec['dit_gb']} GB)")

    def upload_dit():
        t0 = time.perf_counter()
        if args.stream_upload:
            # read+upload pipelined: zip members decode on the host
            # while earlier members are in flight on the tunnel
            dev, nb = stream_upload_npz(args.prequant,
                                        args.upload_threads)
            rec["dit_gb"] = round(nb / 1e9, 2)
        # host-side dtype translation (fp32 matrices -> bf16) happens in
        # _put_quantized; route the resulting jnp puts through N streams
        # by pre-converting and using parallel_put on the numpy tree
        elif args.upload_threads > 1:
            dev = parallel_put(host_dit, args.upload_threads)
        else:
            dev = _put_quantized(host_dit)
            jax.block_until_ready(jax.tree_util.tree_leaves(dev))
        rec["upload_s"] = round(time.perf_counter() - t0, 1)
        gbps = rec["dit_gb"] / max(rec["upload_s"], 1e-9)
        log(f"DiT upload: {rec['upload_s']}s ({gbps * 1000:.0f} MB/s)")
        return dev

    uploader = None
    if args.overlap:
        import concurrent.futures as cf
        uploader = cf.ThreadPoolExecutor(max_workers=1).submit(upload_dit)
    else:
        dit_dev = upload_dit()

    # everything that does NOT need the DiT: VAE init/upload + the
    # prepare-stage jits (aot-loaded when the dir is warm) + the actual
    # conditioning pipeline
    t0 = time.perf_counter()
    vae_params = fast_random_params(
        lambda k, d: init_vae_params(k, cfg.vae), jnp.float32,
        tag="vae_init")
    jax.block_until_ready(jax.tree_util.tree_leaves(vae_params)[0])
    rec["vae_init_s"] = round(time.perf_counter() - t0, 1)

    h, w = args.size
    frame, tracks = synthetic_inputs(h, w, args.frames)
    ctx = jnp.asarray(np.random.RandomState(0).randn(
        2, cfg.t5.text_length, cfg.dit.text_dim) * 0.02, jnp.bfloat16)

    # a DiT-less pipeline carries the prepare stage while the upload runs
    prep_pipe = FlexAMGenerationPipeline(
        FlexAMModels(cfg=cfg, dit_params=None, vae_params=vae_params),
        compute_dtype=jnp.float32 if args.tiny else jnp.bfloat16)
    t0 = time.perf_counter()
    cond = prep_pipe.prepare_conditioning_from_tracks(
        tracks, None, h, w, point_wise=4, first_frame=frame)
    float(jnp.sum(cond["control_latents"][:, :1, :1, :1, :1]
                  .astype(jnp.float32)))
    rec["prepare_s"] = round(time.perf_counter() - t0, 1)
    log(f"prepare: {rec['prepare_s']}s")

    if uploader is not None:
        t0 = time.perf_counter()
        dit_dev = uploader.result()
        rec["upload_join_s"] = round(time.perf_counter() - t0, 1)
        log(f"upload join (residual wait after prepare): "
            f"{rec['upload_join_s']}s")

    pipe = FlexAMGenerationPipeline(
        FlexAMModels(cfg=cfg, dit_params=dit_dev, vae_params=vae_params),
        compute_dtype=jnp.float32 if args.tiny else jnp.bfloat16)
    del host_dit, dit_dev

    t0 = time.perf_counter()
    latents = pipe.denoise(cond, ctx, num_inference_steps=args.steps,
                           guidance_scale=args.guidance, seed=0)
    float(jnp.sum(latents[:, :1, :1, :1, :1].astype(jnp.float32)))
    rec["denoise_s"] = round(time.perf_counter() - t0, 1)
    rec["steps_per_s"] = round(args.steps / max(rec["denoise_s"], 1e-9), 4)
    log(f"denoise: {rec['denoise_s']}s")

    t0 = time.perf_counter()
    u8 = pipe._decode_u8_host(latents)
    rec["decode_s"] = round(time.perf_counter() - t0, 1)
    rec["video_shape"] = list(u8.shape)
    rec["ttfv_s"] = round(time.perf_counter() - _T0, 1)
    log(f"decode: {rec['decode_s']}s — TTFV {rec['ttfv_s']}s")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
