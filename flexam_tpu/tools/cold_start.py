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
  serve bundle         --make-prequant --with-vae packs the fp32 VAE
                       under vae/ AHEAD of dit/ in the same npz; the
                       stream uploader prioritizes vae/ so the prepare
                       stage starts after a ~10 s VAE upload instead of
                       an 88 s on-device random-init compile (run-B
                       TTFV breakdown, BASELINE.md round 5).

Usage (flagship, on the chip):
  python -m flexam_tpu.tools.cold_start --make-prequant /tmp/bundle.npz \
      --with-vae
  python -m flexam_tpu.tools.cold_start --prequant /tmp/bundle.npz \
      --aot-cache .aot_cache --overlap --upload-threads 4 --stream-upload

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


def make_prequant(out_path: str, with_vae: bool = False) -> None:
    """Write a flagship-shape prequantized int8 DiT .npz WITHOUT a real
    checkpoint (pure host work, values random): the artifact a deploy
    would produce with tools/prequant_ckpt from real weights. Upload and
    compile timing are value-independent.

    with_vae packs the fp32 VAE under a `vae/` prefix AHEAD of the
    `dit/` tree — a single serve bundle. The stream uploader prioritizes
    the `vae/` members, so the prepare stage starts ~10 s in (one small
    upload) instead of paying an on-device random-init compile
    (measured 88.6 s in the run-B TTFV breakdown)."""
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

    def leaf(path, sds, force_bf16=False):
        shape = tuple(sds.shape)
        if path.endswith("weight_q"):
            return rng.randint(-127, 128, shape).astype(np.int8)
        if path.endswith("w_scale"):
            return np.full(shape, 0.01, np.float32)
        dt = (ml_dtypes.bfloat16 if force_bf16
              else np.float32 if sds.dtype == jnp.float32
              else ml_dtypes.bfloat16)
        return (rng.rand(*shape).astype(np.float32) * 0.02 - 0.01
                ).astype(dt)

    def visit(prefix, node, force_bf16=False):
        if isinstance(node, dict):
            return {k: visit(f"{prefix}/{k}", v, force_bf16)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [visit(f"{prefix}/{i}", v, force_bf16)
                    for i, v in enumerate(node)]
        return leaf(prefix, node, force_bf16)

    tree = visit("", qskel)
    if with_vae:
        from flexam_tpu.models.vae import init_vae_params
        vskel = jax.eval_shape(
            lambda k: init_vae_params(k, WAN22_5B_FLEXAM.vae),
            jax.random.PRNGKey(1))
        # dict order IS npz member order (save_pytree walks insertion
        # order): vae first so the stream uploader resolves it early.
        # Stored bf16 (~1.4 GB, a ~40 s leg at tunnel bandwidth) and
        # cast back to fp32 ON DEVICE at arrival: fp32 storage put the
        # 2.8 GB VAE upload right back on the critical path it was
        # supposed to shorten (~80 s, no better than the 88 s random-
        # init compile it replaces)
        tree = {"vae": visit("", vskel, force_bf16=True), "dit": tree}
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


def _nest(flat: dict) -> dict:
    from flexam_tpu.io.checkpoints import nest_flat_paths
    return nest_flat_paths(flat)


def stream_upload_npz(path: str, n_threads: int,
                      priority_prefix: str = None,
                      on_priority_ready=None,
                      cast_wide_prefix: str = None):
    """Pipelined npz read -> device_put: the single host core decodes
    the next zip member while earlier members are already in flight on
    the tunnel, so disk decode and upload overlap instead of serialize.
    Returns (nested device tree, total bytes).

    priority_prefix members decode + upload FIRST; once the last of them
    is resolved on device, `on_priority_ready(subtree)` fires from the
    reader thread — a serve bundle's small `vae/` tree becomes usable
    while the 5 GB `dit/` tree is still streaming.

    cast_wide_prefix ("" = all members) applies `pipeline._put_quantized`'s
    rule to matching members: fp32 matrices (ndim>=2, not w_scale) cast
    to bf16 HOST-side. Without it the streamed tree can differ in leaf
    dtypes from the restore+_put_quantized recipe, which silently changes
    the lowered-HLO identity of every downstream executable (the round-5
    cross-process aot-cache "miss" was exactly this recipe divergence —
    identical processes key identically)."""
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    futs = {}
    n_bytes = 0
    with np.load(path) as z, cf.ThreadPoolExecutor(
            max_workers=max(n_threads, 1)) as ex:
        files = list(z.files)
        if priority_prefix:
            files.sort(key=lambda k: not k.startswith(priority_prefix))
        n_prio = sum(1 for k in files
                     if priority_prefix and k.startswith(priority_prefix))
        for idx, k in enumerate(files):
            arr = z[k]                    # zip decode (CPU-bound)
            if k.endswith("::bf16"):
                key, arr = k[:-6], arr.view(ml_dtypes.bfloat16)
            elif k.endswith("::f8e4m3"):
                key, arr = k[:-8], arr.view(ml_dtypes.float8_e4m3fn)
            else:
                key = k
            if (cast_wide_prefix is not None
                    and key.startswith(cast_wide_prefix)
                    and arr.dtype == np.float32 and arr.ndim >= 2
                    and not key.endswith("w_scale")):
                arr = arr.astype(ml_dtypes.bfloat16)
            n_bytes += arr.nbytes
            futs[key] = ex.submit(jnp.asarray, arr)
            if on_priority_ready is not None and idx + 1 == n_prio:
                sub = {kk[len(priority_prefix):]: f.result()
                       for kk, f in futs.items()
                       if kk.startswith(priority_prefix)}
                jax.block_until_ready(list(sub.values()))
                on_priority_ready(_nest(sub))
                on_priority_ready = None
        flat = {k: f.result() for k, f in futs.items()}
    jax.block_until_ready(list(flat.values()))
    return _nest(flat), n_bytes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--make-prequant", metavar="OUT.npz",
                    help="write a flagship-shape int8 npz (host-only) "
                         "and exit")
    ap.add_argument("--with-vae", action="store_true",
                    help="with --make-prequant: pack the fp32 VAE under "
                         "vae/ ahead of dit/ (one serve bundle; the "
                         "stream uploader prioritizes vae/ so prepare "
                         "starts ~10 s in instead of paying an 88 s "
                         "on-device random-init compile)")
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
        make_prequant(args.make_prequant, with_vae=args.with_vae)
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

    # a serve bundle packs the VAE under vae/ ahead of dit/ (one npz,
    # --make-prequant --with-vae); detect from the zip directory alone
    with np.load(args.prequant) as _z:
        bundle = any(k.startswith("vae/") for k in _z.files[:4])
    rec["bundle"] = bundle
    import threading
    vae_ready = threading.Event()
    shared = {}

    def _vae_arrived(subtree):
        # bundles ship the VAE bf16 for upload bytes; compute wants fp32
        # (device-side cast, ~free vs the link)
        shared["vae"] = jax.tree_util.tree_map(
            lambda a: (a.astype(jnp.float32)
                       if a.dtype == jnp.bfloat16 else a), subtree)
        rec["vae_upload_done_s"] = round(time.perf_counter() - _T0, 1)
        log(f"bundle vae/ resolved on device "
            f"(+{rec['vae_upload_done_s']}s)")
        vae_ready.set()

    if args.stream_upload:
        host_dit = None
        n_bytes = os.path.getsize(args.prequant)   # ~= tree bytes (stored)
        rec["npz_load_s"] = 0.0                    # folded into upload
        rec["dit_gb"] = round(n_bytes / 1e9, 2)
    else:
        t0 = time.perf_counter()
        host_dit = restore_pytree_nested(args.prequant)
        if bundle:
            shared["host_vae"] = host_dit["vae"]
            host_dit = host_dit["dit"]
        n_bytes = sum(a.nbytes
                      for a in jax.tree_util.tree_leaves(host_dit))
        rec["npz_load_s"] = round(time.perf_counter() - t0, 1)
        rec["dit_gb"] = round(n_bytes / 1e9, 2)
        log(f"npz load: {rec['npz_load_s']}s ({rec['dit_gb']} GB)")

    def upload_dit():
        t0 = time.perf_counter()
        if args.stream_upload:
            # read+upload pipelined: zip members decode on the host
            # while earlier members are in flight on the tunnel; in a
            # bundle the small vae/ tree streams FIRST and unblocks the
            # prepare stage via `vae_ready` while dit/ is still in flight
            dev, nb = stream_upload_npz(
                args.prequant, args.upload_threads,
                priority_prefix="vae/" if bundle else None,
                on_priority_ready=_vae_arrived if bundle else None,
                cast_wide_prefix="dit/" if bundle else "")
            rec["dit_gb"] = round(nb / 1e9, 2)
            if bundle:
                dev = dev["dit"]
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

    # everything that does NOT need the DiT: VAE acquisition + the
    # prepare-stage jits (aot-loaded when the dir is warm) + the actual
    # conditioning pipeline. A bundle ships the VAE (a ~10 s upload that
    # streams FIRST); otherwise pay the on-device random-init compile
    t0 = time.perf_counter()
    if bundle and args.stream_upload:
        vae_ready.wait()
        vae_params = shared["vae"]
    elif bundle:
        vae_params = jax.tree_util.tree_map(
            lambda a: (jnp.asarray(a, jnp.float32)
                       if str(a.dtype) == "bfloat16" else jnp.asarray(a)),
            shared.pop("host_vae"))
        jax.block_until_ready(jax.tree_util.tree_leaves(vae_params)[0])
    else:
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
