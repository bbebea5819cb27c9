"""CLI driver, mirroring the reference `demo.py:146-415`.

Five modes via --generate_type: full_edit (motion transfer),
foreground_edit, background_edit, plus camera control (--camera_motion /
--pose_file) and object manipulation (--object_motion + --object_mask),
composable like the reference.

Perception inputs (the reference's external CUDA models, SURVEY.md §2.6)
come from fixtures:
  --tracks_npz       precomputed DELTA-format tracks: npz with
                     tracks [T,N,3] (u,v,depth) + visibility [T,N]
                     (+ optional extrinsics [T,3,4], intrinsics [T,3,3]
                     for VGGT-style camera re-projection)
  --moge_npz         MoGe point map: points [H,W,3] normalized + mask [H,W]
                     + intrinsics [3,3]  (image-input path, `demo.py:220`)
  --repaint PATH     repainted first frame (the reference also accepts a
                     path, `demo.py:154-155`; FLUX repaint itself is an
                     external model)
  --synthetic_tracks generate a deterministic grid-track fixture (smoke)

Model weights: --checkpoint_path with {transformer/, Wan2.2_VAE.pth,
models_t5_umt5-xxl-enc-bf16.pth, tokenizer}, or --random_init tiny|5b.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FlexAM-TPU demo")
    p.add_argument("--input_path", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--random_init", type=str, default=None,
                   choices=["tiny", "5b"],
                   help="random weights instead of a checkpoint (smoke)")
    p.add_argument("--quant", type=str, default=None,
                   choices=["int8", "fp8"],
                   help="DiT weight quantization: int8 block GEMMs "
                        "(1.31x denoise, ~5.7 GB resident) or fp8 "
                        "storage (memory only); also via FLEXAM_QUANT")
    p.add_argument("--prequant", type=str, default=None,
                   help="prequantized DiT .npz from tools/prequant_ckpt "
                        "(replaces the transformer weights from "
                        "--checkpoint_path; narrow upload, no quantize "
                        "pass at startup); serve bundles (cold_start "
                        "--make-prequant --with-vae) also carry the VAE")
    p.add_argument("--num_inference_steps", type=int, default=40)
    p.add_argument("--repaint", type=str, default=None)
    p.add_argument("--camera_motion", type=str, default=None)
    p.add_argument("--pose_file", type=str, default=None)
    p.add_argument("--override_extrinsics", type=str, default="append",
                   choices=["override", "append"])
    p.add_argument("--object_motion", type=str, default=None)
    p.add_argument("--object_mask", type=str, default=None)
    p.add_argument("--tracking_method", type=str, default="DELTA",
                   choices=["DELTA", "moge", "flow"],
                   help="flow = built-in optical-flow baseline tracker "
                        "(no external models; perception/tracking.py)")
    p.add_argument("--sample_size", type=int, nargs=2, default=[512, 896])
    p.add_argument("--video_length", type=int, default=49)
    p.add_argument("--mask_path", type=str, default=None)
    p.add_argument("--generate_type", type=str, default="full_edit",
                   choices=["full_edit", "foreground_edit",
                            "background_edit"])
    p.add_argument("--density", type=int, default=10)
    p.add_argument("--dilation_pixels", type=int, default=200)
    p.add_argument("--tracks_npz", type=str, default=None)
    p.add_argument("--delta_ckpt", type=str, default=None,
                   help="densetrack3d.pth for the learned tracker")
    p.add_argument("--poses_npz", type=str, default=None,
                   help="recorded camera poses for --camera_motion: "
                        "extrinsics[T,3,4](+intrinsics), VGGT "
                        "pose_encoding[T,9], or Pi3 camera_poses[T,4,4] "
                        "(flexam_tpu.perception.poses)")
    p.add_argument("--moge_npz", type=str, default=None)
    p.add_argument("--synthetic_tracks", action="store_true")
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--seed", type=int, default=1245644)
    p.add_argument("--scheduler", type=str, default=None,
                   choices=[None, "flow_match_euler", "flow_unipc",
                            "flow_dpm"])
    p.add_argument("--teacache_thresh", type=float, default=0.0)
    p.add_argument("--cfg_skip_ratio", type=float, default=0.0)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); the axon TPU "
                        "plugin ignores JAX_PLATFORMS so this uses the "
                        "config knob")
    p.add_argument("--host_rasterize", action="store_true",
                   help="rasterize control videos on the host (the "
                        "reference's CPU path; default rasterizes on "
                        "device so videos never cross the tunnel)")
    p.add_argument("--save_artifacts", action="store_true",
                   help="write tracking/cos/depth debug mp4s (device "
                        "path: forces a full-res fetch; host path always "
                        "saves them like the reference)")
    return p


def _synthetic_grid_tracks(video_length, height, width, density):
    """Deterministic stand-in for DELTA: a static dense grid with a slow
    drift (exercises the full rasterize->generate path without the
    external tracker)."""
    ys = np.arange(0, height, density, dtype=np.float32) + density / 2
    xs = np.arange(0, width, density, dtype=np.float32) + density / 2
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    base = np.stack([gx.reshape(-1), gy.reshape(-1),
                     np.full(gx.size, 2.0, np.float32)], axis=1)
    t = np.arange(video_length, dtype=np.float32)[:, None, None]
    drift = np.concatenate([t * 0.5, t * 0.2, t * 0.0], axis=2)
    tracks = base[None] + drift
    vis = np.ones((video_length, base.shape[0]), bool)
    return tracks.astype(np.float32), vis


def _build_models(args):
    import jax
    import jax.numpy as jnp

    # Namespace-style callers (serve.py) may omit the quant attribute
    quant = getattr(args, "quant", None)
    prequant = getattr(args, "prequant", None)

    from flexam_tpu.config import WAN22_5B_FLEXAM, tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.models.t5 import init_t5_params
    from flexam_tpu.models.vae import init_vae_params
    from flexam_tpu.pipeline import FlexAMGenerationPipeline, FlexAMModels

    def _load_prequant(path):
        """Prequantized DiT .npz (tools/prequant_ckpt): returns (host
        tree, quant mode its leaves imply, bundle VAE or None), so the
        pipeline's conversion no-ops and `_put_quantized` ships the
        narrow bytes. Serve bundles (tools/cold_start --make-prequant
        --with-vae) carry the VAE under vae/ — shipped bf16 and cast
        fp32 ON DEVICE (fp32 host bytes never cross the link)."""
        import ml_dtypes

        from flexam_tpu.io.checkpoints import restore_pytree_nested
        from flexam_tpu.ops.qlinear import is_quantized
        tree = restore_pytree_nested(path)
        bvae = None
        if isinstance(tree, dict) and "dit" in tree and "vae" in tree:
            bvae = jax.tree_util.tree_map(
                lambda a: (jnp.asarray(a).astype(jnp.float32)
                           if str(a.dtype) == "bfloat16"
                           else jnp.asarray(a)), tree["vae"])
            tree = tree["dit"]
        if is_quantized(tree):
            return tree, "int8", bvae
        if any(getattr(l, "dtype", None) == ml_dtypes.float8_e4m3fn
               for l in jax.tree_util.tree_leaves(tree)):
            return tree, "fp8", bvae
        raise ValueError(
            f"{path} holds no quantized leaves — produce it with "
            "tools/prequant_ckpt, or load it via --checkpoint_path")

    tokenizer = None
    if args.checkpoint_path:
        from flexam_tpu.io.checkpoints import (load_dit_checkpoint,
                                               load_t5_checkpoint,
                                               load_vae_checkpoint)
        cfg = WAN22_5B_FLEXAM
        bundle_vae = None
        if prequant:
            dit, quant, bundle_vae = _load_prequant(prequant)
        else:
            dit = load_dit_checkpoint(
                os.path.join(args.checkpoint_path), cfg.dit,
                dtype=np.float32)
            quant_active = quant or os.environ.get("FLEXAM_QUANT", "")
            if quant_active in ("", "none", None):
                # quantized modes hand the HOST tree to the pipeline,
                # which quantizes with numpy and uploads int8/fp8 bytes —
                # ~half a bf16 upload (pipeline._put_quantized); the
                # unquantized path casts and uploads bf16 here as before
                dit = jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, jnp.bfloat16)
                    if a.dtype == np.float32 and a.ndim >= 2
                    else jnp.asarray(a), dit)
        vae = (bundle_vae if bundle_vae is not None
               else load_vae_checkpoint(
                   os.path.join(args.checkpoint_path, "Wan2.2_VAE.pth"),
                   cfg.vae))
        t5 = load_t5_checkpoint(
            os.path.join(args.checkpoint_path,
                         "models_t5_umt5-xxl-enc-bf16.pth"), cfg.t5)
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(
            os.path.join(args.checkpoint_path, "google/umt5-xxl"))
        models = FlexAMModels(cfg=cfg, dit_params=dit, vae_params=vae,
                              t5_params=t5, t5_from_checkpoint=True)
        return FlexAMGenerationPipeline(models, tokenizer=tokenizer,
                                        quant=quant)

    cfg = tiny_test_config() if args.random_init == "tiny" else WAN22_5B_FLEXAM
    dtype = jnp.float32 if args.random_init == "tiny" else jnp.bfloat16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    dit_params = init_dit_params(k1, cfg.dit, dtype=dtype)
    bundle_vae = None
    if prequant:        # smoke/test path: prequantized tiny tree + random rest
        dit_params, quant, bundle_vae = _load_prequant(prequant)
    models = FlexAMModels(
        cfg=cfg,
        dit_params=dit_params,
        vae_params=(bundle_vae if bundle_vae is not None
                    else init_vae_params(k2, cfg.vae)),
        t5_params=init_t5_params(k3, cfg.t5),
    )
    return FlexAMGenerationPipeline(
        models, compute_dtype=jnp.float32 if args.random_init == "tiny"
        else jnp.bfloat16, quant=quant)


def main(argv=None):
    from flexam_tpu.conditioning import (CameraMotionGenerator,
                                         ObjectMotionGenerator)
    from flexam_tpu.orchestrator import (FlexAMOrchestrator,
                                         convert_moge_to_delta_format)
    from flexam_tpu.utils.masks import (generate_mask_bg_tracking,
                                        generate_mask_fg_tracking)
    from flexam_tpu.utils.media import (get_image_latent,
                                        get_image_to_video_input,
                                        get_maskvideo_input, get_video_input)

    args = build_argparser().parse_args(argv)
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    h, w = args.sample_size
    os.makedirs(args.output_dir, exist_ok=True)

    # ---- input ----
    is_video = args.input_path and args.input_path.lower().endswith(
        (".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v", ".flv", ".wmv"))
    if args.input_path:
        if is_video:
            input_video, _, _ = get_video_input(
                args.input_path, args.video_length, (h, w))
        else:
            frame = get_image_latent(args.input_path, (h, w))
            input_video = np.tile(frame, (1, 1, args.video_length, 1, 1))
            args.tracking_method = "moge"
    else:
        input_video = np.zeros((1, 3, args.video_length, h, w), np.float32)

    # ---- repaint (path input, or native depth-conditioned generation) ----
    repaint = None
    repaint_native = False
    if args.repaint and args.repaint.lower() != "true":
        repaint = get_image_latent(args.repaint, (h, w))
    elif args.repaint:
        # `--repaint true`: the reference runs FLUX.1-Depth here
        # (`pipelines.py:137-173`); natively we generate the frame with
        # the FlexAM model's own depth conditioning (after models load)
        repaint_native = True

    # ---- tracks ----
    cam = CameraMotionGenerator(args.camera_motion or "",
                                frame_num=args.video_length, H=h, W=w,
                                pose_file=args.pose_file)
    extr = intr = None
    if args.moge_npz or (args.tracking_method == "moge" and not is_video):
        if args.moge_npz:
            moge = dict(np.load(args.moge_npz))
        elif os.environ.get("FLEXAM_MOGE_CKPT"):
            # native MoGe implementation (flexam_tpu.perception.moge)
            # on the loaded first frame, like `demo.py:220-223`
            from flexam_tpu.perception.moge import load_moge
            model = load_moge(os.environ["FLEXAM_MOGE_CKPT"])
            moge = model.infer(np.asarray(input_video)[0, :, 0])
        else:
            raise SystemExit(
                "image input needs MoGe geometry: pass --moge_npz (output "
                "fixture) or set FLEXAM_MOGE_CKPT for the native "
                "implementation (flexam_tpu.perception.moge)")
        points = np.asarray(moge["points"], np.float32)     # [H', W', 3]
        moge_mask = np.asarray(moge["mask"]).astype(bool)
        if "intrinsics" in moge:
            cam.set_intr(np.asarray(moge["intrinsics"], np.float32))
        pred = np.tile(points[None], (args.video_length, 1, 1, 1))
        if args.object_motion:
            mask_img = _load_mask_image(args.object_mask, h, w)
            pred = ObjectMotionGenerator().apply_motion(
                pred, mask_img, args.object_motion, 50,
                num_frames=args.video_length, tracking_method="moge")
        poses = (cam.get_default_motion() if args.camera_motion
                 else np.tile(np.eye(4, dtype=np.float32),
                              (args.video_length, 1, 1)))
        hh, ww = pred.shape[1:3]
        uvd = cam.w2s_moge(pred.reshape(args.video_length, hh * ww, 3), poses)
        tracks, vis = convert_moge_to_delta_format(
            uvd.reshape(args.video_length, hh, ww, 3), moge_mask, h, w)
        point_wise = 2      # `demo.py:268` uses point_wise=2 on this path
    else:
        if args.tracking_method == "flow" and not args.tracks_npz:
            if not is_video:
                raise SystemExit("--tracking_method flow needs a video "
                                 "--input_path")
            from flexam_tpu.perception import track_video_flow
            print("NOTE: built-in optical-flow baseline tracker "
                  "(plug DELTA via --tracks_npz for learned tracking)")
            tracks, vis = track_video_flow(input_video,
                                           density=args.density)
            extr = intr = None
        elif args.tracks_npz:
            data = np.load(args.tracks_npz)
            tracks = np.asarray(data["tracks"], np.float32)
            vis = np.asarray(data["visibility"]).astype(bool)
            extr = (np.asarray(data["extrinsics"], np.float32)
                    if "extrinsics" in data else None)
            intr = (np.asarray(data["intrinsics"], np.float32)
                    if "intrinsics" in data else None)
        elif args.synthetic_tracks:
            tracks, vis = _synthetic_grid_tracks(args.video_length, h, w,
                                                 args.density)
        elif args.tracking_method.upper() == "DELTA" and is_video:
            # the reference's flagship path (`pipelines.py:1362-1499`):
            # DenseTrack3D + depth backend; with no trained checkpoint the
            # optical-flow baseline gives better tracks than random weights
            from flexam_tpu.perception.tracking import dispatch_tracking
            tracks, vis = dispatch_tracking(
                input_video, "delta", density=args.density,
                ckpt=args.delta_ckpt)
        else:
            raise SystemExit(
                "no tracks: pass --tracks_npz, --synthetic_tracks, a video "
                "--input_path (DELTA/flow tracking), or --moge_npz")
        if args.camera_motion:
            if (extr is None or intr is None) and args.poses_npz:
                from flexam_tpu.perception import poses_npz_to_extri_intri
                extr, intr = poses_npz_to_extri_intri(args.poses_npz, w, h)
            if (extr is None or intr is None) and \
                    os.environ.get("FLEXAM_VGGT_CKPT") and \
                    input_video is not None:
                # the reference's flagship video camera path: VGGT
                # aggregator + camera head (`demo.py:296-325`), native
                from flexam_tpu.perception.vggt import (VGGT,
                                                        vggt_video_poses)
                vm = VGGT.from_pretrained()
                if vm.load_ok:
                    print("NOTE: camera poses from the native VGGT model")
                    extr, intr = vggt_video_poses(
                        np.asarray(input_video)[0].transpose(1, 0, 2, 3),
                        model=vm)
            if (extr is None or intr is None) and \
                    os.environ.get("FLEXAM_PI3_CKPT") and \
                    input_video is not None:
                # learned pose path: the NATIVE Pi3 port with trained
                # weights (`pipelines.py:259-321`); gated on a checkpoint
                # because random-weight poses are near-identity
                from flexam_tpu.perception.pi3 import (Pi3,
                                                       pi3_video_poses)
                from flexam_tpu.perception.poses import \
                    pi3_poses_to_extri_intri
                model = Pi3.from_pretrained()
                if model.load_ok:
                    print("NOTE: camera poses from the native Pi3 model")
                    c2w = pi3_video_poses(
                        np.asarray(input_video)[0].transpose(1, 0, 2, 3),
                        model=model)
                    extr, intr = pi3_poses_to_extri_intri(c2w, w, h)
            if extr is None or intr is None:
                # no-checkpoint fallback (`demo.py:310-325` substitute):
                # solve rigid per-frame poses from the 3D tracks
                # themselves (robust Kabsch)
                from flexam_tpu.perception.pose_solver import \
                    solve_camera_poses
                print("NOTE: solving camera poses from tracks (no "
                      "--poses_npz; robust Kabsch, frame-0 world)")
                extr, intr = solve_camera_poses(tracks, vis,
                                                width=w, height=h)
            poses = cam.get_default_motion()
            world = cam.s2w_vggt(tracks, extr, intr)
            tracks = cam.w2s_vggt(
                world, extr, intr, poses,
                override_extrinsics=args.override_extrinsics == "override")
        if args.object_motion:
            mask_img = _load_mask_image(args.object_mask, h, w)
            tracks = ObjectMotionGenerator().apply_motion(
                tracks, mask_img, args.object_motion, 50,
                num_frames=args.video_length, tracking_method="DELTA")
        point_wise = 4

    # ---- pipeline ----
    pipe = _build_models(args)
    orch = FlexAMOrchestrator(
        pipe, output_dir=args.output_dir, fps=args.fps,
        save_tracking=args.save_artifacts or args.host_rasterize)

    if repaint_native:
        from flexam_tpu.perception.depth import estimate_depth
        from flexam_tpu.repaint import (FirstFrameRepainter,
                                        make_flexam_repaint_fn)
        if (os.environ.get("FLEXAM_FLUX_CKPT")
                and os.environ.get("FLEXAM_FLUX_AE")):
            # the reference's actual backend (`pipelines.py:137-173`):
            # native FLUX.1-Depth port, weights from FLEXAM_FLUX_* files
            from flexam_tpu.repaint_flux import load_flux_repainter
            print("NOTE: --repaint true -> native FLUX.1-Depth port "
                  "(FLEXAM_FLUX_CKPT)")
            repaint_fn = load_flux_repainter().as_repaint_fn(args.seed)
        else:
            if os.environ.get("FLEXAM_FLUX_CKPT"):
                print("WARNING: FLEXAM_FLUX_CKPT set without "
                      "FLEXAM_FLUX_AE — falling back to the native "
                      "FlexAM repaint")
            print("NOTE: --repaint true -> native depth-conditioned "
                  "single-frame generation (the reference uses external "
                  "FLUX.1-Depth here; set FLEXAM_FLUX_CKPT/FLEXAM_FLUX_AE "
                  "to run the native FLUX port instead)")
            repaint_fn = make_flexam_repaint_fn(pipe, seed=args.seed)
        rp = FirstFrameRepainter(
            h, w, args.output_dir,
            depth_fn=lambda img: estimate_depth(
                (np.asarray(img, np.float32) / 255.0)[None])[0],
            repaint_fn=repaint_fn)
        repaint = rp.repaint(np.asarray(input_video)[0, :, 0], args.prompt,
                             num_inference_steps=args.num_inference_steps)

    # ---- inpaint video + mask per mode (`demo.py:361-395`) ----
    if args.generate_type == "full_edit":
        first = repaint[:, :, 0] if repaint is not None \
            else input_video[:, :, 0]
        full_ref = first[:, :, None]
        if not args.host_rasterize:
            # device path: only the first frame + tracks cross the tunnel
            if pipe.tokenizer is None:
                print("NOTE: no tokenizer (random init); "
                      "using hashed prompt ids")
            orch.apply_tracks(
                tracks, vis, h, w, prompt=args.prompt,
                point_wise=point_wise, generate_type=args.generate_type,
                mask_path=args.mask_path, first_frame=full_ref,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                density=1.0 / args.density, seed=args.seed,
                scheduler_type=args.scheduler,
                cfg_skip_ratio=args.cfg_skip_ratio,
                teacache_thresh=args.teacache_thresh)
            return
        inpaint_video, inpaint_mask = get_image_to_video_input(
            (first[0].transpose(1, 2, 0) * 255).astype(np.uint8),
            args.video_length, (h, w))
    else:
        if repaint is None:
            raise SystemExit("repaint image must be provided for "
                             "foreground_edit/background_edit")
        mv = get_maskvideo_input(args.mask_path, args.video_length, (h, w))
        if args.generate_type == "foreground_edit":
            m = generate_mask_fg_tracking(mv,
                                          dilation_pixels=args.dilation_pixels)
        else:
            m = generate_mask_bg_tracking(mv)
        inpaint_mask = (m.astype(np.float32) * 255).transpose(1, 0, 2, 3)[None]
        inpaint_video = np.concatenate(
            [repaint[:, :, :1], input_video[:, :, 1:]], axis=2)
        full_ref = repaint
        if not args.host_rasterize:
            if pipe.tokenizer is None:
                print("NOTE: no tokenizer (random init); "
                      "using hashed prompt ids")
            orch.apply_tracks(
                tracks, vis, h, w, prompt=args.prompt,
                point_wise=point_wise, generate_type=args.generate_type,
                mask_path=args.mask_path, video=inpaint_video,
                mask_video=inpaint_mask / 255.0, ref_image=full_ref,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                density=1.0 / args.density, seed=args.seed,
                scheduler_type=args.scheduler,
                cfg_skip_ratio=args.cfg_skip_ratio,
                teacache_thresh=args.teacache_thresh)
            return

    tracking, cos_videos, depth = orch.visualize_tracking(
        tracks, vis, h, w, point_wise=point_wise,
        generate_type=args.generate_type, mask_path=args.mask_path)

    # tokenizer-less random-init smoke: embed prompt ids from hashing
    if pipe.tokenizer is None:
        print("NOTE: no tokenizer (random init); using hashed prompt ids")
        ids = (np.frombuffer(args.prompt.encode()[:64].ljust(64), np.uint8)
               .astype(np.int32)[: pipe.cfg.t5.text_length]
               % pipe.cfg.t5.vocab)[None]
        ids = np.pad(ids, ((0, 0), (0, pipe.cfg.t5.text_length - ids.shape[1])))
        mask = (ids > 0).astype(np.int32)
        ctx = pipe.encode_prompt_ids(ids, mask)
        import jax.numpy as jnp
        context = jnp.concatenate([ctx, ctx], axis=0)
        cond = pipe.prepare_conditioning(
            inpaint_video, inpaint_mask / 255.0, tracking, depth,
            [cos_videos[k] for k in sorted(cos_videos)], full_ref)
        latents = pipe.denoise(
            cond, context, num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, seed=args.seed,
            density=1.0 / args.density, scheduler_type=args.scheduler,
            cfg_skip_ratio=args.cfg_skip_ratio,
            teacache_thresh=args.teacache_thresh)
        out = np.asarray((pipe._decode(latents).astype(np.float32) + 1) / 2)
        from flexam_tpu.utils.media import save_video
        save_video(out, os.path.join(args.output_dir, "result.mp4"),
                   fps=args.fps)
        print(f"Final video generated at {args.output_dir}/result.mp4")
        return

    orch.apply_tracking(
        tracking, cos_videos, depth, full_ref, inpaint_video, inpaint_mask,
        prompt=args.prompt, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, density=1.0 / args.density,
        seed=args.seed, scheduler_type=args.scheduler,
        cfg_skip_ratio=args.cfg_skip_ratio,
        teacache_thresh=args.teacache_thresh)


def _load_mask_image(path, h, w):
    if path is None:
        raise SystemExit("--object_motion requires --object_mask")
    from PIL import Image
    im = Image.open(path).convert("L").resize((w, h))
    return np.array(im) > 127


if __name__ == "__main__":
    main()
