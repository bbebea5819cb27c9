"""Checkpoint-map verification CLI (the reference's own load report —
`wan_transformer3d_FlexAM.py:1321-1329` — generalized to every loader).

    python -m flexam_tpu.tools.verify_ckpt --model delta  path/densetrack3d.pth
    python -m flexam_tpu.tools.verify_ckpt --model moge   path/model.pt
    python -m flexam_tpu.tools.verify_ckpt --model unidepth path/ckpt
    python -m flexam_tpu.tools.verify_ckpt --model dit    path/transformer/
    python -m flexam_tpu.tools.verify_ckpt --model vae    path/Wan2.2_VAE.pth
    python -m flexam_tpu.tools.verify_ckpt --model flux   flux1-depth-dev.safetensors
    python -m flexam_tpu.tools.verify_ckpt --model svd-vae vae.safetensors
    # every FLEXAM_*_CKPT family is covered: pi3 / vggt / zoe / dav2 /
    # flux / flux-ae / svd-unet / svd-vae / svd-clip

Shape-mapped loaders (delta, moge) print per-module coverage tables from
`flexam_tpu.io.verify_load`; name-mapped loaders (dit, vae, t5, unidepth)
verify by construction — every expected key must exist — so the report is
expected-vs-found over the whole checkpoint. Exit status 0 = coverage passes
the threshold, 1 = it does not.
"""

from __future__ import annotations

import argparse
import sys


def _report_name_mapped(kind: str, path: str, load_fn) -> bool:
    """Name-mapped loaders raise on any missing key: success means 100%
    of expected tensors were found. Report what the checkpoint had spare."""
    try:
        load_fn()
    except KeyError as e:
        print(f"{kind}[{path}]: FAILED — missing checkpoint key {e}")
        return False
    except Exception as e:  # malformed file, wrong format ...
        print(f"{kind}[{path}]: FAILED — {type(e).__name__}: {e}")
        return False
    print(f"{kind}[{path}]: OK — all expected tensors found "
          "(exact name-mapped loader)")
    return True


def verify(kind: str, path: str, threshold: float = 0.9) -> bool:
    from flexam_tpu.io.verify_load import check_mapping

    if kind == "delta":
        from flexam_tpu.perception.densetrack3d import load_densetrack3d
        model = load_densetrack3d(path, verify=False,
                                  coverage_threshold=threshold)
        return check_mapping(model.load_report, name=f"delta[{path}]",
                             threshold=threshold)
    if kind == "moge":
        import os

        from flexam_tpu.perception.moge import load_moge
        os.environ["FLEXAM_MOGE_BESTEFFORT"] = "1"  # report, don't raise
        model = load_moge(path, coverage_threshold=threshold)
        return check_mapping(model.load_report, name=f"moge[{path}]",
                             threshold=threshold)
    if kind == "unidepth":
        from flexam_tpu.perception.unidepth import load_unidepth
        return _report_name_mapped(kind, path, lambda: load_unidepth(path))
    if kind == "dit":
        from flexam_tpu.config import FlexAMConfig
        from flexam_tpu.io.checkpoints import load_dit_checkpoint
        cfg = FlexAMConfig().dit
        return _report_name_mapped(
            kind, path, lambda: load_dit_checkpoint(path, cfg))
    if kind == "vae":
        from flexam_tpu.config import FlexAMConfig
        from flexam_tpu.io.checkpoints import load_vae_checkpoint
        cfg = FlexAMConfig().vae
        return _report_name_mapped(
            kind, path, lambda: load_vae_checkpoint(path, cfg))
    if kind == "t5":
        from flexam_tpu.config import FlexAMConfig
        from flexam_tpu.io.checkpoints import load_t5_checkpoint
        cfg = FlexAMConfig().t5
        return _report_name_mapped(
            kind, path, lambda: load_t5_checkpoint(path, cfg))
    if kind in ("pi3", "vggt"):
        if kind == "pi3":
            from flexam_tpu.perception.pi3 import load_pi3 as loader
        else:
            from flexam_tpu.perception.vggt import load_vggt as loader
        try:
            model = loader(path, coverage_threshold=threshold)
        except Exception as e:
            print(f"{kind}[{path}]: FAILED — {type(e).__name__}: {e}")
            return False
        return check_mapping(model.load_report, name=f"{kind}[{path}]",
                             threshold=threshold)
    if kind == "zoe":
        from flexam_tpu.perception.zoedepth import load_zoedepth
        return _report_name_mapped(kind, path,
                                   lambda: load_zoedepth(path))
    if kind == "dav2":
        from flexam_tpu.perception.depth_anything import load_dav2
        return _report_name_mapped(kind, path, lambda: load_dav2(path))
    # single-file state-dict loaders: run the map, print the coverage
    if kind in ("flux", "flux-ae", "svd-unet", "svd-vae", "svd-clip"):
        from flexam_tpu.io.checkpoints import _load_one
        sd = _load_one(path)
        if kind == "flux":
            from flexam_tpu.models.flux import (FluxConfig,
                                                flux_params_from_state_dict)
            _, rep = flux_params_from_state_dict(sd, FluxConfig())
        elif kind == "flux-ae":
            from flexam_tpu.models.flux_vae import (
                FluxVAEConfig, flux_vae_params_from_state_dict)
            _, rep = flux_vae_params_from_state_dict(sd, FluxVAEConfig())
        elif kind == "svd-unet":
            from flexam_tpu.models.svd_unet import (
                SVDUNetConfig, svd_unet_params_from_state_dict)
            _, rep = svd_unet_params_from_state_dict(sd, SVDUNetConfig())
        elif kind == "svd-vae":
            from flexam_tpu.perception.depthcrafter_model import \
                SD_VAE_CONFIG
            if "decoder.time_conv_out.weight" in sd:
                from flexam_tpu.models.svd_vae import (
                    TemporalDecoderConfig, svd_vae_params_from_state_dict)
                dec = TemporalDecoderConfig(
                    z_channels=SD_VAE_CONFIG.z_channels,
                    block_out_channels=tuple(
                        SD_VAE_CONFIG.ch * m
                        for m in SD_VAE_CONFIG.ch_mult),
                    layers_per_block=SD_VAE_CONFIG.num_res_blocks,
                    scale_factor=SD_VAE_CONFIG.scale_factor)
                _, rep = svd_vae_params_from_state_dict(
                    sd, SD_VAE_CONFIG, dec)
            else:
                from flexam_tpu.models.flux_vae import \
                    flux_vae_params_from_state_dict
                _, rep = flux_vae_params_from_state_dict(sd, SD_VAE_CONFIG)
        else:                                   # svd-clip
            from flexam_tpu.models.clip import clip_vision_params_from_hf
            _, _, rep = clip_vision_params_from_hf(sd)
        return check_mapping(rep, name=f"{kind}[{path}]",
                             threshold=threshold)
    raise SystemExit(f"unknown --model {kind}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    choices=["delta", "moge", "unidepth", "dit", "vae",
                             "t5", "pi3", "vggt", "zoe", "dav2", "flux",
                             "flux-ae", "svd-unet", "svd-vae",
                             "svd-clip"])
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (default cpu — mapping is host "
                         "logic; no reason to init the TPU)")
    ap.add_argument("path")
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    return 0 if verify(args.model, args.path, args.threshold) else 1


if __name__ == "__main__":
    sys.exit(main())
