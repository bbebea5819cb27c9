"""Prequantize a FlexAM DiT checkpoint for fast serving cold-starts.

    python -m flexam_tpu.tools.prequant_ckpt --checkpoint <dir-or-file> \
        --mode int8 --out dit_int8.npz

Reads the reference-layout checkpoint (multi-file safetensors dir / .pth,
the loader at `io/checkpoints.py load_dit_checkpoint` — same glob-merge
semantics as `wan_transformer3d_FlexAM.py:1238-1246`), quantizes the
block linears HOST-side with numpy (`ops/qlinear.py` int8 per-out-channel
scheme, or `utils/fp8.py` e4m3 storage), and writes one .npz of the
quantized pytree. At deploy time:

    from flexam_tpu.io.checkpoints import restore_pytree_nested
    dit = restore_pytree_nested("dit_int8.npz")        # numpy, narrow
    FlexAMGenerationPipeline(FlexAMModels(...), quant="int8")

The pipeline's conversion is a no-op on an already-quantized tree and
`_put_quantized` uploads the narrow bytes — so a fresh server process
pays ~5 GB of upload instead of ~10 (bf16) or ~20 (fp32), and skips the
quantize pass entirely. `flexam_tpu.demo --prequant dit_int8.npz` wires
the same path into the CLI.

Why offline: quantization is deterministic (weights-only, static scales)
so there is no reason to redo it every process start; the reference has
no counterpart (its fp8 mode converts at load time, every time —
`fp8_optimization.py:19-34`).
"""

from __future__ import annotations

import argparse
import sys


def log(msg):
    print(f"[prequant] {msg}", file=sys.stderr, flush=True)


def prequantize(dit_params: dict, mode: str) -> dict:
    """Quantize a HOST (numpy) DiT tree in place and return it."""
    if mode == "int8":
        from flexam_tpu.ops.qlinear import convert_dit_to_int8
        return convert_dit_to_int8(dit_params)
    if mode == "fp8":
        from flexam_tpu.utils.fp8 import convert_weights_to_fp8
        return convert_weights_to_fp8(dit_params)
    raise ValueError(f"unknown mode {mode!r} (int8 | fp8)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True,
                    help="DiT checkpoint: safetensors dir/file or .pth, "
                         "or 'random:tiny' (test skeleton, no file)")
    ap.add_argument("--mode", default="int8", choices=("int8", "fp8"))
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args(argv)

    import numpy as np

    # quantization is pure host work — never initialize the accelerator
    # (a down tunnel would wedge an otherwise-offline tool). Config
    # update, not JAX_PLATFORMS: the axon plugin overrides the env var.
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass          # already initialized by an embedding process

    from flexam_tpu.io.checkpoints import save_pytree

    if args.checkpoint == "random:tiny":
        import jax
        import jax.numpy as jnp

        from flexam_tpu.config import tiny_test_config
        from flexam_tpu.models.dit import init_dit_params
        dit = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32),
            init_dit_params(jax.random.PRNGKey(0),
                            tiny_test_config().dit, jnp.float32))
    else:
        from flexam_tpu.config import WAN22_5B_FLEXAM
        from flexam_tpu.io.checkpoints import load_dit_checkpoint
        dit = load_dit_checkpoint(args.checkpoint, WAN22_5B_FLEXAM.dit,
                                  dtype=np.float32)

    n_in = sum(a.nbytes for a in _leaves(dit))
    dit = _cast_wide_to_bf16(prequantize(dit, args.mode))
    n_out = sum(a.nbytes for a in _leaves(dit))
    save_pytree(args.out, dit)
    log(f"{args.mode}: {n_in / 1e9:.2f} GB fp32 tree -> "
        f"{n_out / 1e9:.2f} GB quantized -> {args.out}")
    return 0


def _cast_wide_to_bf16(tree):
    """Unquantized fp32 matrices store (and later upload) as bf16 — the
    deploy dtype (`pipeline._put_quantized` rule); quantization scales
    stay fp32."""
    import ml_dtypes
    import numpy as np

    def visit(key, node):
        if isinstance(node, dict):
            return {k: visit(k, v) for k, v in node.items()}
        if (getattr(node, "dtype", None) == np.float32
                and node.ndim >= 2 and key != "w_scale"):
            return node.astype(ml_dtypes.bfloat16)
        return node
    return visit("", tree)


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    sys.exit(main())
