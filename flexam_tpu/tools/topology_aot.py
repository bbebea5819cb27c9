"""Device-less AOT compilation of the sharded denoise step against a real
multi-chip TPU topology (VERDICT r3 item 8).

No multi-chip hardware exists in this environment, so the strongest
available proof that the sharded path is deployable is to compile it for
a real TPU target via `jax.experimental.topologies`: a compile-only PJRT
client with the actual v5e/v5p topology description runs the full XLA +
GSPMD + Mosaic pipeline and (optionally) serializes the executable a real
pod could load.

Measured on this 1-core host (round 4): the FULL Wan2.2-5B denoise step —
30-block scan, Pallas flash attention inside the Ulysses shard_map,
dp2 x sp4 — compiles for `v5e:2x4` in ~36 s and serializes to ~21 MiB.

Round 5 (VERDICT r4 item 4): the north-star `v5p-8` target (8 TensorCores
= 4 megacore devices = topology `v5p:2x2x1`) compiles clean too, dp2 x
sp2: dense 48 s (args 10.1 GB bf16), ACCELERATED (int8 linears + sparse
Ulysses inner + fused per-shard prologues) 72 s, 27.5 MiB serialized,
args 5.2 GB — the Mosaic tilings tuned on v5e (256-row blocks, 16 MB
VMEM working budget) fit v5p's geometry without changes.

Two product bugs this tool flushed out (both fixed):
  * Pallas `out_shape` needs the input's varying-mesh-axes set (`vma`)
    to trace under `jax.shard_map`'s default check_vma=True — all repo
    kernels now propagate it (`ops/*. _out_sds`);
  * the fused single-chip elementwise kernels (`ops/fused.py`) cannot be
    auto-partitioned by GSPMD ("Mosaic kernels cannot be automatically
    partitioned") — `fused_enabled()` now stands down under a
    multi-device activation mesh and the XLA fusion path takes over.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np


def aot_compile_denoise_step(
    topology: str = "v5e:2x4",
    dp: int = 2,
    sp: int = 4,
    full_5b: bool = True,
    latent: Tuple[int, int, int, int] = (48, 25, 32, 56),  # c, f, h, w
    serialize_to: Optional[str] = None,
    quant: bool = False,
    sparse: bool = False,
    fused: bool = False,
) -> dict:
    """AOT-compile the CFG-pair denoise DiT forward for `topology`.

    `quant`/`sparse`/`fused` compile the ACCELERATED sharded step
    (VERDICT r4 item 1): int8 block linears (`ops/qlinear.py`),
    block-sparse video attention as the Ulysses inner
    (`ops/sparse_attention.py`), and the fused elementwise Pallas
    prologues per-shard inside their own shard_maps (`ops/fused.py`) —
    the composition the reference gets from paifuser kernels stacked
    under xDiT SP (`FlexAM/models/__init__.py:23-103`).

    Returns {"compile_s", "code_bytes", "temp_bytes", "arg_bytes",
    "serialized_bytes"?}. Raises on compile failure — that is the test.
    """
    import os

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from flexam_tpu.models.dit import dit_forward, init_dit_params
    from flexam_tpu.ops.flash_attention import flash_attention
    from flexam_tpu.parallel import activation_sharding
    from flexam_tpu.parallel.ulysses import make_ulysses_attention

    topo = topologies.get_topology_desc(topology, "tpu")
    devs = list(topo.devices)
    assert len(devs) >= dp * sp, (len(devs), dp, sp)
    mesh = Mesh(np.asarray(devs[:dp * sp]).reshape(dp, sp), ("dp", "sp"))

    if full_5b:
        from flexam_tpu.config import WAN22_5B_FLEXAM
        cfg = WAN22_5B_FLEXAM.dit
    else:
        # flagship token geometry at reduced width (fast CI variant)
        import dataclasses

        from flexam_tpu.config import tiny_test_config
        c = latent[0]
        cfg = dataclasses.replace(
            tiny_test_config().dit, in_dim=2 * c + 4 + c, out_dim=c,
            dim=512, ffn_dim=1024, num_heads=4,   # head_dim 128: the
            patch_size=(1, 2, 2),                 # Pallas kernel's tile
            in_dim_cnn_block=6 * c,
            out_dim_cnn_block=c, in_dim_ref_conv=c,
            add_ref_conv=True, add_cnn_block=True)

    c, f, h, w = latent
    b = 1
    sk = jax.eval_shape(
        lambda k: init_dit_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    if quant:
        from flexam_tpu.ops.qlinear import convert_dit_to_int8
        sk = jax.eval_shape(convert_dit_to_int8, sk)

    def sds(shape, dt, spec):
        return jax.ShapeDtypeStruct(tuple(shape), dt,
                                    sharding=NamedSharding(mesh, spec))

    param_sds = jax.tree_util.tree_map(
        lambda l: sds(l.shape, l.dtype, P()), sk)
    args = (param_sds,
            sds((2 * b, c, f, h, w), jnp.bfloat16, P("dp")),
            sds((2 * b,), jnp.float32, P("dp")),
            sds((2 * b, cfg.text_len, cfg.text_dim), jnp.bfloat16,
                P("dp")),
            sds((2 * b,), jnp.float32, P("dp")),
            sds((2 * b, 2 * c + 4, f, h, w), jnp.bfloat16, P("dp")),
            sds((2 * b, 5 * c, f, h, w), jnp.bfloat16, P("dp")),
            sds((2 * b, c, h, w), jnp.bfloat16, P("dp")))

    # the Pallas kernels run per-shard inside the Ulysses shard_map
    inner = flash_attention
    if sparse:
        from flexam_tpu.ops.sparse_attention import make_sparse_attn_fn
        pt, ph, pw = cfg.patch_size
        spatial = (h // ph) * (w // pw)
        # interpret=False explicitly: the auto-detect keys off the LOCAL
        # backend (CPU here), but this lowering targets the TPU topology
        inner = make_sparse_attn_fn(f // pt, spatial, ref_tokens=spatial,
                                    window=2, interpret=False)
    attn = make_ulysses_attention(mesh, inner=inner)

    def step(p, x, t, ctx, dens, y, add, ref):
        return dit_forward(p, cfg, x, t, ctx, density=dens, y=y,
                           additional_control=add, full_ref=ref,
                           attn_fn=attn)

    t0 = time.time()
    fused_env = os.environ.get("FLEXAM_FUSED")
    if fused:
        os.environ["FLEXAM_FUSED"] = "1"     # the local-platform check
        # would stand the kernels down (CPU process, TPU target)
    try:
        with activation_sharding(mesh):
            compiled = jax.jit(step).lower(*args).compile()
    finally:
        if fused:
            if fused_env is None:
                os.environ.pop("FLEXAM_FUSED", None)
            else:
                os.environ["FLEXAM_FUSED"] = fused_env
    out = {"compile_s": time.time() - t0}
    mem = compiled.memory_analysis()
    out["code_bytes"] = mem.generated_code_size_in_bytes
    out["temp_bytes"] = mem.temp_size_in_bytes
    out["arg_bytes"] = mem.argument_size_in_bytes
    if serialize_to:
        from jax.experimental.serialize_executable import serialize
        blob, _, _ = serialize(compiled)
        with open(serialize_to, "wb") as fh:
            fh.write(blob)
        out["serialized_bytes"] = len(blob)
    return out


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--sp", type=int, default=4)
    ap.add_argument("--reduced", action="store_true",
                    help="flagship token geometry at reduced width")
    ap.add_argument("--serialize_to", default=None)
    ap.add_argument("--quant", action="store_true",
                    help="int8 block linears (ops/qlinear.py)")
    ap.add_argument("--sparse", action="store_true",
                    help="block-sparse video attention as Ulysses inner")
    ap.add_argument("--fused", action="store_true",
                    help="fused elementwise Pallas prologues per shard")
    args = ap.parse_args(argv)
    res = aot_compile_denoise_step(
        topology=args.topology, dp=args.dp, sp=args.sp,
        full_5b=not args.reduced, serialize_to=args.serialize_to,
        quant=args.quant, sparse=args.sparse, fused=args.fused)
    print(json.dumps({"topology": args.topology,
                      "dp": args.dp, "sp": args.sp,
                      "full_5b": not args.reduced, "quant": args.quant,
                      "sparse": args.sparse, "fused": args.fused, **res}))


if __name__ == "__main__":
    main()
