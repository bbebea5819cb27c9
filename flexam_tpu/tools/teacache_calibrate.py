"""TeaCache calibration: fit the rel-L1 -> residual-change polynomial for
a given checkpoint, so the skip heuristic fires at representative rates.

The reference's TeaCache (`FlexAM/models/cache_utils.py:21-77`) skips the
32-block stack when a POLYNOMIAL of the rel-L1 change of the timestep
modulation (`e0`) accumulates below a threshold. The polynomial table
(`cache_utils.py:4-18`) was fitted offline by the TeaCache authors per
model family: it maps "how much did the time embedding move" to "how much
will the block-stack residual move". With weights the table was not
fitted for (random init, a fresh fine-tune), the mapping is wrong and the
cache never/always fires — BASELINE.md round-2 honesty notes measured
exactly that (134.1 s vs 131.3 s plain, ~zero skips).

This tool reproduces the fit for ANY weights:

  1. run a short denoise trajectory with the plain forward, recording per
     step the rel-L1 of the modulated input AND the true relative change
     of the block-stack residual (`out_tokens - in_tokens`, the quantity
     TeaCache re-applies when skipping);
  2. `numpy.polyfit` degree-4 through the (rel_l1, rel_residual) pairs —
     the same functional form as the reference table;
  3. feed the coefficients to `pipeline.denoise(teacache_coefficients=…)`
     / `dit_forward_teacache(coefficients=…)`.

`train_to_smooth` produces a small trained checkpoint (the repo's own
`train.py` loop on a synthetic smooth-video objective) for end-to-end
tests: train -> calibrate -> measure skips.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexam_tpu.config import DiTConfig
from flexam_tpu.models.dit import _dit_blocks, _dit_prepare


def collect_signals(
    params: dict,
    cfg: DiTConfig,
    xs: np.ndarray,               # [n_steps, B, C, F, H, W] latent trajectory
    ts: np.ndarray,               # [n_steps] timesteps
    context: jnp.ndarray,
    density: Optional[jnp.ndarray] = None,
    y: Optional[jnp.ndarray] = None,
    additional_control: Optional[jnp.ndarray] = None,
    full_ref: Optional[jnp.ndarray] = None,
    rope_tables: Optional[jnp.ndarray] = None,
    attn_fn=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per consecutive step pair: (rel_l1 of modulated e0, relative L1
    change of the block-stack residual). Mirrors the quantities
    `dit_forward_teacache` thresholds on (`dit.py`)."""
    from flexam_tpu.core.attention import attention as default_attention
    attn_fn = attn_fn or default_attention

    def one(params, x, t, prev_mod, prev_res):
        # compute dtype follows the context (bf16 in production — an f32
        # forward puts f32 q/k/v into the flash kernel and OOMs VMEM)
        tokens, e0, de0, _, _, cos, sin, ctx, _, _ = _dit_prepare(
            params, cfg, x.astype(context.dtype), t, context, density, y,
            additional_control, full_ref, rope_tables)
        mod = (e0[1][:, 0] if isinstance(e0, tuple)
               else e0[:, -1]).astype(jnp.float32)
        out = _dit_blocks(params, cfg, tokens, e0, de0, cos, sin, ctx,
                          attn_fn)
        res = (out - tokens).astype(jnp.float32)
        # rel metrics ON DEVICE: only two scalars cross the link per step
        # (the flagship residual is ~286 MB — fetching it per step would
        # be tunnel-bound)
        rel_mod = (jnp.mean(jnp.abs(mod - prev_mod))
                   / (jnp.mean(jnp.abs(prev_mod)) + 1e-12))
        rel_res = (jnp.mean(jnp.abs(res - prev_res))
                   / (jnp.mean(jnp.abs(prev_res)) + 1e-12))
        return mod, res, rel_mod, rel_res

    one_jit = jax.jit(one)
    # seed carries at the right shapes via eval_shape (one trace, no
    # execution) so every step reuses a single compiled executable
    mod_sd, res_sd, _, _ = jax.eval_shape(
        one, params, jnp.asarray(xs[0]), jnp.asarray(ts[0]),
        jax.ShapeDtypeStruct((np.shape(xs[0])[0], 6, cfg.dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((1, 1, cfg.dim), jnp.float32))
    prev_mod = jnp.ones(mod_sd.shape, jnp.float32)
    prev_res = jnp.ones(res_sd.shape, jnp.float32)

    rels, outs = [], []
    for i, (x, t) in enumerate(zip(xs, ts)):
        prev_mod, prev_res, rm, rr = one_jit(
            params, jnp.asarray(x), jnp.asarray(t), prev_mod, prev_res)
        if i > 0:                      # first step diffs the dummy seed
            rels.append(float(rm))
            outs.append(float(rr))
    return np.asarray(rels), np.asarray(outs)


def collect_signals_trajectory(
    params: dict,
    cfg: DiTConfig,
    latent_shape: Tuple[int, ...],     # (B, C, F, H, W)
    context: jnp.ndarray,
    num_steps: int = 12,
    shift: float = 5.0,
    seed: int = 0,
    guidance_scale: float = 6.0,
    **cond_kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Collect calibration signals along a REAL Euler flow-match
    trajectory (not random latent pairs): matches inference statistics."""
    from flexam_tpu.models.dit import dit_forward
    from flexam_tpu.sampling import build_schedule
    from flexam_tpu.sampling.flow_match import (sampler_init_state,
                                                sampler_step,
                                                schedule_arrays)

    tables = build_schedule("euler", num_steps, shift=shift)
    sched = schedule_arrays(tables)
    x = jax.random.normal(jax.random.PRNGKey(seed),
                          latent_shape, jnp.float32)
    state = sampler_init_state(x, tables.order)
    xs, ts = [], []
    # params ride as a jit ARGUMENT (closure capture would inline 10 GB
    # of constants at 5B scale)
    fwd = jax.jit(lambda p, x, t: dit_forward(
        p, cfg, x.astype(context.dtype),
        jnp.full((latent_shape[0],), t, jnp.float32), context,
        **cond_kwargs))
    for i in range(num_steps):
        t = float(tables.timesteps[i])
        xs.append(np.asarray(state[0]))
        ts.append(np.full((latent_shape[0],), t, np.float32))
        v = fwd(params, state[0], t)
        state, _ = sampler_step(sched, tables.convert, state,
                                v.astype(jnp.float32), jnp.int32(i))
    return collect_signals(params, cfg, np.asarray(xs), np.asarray(ts),
                           context, **cond_kwargs)


def fit_coefficients(rels: np.ndarray, outs: np.ndarray,
                     degree: int = 4) -> Tuple[float, ...]:
    """Degree-4 polyfit (the reference table's functional form,
    `cache_utils.py:4-18`), guarded for short/degenerate samples."""
    if len(rels) <= degree:
        # underdetermined: fall back to a linear fit padded with zeros
        k = max(1, len(rels) - 1)
        c = np.polyfit(rels, outs, k)
        c = np.concatenate([np.zeros(degree + 1 - len(c)), c])
        return tuple(float(v) for v in c)
    return tuple(float(v) for v in np.polyfit(rels, outs, degree))


def train_to_smooth(
    cfg: DiTConfig,
    num_steps: int = 40,
    batch: int = 1,
    latent_shape: Tuple[int, int, int] = (2, 8, 8),   # (F, H, W) latent
    lr: float = 2e-4,
    seed: int = 0,
    dtype=jnp.float32,
) -> dict:
    """Train a small DiT with the repo's own flow-matching loop until its
    outputs evolve smoothly along the sigma schedule (the property real
    checkpoints have and random init lacks). The synthetic target is a
    fixed smooth latent video (low-frequency pattern), so the learned
    velocity field becomes a smooth function of (x, t)."""
    import optax

    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.train import train_step

    params = init_dit_params(jax.random.key(seed), cfg, dtype=dtype)
    f, h, w = latent_shape
    # smooth deterministic target latents (low-frequency pattern, scaled
    # per channel); channels = the model's latent width (out_dim)
    ff, hh, ww = jnp.meshgrid(jnp.linspace(0, 1, f), jnp.linspace(0, 1, h),
                              jnp.linspace(0, 1, w), indexing="ij")
    base = jnp.sin(2 * jnp.pi * (ff + hh)) * jnp.cos(2 * jnp.pi * ww)
    c = cfg.out_dim
    lat = jnp.broadcast_to(base[None], (c, f, h, w)) * \
        (1.0 + jnp.arange(c, dtype=jnp.float32)[:, None, None, None] / c)
    batch_lat = jnp.broadcast_to(lat[None], (batch, c, f, h, w))
    ctx = jax.random.normal(jax.random.key(seed + 1),
                            (batch, 4, cfg.text_dim), dtype)

    tx = optax.adamw(lr)
    opt_state = tx.init(params)
    step = jax.jit(lambda p, o, b, k: train_step(p, o, tx, cfg, b, k))
    key = jax.random.key(seed + 2)
    losses = []
    for i in range(num_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(
            params, opt_state,
            {"latents": batch_lat, "context": ctx}, sub)
        losses.append(float(loss))
    params = jax.tree_util.tree_map(lambda a: a, params)  # detach opt refs
    return {"params": params, "losses": losses}


def main(argv=None) -> int:
    """CLI: calibrate coefficients for a checkpoint at a scaled shape.

    python -m flexam_tpu.tools.teacache_calibrate \
        [--ckpt path/transformer] [--steps 12] [--latent F H W] [--json out]
    """
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="DiT checkpoint dir (default: random 5B weights)")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--latent", type=int, nargs=3, default=[9, 16, 16],
                    metavar=("F", "H", "W"))
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from flexam_tpu.config import WAN22_5B_FLEXAM
    cfg = WAN22_5B_FLEXAM.dit
    if args.ckpt:
        from flexam_tpu.io.checkpoints import load_dit_checkpoint
        params = load_dit_checkpoint(args.ckpt, cfg, dtype=np.float16)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.bfloat16), params)
    else:
        from flexam_tpu.models.dit import init_dit_params
        params = init_dit_params(jax.random.key(0), cfg, jnp.bfloat16)

    f, h, w = args.latent
    b = 1
    ctx = jax.random.normal(jax.random.key(1),
                            (b, 16, cfg.text_dim), jnp.bfloat16)
    # bare-DiT calibration shape: x must carry in_dim channels when no y
    rels, outs = collect_signals_trajectory(
        params, cfg, (b, cfg.in_dim, f, h, w), ctx,
        num_steps=args.steps)
    coeffs = fit_coefficients(rels, outs)
    result = {"coefficients": list(coeffs),
              "rel_l1": rels.tolist(), "rel_residual": outs.tolist()}
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
