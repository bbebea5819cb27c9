"""Flow-matching training step for the FlexAM DiT.

The reference ships the training data layer (datasets, bucket sampler,
SP-aware timestep sampling, DeepSpeed ZeRO configs — SURVEY.md §2.3) but
no trainer script. This module completes the loop TPU-natively:

  * flow-matching objective: x_sigma = (1-sigma) x0 + sigma eps, target
    velocity v* = eps - x0 (the FlowMatchEuler step direction), MSE loss;
  * timesteps via `flexam_tpu.data.DiscreteSampling` (SP-group-uniform);
  * optax adamw; optimizer state sharded with the SAME NamedShardings as
    the parameters — the ZeRO-2/3 equivalent
    (`config/zero_stage3_config.json`) under GSPMD;
  * activation remat via the `remat` policies on the DiT block scan
    (`ac_handle.py` equivalent);
  * dp/sp/tp mesh: batch on dp, tokens on sp, block weights on tp —
    gradients are averaged by GSPMD's psum over dp automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from flexam_tpu.config import DiTConfig
from flexam_tpu.models.dit import dit_forward


def flow_match_loss(params, cfg: DiTConfig, batch: Dict, sigma: jnp.ndarray,
                    eps: jnp.ndarray, rope_tables=None,
                    remat: str = "dots") -> jnp.ndarray:
    """batch: {latents [B,C,F,H,W], context, density?, y?,
    additional_control?, full_ref?}; sigma: [B] in (0,1]."""
    x0 = batch["latents"].astype(jnp.float32)
    s = sigma[:, None, None, None, None].astype(jnp.float32)
    x_sigma = (1.0 - s) * x0 + s * eps
    t = sigma * 1000.0
    v_pred = dit_forward(
        params, cfg, x_sigma.astype(batch["context"].dtype), t,
        batch["context"], density=batch.get("density"),
        y=batch.get("y"), additional_control=batch.get("additional_control"),
        full_ref=batch.get("full_ref"), rope_tables=rope_tables)
    target = eps - x0
    return jnp.mean((v_pred.astype(jnp.float32) - target) ** 2)


def make_train_state(params, learning_rate: float = 1e-5,
                     weight_decay: float = 1e-2,
                     param_shardings=None):
    """(optimizer, opt_state). With `param_shardings`, the adamw moments
    are placed with the same sharding as their parameters (ZeRO-style)."""
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = tx.init(params)
    if param_shardings is not None:
        # mu/nu mirror the param tree; re-place them with param shardings
        def shard_like(state):
            if isinstance(state, optax.ScaleByAdamState):
                mu = jax.tree_util.tree_map(jax.device_put, state.mu,
                                            param_shardings)
                nu = jax.tree_util.tree_map(jax.device_put, state.nu,
                                            param_shardings)
                return state._replace(mu=mu, nu=nu)
            return state
        opt_state = tuple(shard_like(s) for s in opt_state)
    return tx, opt_state


def train_step(params, opt_state, tx, cfg: DiTConfig, batch: Dict,
               key: jax.Array, rope_tables=None
               ) -> Tuple[dict, object, jnp.ndarray]:
    """One flow-matching update. Jit this (optionally under a mesh with
    sharded params); GSPMD averages grads over the dp axis."""
    b = batch["latents"].shape[0]
    k_sig, k_eps = jax.random.split(key)
    sigma = jax.random.uniform(k_sig, (b,), jnp.float32, 1e-4, 1.0)
    eps = jax.random.normal(k_eps, batch["latents"].shape, jnp.float32)

    def loss_fn(p):
        return flow_match_loss(p, cfg, batch, sigma, eps, rope_tables)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def lora_train_step(base_params, lora_params, opt_state, tx,
                    cfg: DiTConfig, batch: Dict, key: jax.Array,
                    rope_tables=None, multiplier: float = 1.0
                    ) -> Tuple[dict, object, jnp.ndarray]:
    """LoRA fine-tuning update: the base DiT stays FROZEN; gradients flow
    only through the low-rank factors via `utils.lora.apply_lora`
    (train-side `LoRANetwork`, reference `lora_utils.py:158-370` — which
    ships without a trainer; this completes it). Jit with base_params as
    an argument (never a closure constant: 10 GB MLIR inline)."""
    from flexam_tpu.utils.lora import apply_lora

    b = batch["latents"].shape[0]
    k_sig, k_eps = jax.random.split(key)
    sigma = jax.random.uniform(k_sig, (b,), jnp.float32, 1e-4, 1.0)
    eps = jax.random.normal(k_eps, batch["latents"].shape, jnp.float32)

    def loss_fn(blocks):
        p = apply_lora(base_params, {**lora_params, "blocks": blocks},
                       multiplier=multiplier)
        return flow_match_loss(p, cfg, batch, sigma, eps, rope_tables)

    # only the low-rank factors train; rank/alpha are static metadata
    # (init the optimizer with tx.init(lora_params["blocks"]))
    loss, grads = jax.value_and_grad(loss_fn)(lora_params["blocks"])
    updates, opt_state = tx.update(grads, opt_state, lora_params["blocks"])
    blocks = optax.apply_updates(lora_params["blocks"], updates)
    return {**lora_params, "blocks": blocks}, opt_state, loss
