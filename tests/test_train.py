"""Training step: loss decreases on a fixed batch; sharded variant runs
on the 8-device mesh with ZeRO-style optimizer-state placement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.config import tiny_test_config
from flexam_tpu.models.dit import init_dit_params
from flexam_tpu.parallel import (activation_sharding, dit_param_shardings,
                                 make_mesh, shard_pytree)
from flexam_tpu.train import make_train_state, train_step


def _batch(cfg, rng):
    c = cfg.dit.out_dim      # latent channels
    return {
        "latents": rng.randn(2, c, 2, 4, 4).astype(np.float32),
        "context": rng.randn(2, cfg.dit.text_len,
                             cfg.dit.text_dim).astype(np.float32) * 0.1,
        "density": np.array([0.1, 0.1], np.float32),
        "y": rng.randn(2, c + 4 + c, 2, 4, 4).astype(np.float32),
        "additional_control": rng.randn(2, 5 * c, 2, 4, 4
                                        ).astype(np.float32),
        "full_ref": rng.randn(2, c, 4, 4).astype(np.float32),
    }


def test_train_step_reduces_loss():
    cfg = tiny_test_config()
    params = init_dit_params(jax.random.PRNGKey(0), cfg.dit,
                             dtype=jnp.float32)
    tx, opt_state = make_train_state(params, learning_rate=1e-3)
    batch = _batch(cfg, np.random.RandomState(0))
    step = jax.jit(lambda p, o, b, k: train_step(p, o, tx, cfg.dit, b, k))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(5):
        params, opt_state, loss = step(params, opt_state, batch, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_train_step_sharded():
    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2},
                     devices=jax.devices()[:8])
    cfg = tiny_test_config()
    params = init_dit_params(jax.random.PRNGKey(0), cfg.dit,
                             dtype=jnp.float32)
    shardings = dit_param_shardings(mesh, params)
    params = shard_pytree(params, shardings)
    tx, opt_state = make_train_state(params, param_shardings=shardings)
    batch = _batch(cfg, np.random.RandomState(1))
    with activation_sharding(mesh):
        step = jax.jit(lambda p, o, b, k: train_step(p, o, tx, cfg.dit, b, k))
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(2))
        loss = float(loss)
    assert np.isfinite(loss)
    # optimizer moments keep the TP sharding of their params
    mu_q = opt_state[0].mu["blocks"]["self_attn"]["q"]["weight"]
    shapes = {s.data.shape for s in mu_q.addressable_shards}
    assert shapes == {(cfg.dit.num_layers, cfg.dit.dim // 2, cfg.dit.dim)}


def test_train_step_mixed_image_video_batches(tmp_path):
    """The joint dataset's two batch types both drive the train step
    (images as 1-frame clips -> 1 latent frame; VERDICT r1 item 9)."""
    import jax
    import jax.numpy as jnp
    from flexam_tpu.config import tiny_test_config
    from flexam_tpu.models.dit import init_dit_params
    from flexam_tpu.train import make_train_state, train_step

    cfg = tiny_test_config().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tx, opt_state = make_train_state(params)
    rng = np.random.RandomState(0)
    c = cfg.out_dim
    for lt in (1, 3):     # image batch (1 latent frame) / video batch
        batch = {
            "latents": rng.randn(2, c, lt, 4, 4).astype(np.float32),
            "context": rng.randn(2, cfg.text_len,
                                 cfg.text_dim).astype(np.float32) * 0.1,
            "density": np.array([0.1, 0.1], np.float32),
            "y": rng.randn(2, 2 * c + 4, lt, 4, 4).astype(np.float32),
            "additional_control":
                rng.randn(2, 5 * c, lt, 4, 4).astype(np.float32),
            "full_ref": rng.randn(2, c, 4, 4).astype(np.float32),
        }
        params2, opt_state, loss = jax.jit(
            lambda p, o, b, k: train_step(p, o, tx, cfg, b, k)
        )(params, opt_state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)), lt


def _lora_setup():
    cfg = tiny_test_config()
    params = init_dit_params(jax.random.PRNGKey(0), cfg.dit,
                             dtype=jnp.float32)
    batch = _batch(cfg, np.random.RandomState(0))
    return params, cfg, batch


def test_lora_export_merge_equivalence():
    """apply_lora(base, lora) == merge_lora(base, lora_to_state_dict(lora))
    — train-side factors round-trip through BOTH checkpoint layouts the
    hot-merge loader accepts."""
    from flexam_tpu.utils.lora import (apply_lora, init_lora_params,
                                       lora_to_state_dict, merge_lora)
    params, cfg, batch = _lora_setup()
    lora = init_lora_params(jax.random.PRNGKey(7), params, rank=2)
    # non-zero B so the delta is non-trivial
    lora["blocks"] = jax.tree_util.tree_map(lambda a: a + 0.1,
                                            lora["blocks"])
    direct = apply_lora(params, lora)
    for layout in ("kohya", "diffusers"):
        sd = lora_to_state_dict(lora, layout=layout)
        merged = merge_lora(params, sd)
        for mod in lora["blocks"]:
            for proj in lora["blocks"][mod]:
                np.testing.assert_allclose(
                    np.asarray(direct["blocks"][mod][proj]["weight"]),
                    np.asarray(merged["blocks"][mod][proj]["weight"]),
                    rtol=1e-5, atol=1e-6, err_msg=f"{layout} {mod}.{proj}")


def test_lora_train_step_freezes_base():
    """LoRA training: loss decreases, only the factors change, the base
    stays bit-identical; zero-init B means step-0 delta is exactly zero."""
    import optax
    from flexam_tpu.train import lora_train_step
    from flexam_tpu.utils.lora import apply_lora, init_lora_params
    params, cfg, batch = _lora_setup()
    lora = init_lora_params(jax.random.PRNGKey(8), params, rank=2)
    eff0 = apply_lora(params, lora)
    np.testing.assert_array_equal(
        np.asarray(eff0["blocks"]["self_attn"]["q"]["weight"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["weight"]))

    tx = optax.adamw(1e-2)
    opt_state = tx.init(lora["blocks"])
    base_before = jax.tree_util.tree_map(np.asarray, params)
    step = jax.jit(lambda bp, lp, os, k: lora_train_step(
        bp, lp, os, tx, cfg.dit, batch, k))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(6):
        lora, opt_state, loss = step(params, lora, opt_state,
                                     jax.random.fold_in(key, 0))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, base_before,
        jax.tree_util.tree_map(np.asarray, params))


def test_lora_train_step_sharded():
    """LoRA fine-tuning under the dp/sp/tp mesh: the frozen base is
    sharded like inference, the low-rank factors are replicated, and the
    jitted step runs on 8 virtual devices."""
    import optax
    from flexam_tpu.train import lora_train_step
    from flexam_tpu.utils.lora import init_lora_params
    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2},
                     devices=jax.devices()[:8])
    cfg = tiny_test_config()
    params = init_dit_params(jax.random.PRNGKey(0), cfg.dit,
                             dtype=jnp.float32)
    shardings = dit_param_shardings(mesh, params)
    params = shard_pytree(params, shardings)
    lora = init_lora_params(jax.random.PRNGKey(9), params, rank=2)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(lora["blocks"])
    batch = _batch(cfg, np.random.RandomState(2))
    with activation_sharding(mesh):
        step = jax.jit(lambda bp, lp, os, k: lora_train_step(
            bp, lp, os, tx, cfg.dit, batch, k))
        lora2, opt_state, loss = step(params, lora, opt_state,
                                      jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        lora["blocks"], lora2["blocks"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
