"""TeaCache with TRAINED weights + calibrated coefficients (VERDICT r2
item 1): the skip path must actually fire, end to end.

BASELINE.md's round-2 honesty note measured that with random weights and
the reference's Wan2.2 polynomial (`cache_utils.py:4-18`) the rel-L1
metric essentially never crosses the threshold (zero skips). The
methodology under test here: train a small DiT with the repo's own
trainer until its velocity field is smooth, fit the polynomial for THOSE
weights (tools/teacache_calibrate), then run the denoise loop with
`dit_forward_teacache` and assert steps are skipped while outputs stay
close to the uncached forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexam_tpu.config import DiTConfig
from flexam_tpu.models.dit import (dit_forward, dit_forward_teacache,
                                   init_teacache_state)
from flexam_tpu.tools.teacache_calibrate import (collect_signals_trajectory,
                                                 fit_coefficients,
                                                 train_to_smooth)

_CFG = DiTConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2,
                 in_dim=4, out_dim=4, text_dim=16, text_len=4,
                 freq_dim=16, add_ref_conv=False, add_cnn_block=False)


@pytest.fixture(scope="module")
def trained():
    out = train_to_smooth(_CFG, num_steps=30, latent_shape=(2, 4, 4),
                          lr=3e-4)
    return out


def test_training_reduces_loss(trained):
    losses = trained["losses"]
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_calibration_and_skips_fire(trained):
    params = trained["params"]
    b = 1
    ctx = jax.random.normal(jax.random.key(1), (b, 4, _CFG.text_dim))
    shape = (b, _CFG.in_dim, 2, 4, 4)

    rels, outs = collect_signals_trajectory(params, _CFG, shape, ctx,
                                            num_steps=10)
    assert rels.shape == (9,) and np.all(np.isfinite(rels))
    coeffs = fit_coefficients(rels, outs)
    assert len(coeffs) == 5

    # denoise loop with the calibrated polynomial: threshold at the median
    # accumulated estimate so roughly half the steps skip
    from flexam_tpu.sampling import build_schedule
    from flexam_tpu.sampling.flow_match import (sampler_init_state,
                                                sampler_step,
                                                schedule_arrays)
    n = 10
    tables = build_schedule("euler", n, shift=5.0)
    sched = schedule_arrays(tables)
    est = np.polyval(np.asarray(coeffs), rels)
    thresh = float(np.median(np.abs(est)) * 2.0 + 1e-6)

    seq_len = 2 * 2 * 2
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)

    def run(use_tea):
        state = sampler_init_state(x, tables.order)
        tea = init_teacache_state(b, seq_len, _CFG.dim, jnp.float32)
        for i in range(n):
            t = jnp.full((b,), float(tables.timesteps[i]), jnp.float32)
            if use_tea:
                v, tea = dit_forward_teacache(
                    params, _CFG, state[0].astype(jnp.float32), t, ctx,
                    tea, jnp.int32(i), coefficients=coeffs,
                    rel_l1_thresh=thresh, num_skip_start_steps=2)
            else:
                v = dit_forward(params, _CFG,
                                state[0].astype(jnp.float32), t, ctx)
            state, _ = sampler_step(sched, tables.convert, state,
                                    v.astype(jnp.float32), jnp.int32(i))
        return np.asarray(state[0]), (float(tea["computed"])
                                      if use_tea else n)

    ref, _ = run(False)
    got, computed = run(True)
    skipped = n - computed
    assert skipped >= 1, "calibrated TeaCache never skipped"
    assert computed >= 2, "warmup steps must always compute"
    # skipping reuses residuals: outputs drift but must stay in the same
    # regime (the reference accepts this as its headline acceleration)
    rel_err = (np.linalg.norm(got - ref)
               / (np.linalg.norm(ref) + 1e-9))
    assert rel_err < 0.5, rel_err


def test_reference_polynomial_rarely_fires_on_random_weights():
    """The round-2 honesty-note phenomenon, as a pinned regression: the
    WAN22 table + random weights -> no skips at the reference threshold."""
    from flexam_tpu.models.dit import (WAN22_TEACACHE_COEFFICIENTS,
                                       init_dit_params)
    params = init_dit_params(jax.random.key(0), _CFG, jnp.float32)
    b = 1
    ctx = jax.random.normal(jax.random.key(1), (b, 4, _CFG.text_dim))
    shape = (b, _CFG.in_dim, 2, 4, 4)
    from flexam_tpu.sampling import build_schedule
    from flexam_tpu.sampling.flow_match import (sampler_init_state,
                                                sampler_step,
                                                schedule_arrays)
    n = 8
    tables = build_schedule("euler", n, shift=5.0)
    sched = schedule_arrays(tables)
    seq_len = 2 * 2 * 2
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    state = sampler_init_state(x, tables.order)
    tea = init_teacache_state(b, seq_len, _CFG.dim, jnp.float32)
    for i in range(n):
        t = jnp.full((b,), float(tables.timesteps[i]), jnp.float32)
        v, tea = dit_forward_teacache(
            params, _CFG, state[0].astype(jnp.float32), t, ctx, tea,
            jnp.int32(i), coefficients=WAN22_TEACACHE_COEFFICIENTS,
            rel_l1_thresh=0.10, num_skip_start_steps=5)
        state, _ = sampler_step(sched, tables.convert, state,
                                v.astype(jnp.float32), jnp.int32(i))
    # mis-matched polynomial: all (or nearly all) steps compute
    assert float(tea["computed"]) >= n - 1
