"""Parity: flow-matching samplers vs the ACTUAL reference fm_solvers /
fm_solvers_unipc modules, stepped exactly as the pipeline steps them
(`pipeline_wan2_2_fun_control_FlexAM.py:604-614,931`)."""

import numpy as np
import pytest
import torch

from flexam_tpu.sampling import build_schedule, make_sampler
from tests.reference_oracle import load_reference_module

SHAPE = (1, 4, 2, 4, 4)


def _velocities(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(*SHAPE).astype(np.float32) for _ in range(n)]


def _run_ours(tables, x0, vels):
    init_state, step = make_sampler(tables)
    state = init_state(x0)
    x = None
    for i, v in enumerate(vels):
        state, x = step(state, v, np.int32(i))
    return np.asarray(x)


def _run_reference(scheduler, timesteps, x0, vels):
    x = torch.from_numpy(x0.copy())
    for t, v in zip(timesteps, vels):
        x = scheduler.step(torch.from_numpy(v), t, x, return_dict=False)[0]
    return x.numpy()


@pytest.fixture(scope="module")
def fm_solvers():
    return load_reference_module("FlexAM/utils/fm_solvers.py", "ref_fm_solvers")


@pytest.fixture(scope="module")
def fm_unipc():
    return load_reference_module(
        "FlexAM/utils/fm_solvers_unipc.py", "ref_fm_solvers_unipc")


@pytest.mark.parametrize("steps,order", [(9, 2), (20, 2), (20, 3)])
def test_dpm_trajectory_parity(fm_solvers, steps, order):
    shift = 5.0
    ref = fm_solvers.FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000, shift=shift, solver_order=order)
    sampling_sigmas = fm_solvers.get_sampling_sigmas(steps, shift)
    ref.set_timesteps(sigmas=sampling_sigmas)

    tables = build_schedule("flow_dpm", steps, shift=shift,
                            solver_order=order)
    np.testing.assert_allclose(
        tables.sigmas, ref.sigmas.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        tables.timesteps.astype(np.int64), ref.timesteps.numpy())

    x0 = np.random.RandomState(1).randn(*SHAPE).astype(np.float32)
    vels = _velocities(steps)
    ref_x = _run_reference(ref, ref.timesteps, x0, vels)
    our_x = _run_ours(tables, x0, vels)
    np.testing.assert_allclose(our_x, ref_x, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("steps,order", [(9, 2), (20, 2)])
def test_unipc_trajectory_parity(fm_unipc, steps, order):
    shift = 5.0
    ref = fm_unipc.FlowUniPCMultistepScheduler(
        num_train_timesteps=1000, shift=shift, solver_order=order)
    ref.set_timesteps(steps, shift=shift)

    tables = build_schedule("flow_unipc", steps, shift=shift,
                            solver_order=order)
    np.testing.assert_allclose(
        tables.sigmas, ref.sigmas.numpy(), rtol=1e-6, atol=1e-7)

    x0 = np.random.RandomState(2).randn(*SHAPE).astype(np.float32)
    vels = _velocities(steps, seed=3)
    ref_x = _run_reference(ref, ref.timesteps, x0, vels)
    our_x = _run_ours(tables, x0, vels)
    np.testing.assert_allclose(our_x, ref_x, rtol=1e-4, atol=1e-5)


def test_euler_schedule_and_step():
    """diffusers FlowMatchEulerDiscrete semantics: sigma_max stays 1.0, the
    min end is double-shifted, step is x += (sig_next - sig) * v."""
    shift, steps, t = 5.0, 10, 1000
    tables = build_schedule("flow_match_euler", steps, shift=shift)
    assert tables.sigmas[0] == pytest.approx(1.0)
    assert tables.sigmas[-1] == 0.0
    # min end: f(f(1/1000)) with f(s) = shift*s/(1+(shift-1)*s)
    f = lambda s: shift * s / (1 + (shift - 1) * s)
    assert tables.sigmas[-2] == pytest.approx(f(f(1 / t)), rel=1e-6)
    assert np.all(np.diff(tables.sigmas) < 0)

    x0 = np.random.RandomState(4).randn(*SHAPE).astype(np.float32)
    vels = _velocities(steps, seed=5)
    x = x0.copy()
    for i, v in enumerate(vels):
        x = x + (tables.sigmas[i + 1] - tables.sigmas[i]).astype(np.float32) * v
    our_x = _run_ours(tables, x0, vels)
    np.testing.assert_allclose(our_x, x, rtol=1e-5, atol=1e-6)


def test_last_step_returns_x0_pred(fm_solvers):
    """sigma_final = 0 must collapse the update to the x0 prediction."""
    steps = 5
    tables = build_schedule("flow_dpm", steps, shift=5.0, solver_order=2)
    x0 = np.random.RandomState(6).randn(*SHAPE).astype(np.float32)
    vels = _velocities(steps, seed=7)
    our_x = _run_ours(tables, x0, vels)
    assert np.all(np.isfinite(our_x))
