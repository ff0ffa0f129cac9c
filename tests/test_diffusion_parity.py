"""Diffusion math parity vs the reference: schedule, timesteps, Euler loop,
CFG, SD3 timestep transform."""

import importlib

import numpy as np
import torch

import jax.numpy as jnp

from seedvr2_tpu.core import diffusion

from .oracle_ref import load_reference_src


def _ref():
    load_reference_src()
    return importlib.import_module("refsrc.common.diffusion")


def test_trailing_timesteps_parity():
    ref = _ref()
    for steps, shift in [(1, 1.0), (4, 1.0), (50, 3.0)]:
        r = ref.UniformTrailingSamplingTimesteps(
            T=1000.0, steps=steps, shift=shift).timesteps.numpy()
        m = diffusion.trailing_timesteps(1000.0, steps, shift)
        np.testing.assert_allclose(m, r, rtol=1e-6)


def test_euler_sampling_trajectory_parity():
    ref = _ref()
    schedule_ref = ref.LinearInterpolationSchedule(T=1000.0)
    ts = ref.UniformTrailingSamplingTimesteps(T=1000.0, steps=4)
    sampler = ref.EulerSampler(schedule=schedule_ref, timesteps=ts,
                               prediction_type="v_lerp")

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 3, 4)).astype(np.float32)
    w = rng.standard_normal((1,)).astype(np.float32)

    def f_ref(args):
        return torch.sin(args.x_t * float(w[0])) + args.t / 1000.0

    with torch.no_grad():
        out_ref = sampler.sample(torch.from_numpy(x0.copy()), f_ref).numpy()

    def f_mine(x, t, i):
        return jnp.sin(x * float(w[0])) + t / 1000.0

    out = np.asarray(diffusion.sample(
        diffusion.LerpSchedule(1000.0),
        diffusion.trailing_timesteps(1000.0, 4),
        jnp.asarray(x0), f_mine, pred_type="v_lerp"))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


def test_cfg_parity():
    ref = _ref()
    rng = np.random.default_rng(1)
    pos = rng.standard_normal((2, 8, 4)).astype(np.float32)
    neg = rng.standard_normal((2, 8, 4)).astype(np.float32)
    for scale, rescale in [(7.5, 0.0), (3.0, 0.5)]:
        r = ref.classifier_free_guidance(
            torch.from_numpy(pos.copy()), torch.from_numpy(neg.copy()),
            scale, rescale).numpy()
        m = np.asarray(diffusion.classifier_free_guidance(
            jnp.asarray(pos), jnp.asarray(neg), scale, rescale))
        np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)


def test_timestep_shift_formula():
    """SD3 resolution shift (infer.py:260-290): check the closed form at the
    calibration anchor points."""
    # image anchor: 256x256 latent -> shift 1.0 (t unchanged)
    t = diffusion.timestep_shift(jnp.asarray([500.0]),
                                 jnp.asarray([[1, 32, 32]]), T=1000.0)
    np.testing.assert_allclose(np.asarray(t), [500.0], rtol=1e-5)
    # video anchor: 37 frames at 256x256 -> shift 1.0
    t = diffusion.timestep_shift(jnp.asarray([500.0]),
                                 jnp.asarray([[10, 32, 32]]), T=1000.0)
    np.testing.assert_allclose(np.asarray(t), [500.0], rtol=1e-5)
    # higher resolution shifts timesteps upward (toward noise)
    t = diffusion.timestep_shift(jnp.asarray([500.0]),
                                 jnp.asarray([[1, 128, 128]]), T=1000.0)
    assert float(t[0]) > 500.0
