"""Rectified-flow diffusion math: schedule, timesteps, Euler sampler, CFG.

Functional JAX re-derivation of the reference stack:
 - LinearInterpolationSchedule (src/common/diffusion/schedules/lerp.py:25-55)
 - UniformTrailingSamplingTimesteps + SD3 shift
   (src/common/diffusion/timesteps/sampling/trailing.py:21-50)
 - EulerSampler.step_to (src/common/diffusion/samplers/euler.py:59-96)
 - classifier_free_guidance (src/common/diffusion/utils.py)

Everything is pure and trace-friendly: timesteps are computed host-side with
numpy; step math is jnp so it fuses into the jitted denoise step.
"""

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np


class LerpSchedule:
    """x_t = A(t) x_0 + B(t) x_T with A = 1 - t/T, B = t/T (continuous)."""

    def __init__(self, T: float = 1000.0):
        self.T = float(T)

    def A(self, t):
        return 1.0 - t / self.T

    def B(self, t):
        return t / self.T

    def forward(self, x_0, x_T, t):
        t = jnp.asarray(t, dtype=jnp.float32)
        a = self.A(t).astype(x_0.dtype)
        b = self.B(t).astype(x_0.dtype)
        return a * x_0 + b * x_T

    def convert_from_pred(self, pred, pred_type: str, x_t, t):
        """Return (pred_x_0, pred_x_T); v_lerp: v = x_T - x_0."""
        t = jnp.asarray(t, dtype=jnp.float32)
        a = self.A(t).astype(jnp.float32)
        b = self.B(t).astype(jnp.float32)
        p32 = pred.astype(jnp.float32)
        x32 = x_t.astype(jnp.float32)
        if pred_type == "v_lerp":
            denom = a + b
            x0 = (x32 - b * p32) / denom
            xT = (x32 + a * p32) / denom
        elif pred_type == "x_0":
            x0 = p32
            xT = (x32 - a * x0) / b
        elif pred_type == "x_T":
            xT = p32
            x0 = (x32 - b * xT) / a
        else:
            raise NotImplementedError(pred_type)
        return x0.astype(pred.dtype), xT.astype(pred.dtype)


def trailing_timesteps(T: float, steps: int, shift: float = 1.0) -> np.ndarray:
    """Uniform trailing timesteps in (0, T], descending; SD3 eq.23 shift."""
    t = np.arange(1.0, 0.0, -1.0 / steps, dtype=np.float64).astype(np.float32)
    t = shift * t / (1.0 + (shift - 1.0) * t)
    return (t * T).astype(np.float32)


def timestep_shift(timesteps, latent_shapes, T: float = 1000.0,
                   temporal_down: int = 4, spatial_down: int = 8):
    """Resolution-dependent SD3-style timestep transform.

    Mirrors VideoDiffusionInfer.timestep_transform (src/core/infer.py:260-290):
    image vs video linear shift functions of pixel count.

    Args:
        timesteps: (...,) timesteps in [0, T].
        latent_shapes: (..., 3) latent (t, h, w) per sample.
    """
    latent_shapes = jnp.asarray(latent_shapes, dtype=jnp.float32)
    frames = (latent_shapes[..., 0] - 1.0) * temporal_down + 1.0
    heights = latent_shapes[..., 1] * spatial_down
    widths = latent_shapes[..., 2] * spatial_down

    def lin(x1, y1, x2, y2, x):
        m = (y2 - y1) / (x2 - x1)
        return m * x + (y1 - m * x1)

    img_shift = lin(256.0 * 256.0, 1.0, 1024.0 * 1024.0, 3.2, heights * widths)
    vid_shift = lin(256.0 * 256.0 * 37.0, 1.0, 1280.0 * 720.0 * 145.0, 5.0,
                    heights * widths * frames)
    shift = jnp.where(frames > 1.0, vid_shift, img_shift)

    t = jnp.asarray(timesteps, dtype=jnp.float32) / T
    t = shift * t / (1.0 + (shift - 1.0) * t)
    return t * T


def euler_step_to(schedule: LerpSchedule, pred, x_t, t, s,
                  pred_type: str = "v_lerp"):
    """One Euler step from x_t at t to x_s at s (euler.py:59-96).

    Out-of-bound s is clamped to the endpoints: s < 0 -> x_0, s > T -> x_T.
    """
    T = schedule.T
    x0, xT = schedule.convert_from_pred(pred, pred_type, x_t, t)
    s_arr = jnp.asarray(s, dtype=jnp.float32)
    x_s = schedule.forward(x0, xT, jnp.clip(s_arr, 0.0, T))
    x_s = jnp.where(s_arr >= 0.0, x_s, x0)
    x_s = jnp.where(s_arr <= T, x_s, xT)
    return x_s


def sample(
    schedule: LerpSchedule,
    timesteps: Sequence[float],
    x: jnp.ndarray,
    f: Callable[[jnp.ndarray, float, int], jnp.ndarray],
    pred_type: str = "v_lerp",
    return_endpoint: bool = True,
):
    """Euler sampling loop. `timesteps` is a static python/numpy sequence so
    the loop unrolls at trace time (1 step in the distilled SeedVR2 path)."""
    ts = [float(t) for t in np.asarray(timesteps)]
    for i, (t, s) in enumerate(zip(ts[:-1], ts[1:])):
        pred = f(x, t, i)
        x = euler_step_to(schedule, pred, x, t, s, pred_type)
    if return_endpoint:
        t = ts[-1]
        pred = f(x, t, len(ts) - 1)
        x0, xT = schedule.convert_from_pred(pred, pred_type, x, t)
        x = x0  # backward sampling endpoint
    return x


def classifier_free_guidance(pos, neg, scale: float, rescale: float = 0.0):
    cfg = neg + scale * (pos - neg)
    if rescale != 0.0:
        axes = tuple(range(1, pos.ndim))
        pos_std = jnp.std(pos, axis=axes, keepdims=True)
        cfg_std = jnp.std(cfg, axis=axes, keepdims=True)
        factor = pos_std / cfg_std
        factor = rescale * factor + (1.0 - rescale)
        cfg = cfg * factor
    return cfg


def logitnormal_timesteps(key, shape, T: float = 1000.0, loc: float = 0.0,
                          scale: float = 1.0):
    """Training timesteps t = sigmoid(N(loc, scale)) * T (configs diffusion
    .timesteps.training). Used by the training step (trainer subsystem)."""
    import jax

    z = jax.random.normal(key, shape, dtype=jnp.float32) * scale + loc
    return jax.nn.sigmoid(z) * T
