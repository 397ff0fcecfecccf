"""Rectified-flow diffusion math.

Pure-function port of the reference's schedule/sampler/timesteps stack
(reference: src/common/diffusion/schedules/{base,lerp}.py,
samplers/euler.py, timesteps/sampling/trailing.py, utils.py). The lerp
schedule is ``x_t = A(t) x_0 + B(t) x_T`` with A = 1 - t/T, B = t/T.

All functions are jit-compatible; the deployed SR config runs exactly one
Euler step at cfg scale 1 (reference: src/core/generation_phases.py:599-601),
so the whole "sampling loop" constant-folds into a single DiT call.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np


# ----------------------------- schedule (lerp) ----------------------------- #


def schedule_A(t: jnp.ndarray, T: float) -> jnp.ndarray:
    return 1.0 - t / T


def schedule_B(t: jnp.ndarray, T: float) -> jnp.ndarray:
    return t / T


def schedule_forward(x0: jnp.ndarray, xT: jnp.ndarray, t: jnp.ndarray, T: float) -> jnp.ndarray:
    """x_t = A(t) x_0 + B(t) x_T, with t broadcast from the left (batch dim).
    Reference: schedules/base.py:79-84."""
    t = expand_dims_right(t, x0.ndim)
    return schedule_A(t, T) * x0 + schedule_B(t, T) * xT


def schedule_snr(t: jnp.ndarray, T: float) -> jnp.ndarray:
    return (schedule_A(t, T) ** 2) / (schedule_B(t, T) ** 2)


def schedule_isnr(snr: jnp.ndarray, T: float) -> jnp.ndarray:
    return T / (1.0 + snr**0.5)


def convert_from_pred(
    pred: jnp.ndarray, pred_type: str, x_t: jnp.ndarray, t: jnp.ndarray, T: float
):
    """Return (pred_x0, pred_xT). Reference: schedules/base.py:87-118."""
    t = expand_dims_right(t, x_t.ndim)
    A = schedule_A(t, T)
    B = schedule_B(t, T)
    if pred_type == "x_T":
        x_T = pred
        x_0 = (x_t - B * x_T) / A
    elif pred_type == "x_0":
        x_0 = pred
        x_T = (x_t - A * x_0) / B
    elif pred_type == "v_cos":
        x_0 = A * x_t - B * pred
        x_T = A * pred + B * x_t
    elif pred_type == "v_lerp":
        x_0 = (x_t - B * pred) / (A + B)
        x_T = (x_t + A * pred) / (A + B)
    else:
        raise NotImplementedError(pred_type)
    return x_0, x_T


def convert_to_pred(
    x_0: jnp.ndarray, x_T: jnp.ndarray, t: jnp.ndarray, T: float, pred_type: str
) -> jnp.ndarray:
    """Reference: schedules/base.py:110-128."""
    if pred_type == "x_T":
        return x_T
    if pred_type == "x_0":
        return x_0
    if pred_type == "v_cos":
        t = expand_dims_right(t, x_0.ndim)
        return schedule_A(t, T) * x_T - schedule_B(t, T) * x_0
    if pred_type == "v_lerp":
        return x_T - x_0
    raise NotImplementedError(pred_type)


# ------------------------------- timesteps --------------------------------- #


def uniform_trailing_timesteps(steps: int, T: float = 1000.0, shift: float = 1.0) -> np.ndarray:
    """Trailing timesteps with SD3 shift (reference: trailing.py:31-50):
    t_i = 1 - i/steps for i in [0, steps); shifted s*t/(1+(s-1)t); scaled by T.
    """
    t = np.arange(1.0, 0.0, -1.0 / steps)[:steps]
    t = shift * t / (1.0 + (shift - 1.0) * t)
    return (t * T).astype(np.float32)


def timestep_shift(t: jnp.ndarray, shift: jnp.ndarray, T: float) -> jnp.ndarray:
    """Apply the SD3-style shift to timesteps in [0, T]."""
    u = t / T
    u = shift * u / (1.0 + (shift - 1.0) * u)
    return u * T


def timestep_transform(
    t: jnp.ndarray,  # [b] in [0, T]
    latent_shapes: jnp.ndarray,  # [b, 3] (t, h, w) latent dims
    T: float = 1000.0,
    temporal_downsample: int = 4,
    spatial_downsample: int = 8,
) -> jnp.ndarray:
    """Resolution-dependent timestep shift (reference: src/core/infer.py:281-311):
    images interpolate 256^2 -> 1.0 .. 1024^2 -> 3.2; videos
    256^2*37 -> 1.0 .. 1280*720*145 -> 5.0 over pixel volume."""
    frames = (latent_shapes[:, 0] - 1) * temporal_downsample + 1
    heights = latent_shapes[:, 1] * spatial_downsample
    widths = latent_shapes[:, 2] * spatial_downsample

    def lin(x1, y1, x2, y2, x):
        m = (y2 - y1) / (x2 - x1)
        return m * x + (y1 - m * x1)

    img_shift = lin(256.0 * 256, 1.0, 1024.0 * 1024, 3.2, (heights * widths).astype(jnp.float32))
    vid_shift = lin(
        256.0 * 256 * 37,
        1.0,
        1280.0 * 720 * 145,
        5.0,
        (heights * widths * frames).astype(jnp.float32),
    )
    shift = jnp.where(frames > 1, vid_shift, img_shift)
    return timestep_shift(t, shift, T)


# --------------------------------- sampler --------------------------------- #


def euler_step_to(
    pred: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    s: jnp.ndarray,
    T: float,
    pred_type: str,
) -> jnp.ndarray:
    """Step x_t -> x_s, clamping out-of-range s to the endpoints
    (reference: samplers/euler.py:69-95)."""
    x_0, x_T = convert_from_pred(pred, pred_type, x_t, t, T)
    s_exp = expand_dims_right(s, x_t.ndim)
    x_s = schedule_forward(x_0, x_T, jnp.clip(s, 0.0, T), T)
    x_s = jnp.where(s_exp >= 0, x_s, x_0)
    x_s = jnp.where(s_exp <= T, x_s, x_T)
    return x_s


def euler_sample(
    x: jnp.ndarray,
    f: Callable[[jnp.ndarray, jnp.ndarray, int], jnp.ndarray],
    timesteps: Sequence[float],
    T: float,
    pred_type: str,
) -> jnp.ndarray:
    """Euler ODE solve over a *static* timestep list; the last step targets
    s=0 (return_endpoint behaviour of the reference sampler: with trailing
    timesteps the final pair is (t_last, 0) because the sampler appends the
    endpoint; with steps=1 this is one model call)."""
    ts = list(timesteps) + [0.0]
    for i, (t, s) in enumerate(zip(ts[:-1], ts[1:])):
        t_arr = jnp.full((x.shape[0],), t, dtype=jnp.float32)
        s_arr = jnp.full((x.shape[0],), s, dtype=jnp.float32)
        pred = f(x, t_arr, i)
        x = euler_step_to(pred, x, t_arr, s_arr, T, pred_type)
    return x


# ----------------------------------- CFG ----------------------------------- #


def classifier_free_guidance(
    pos: jnp.ndarray, neg: jnp.ndarray, scale: float, rescale: float = 0.0
) -> jnp.ndarray:
    """Reference: diffusion/utils.py:42-63."""
    cfg = neg + scale * (pos - neg)
    if rescale != 0.0:
        axes = tuple(range(1, pos.ndim))
        pos_std = jnp.std(pos, axis=axes, keepdims=True)
        cfg_std = jnp.std(cfg, axis=axes, keepdims=True)
        factor = pos_std / cfg_std
        factor = rescale * factor + (1.0 - rescale)
        cfg = cfg * factor
    return cfg


def cfg_dispatch(pos_fn, neg_fn, scale: float, rescale: float = 0.0):
    """Skip the negative branch entirely at scale==1
    (reference: diffusion/utils.py:66-84)."""
    if scale == 1.0:
        return pos_fn()
    return classifier_free_guidance(pos_fn(), neg_fn(), scale, rescale)


# --------------------------------- helpers --------------------------------- #


def expand_dims_right(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    t = jnp.asarray(t)
    return t.reshape(t.shape + (1,) * (ndim - t.ndim))
