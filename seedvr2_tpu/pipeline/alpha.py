"""Edge-guided alpha upscaling, fully on-device.

Reference: src/core/alpha_upscaling.py — the RGBA path never touches
VAE/DiT; RGB is diffused, alpha is classically upscaled with the upscaled
RGB as edge guidance. The reference round-trips to OpenCV on CPU for Sobel;
here Sobel is a pair of jnp depthwise convolutions and the guided filter is
box-filter algebra, so the whole thing fuses into the postprocess phase.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """avg_pool2d(kernel=2r+1, stride=1, pad=r) on [T, H, W] (count includes
    zero padding, matching F.avg_pool2d default count_include_pad=True)."""
    k = 2 * r + 1
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)))
    win = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1, k, k), (1, 1, 1), "VALID"
    )
    return win / (k * k)


def sobel_edges(rgb01: jnp.ndarray) -> jnp.ndarray:
    """[T, H, W, 3] in [0,1] -> edge magnitude [T, H, W] in [0,1], matching
    the reference's cv2 pipeline: gray = Rec.601 luma on uint8, Sobel ksize=3
    with reflect-101 borders, normalized by max (reference:
    alpha_upscaling.py:125-188)."""
    # reference first quantizes RGB to uint8 ((x*255).clip().astype(uint8),
    # truncating), THEN converts to luma (alpha_upscaling.py:150-161)
    rgbq = jnp.floor(jnp.clip(rgb01, 0, 1) * 255.0)
    gray = jnp.round(
        rgbq[..., 0] * 0.299 + rgbq[..., 1] * 0.587 + rgbq[..., 2] * 0.114
    )
    # reflect-101 padding like OpenCV BORDER_DEFAULT
    g = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    # Sobel x/y via separable [1,2,1] smoothing and [-1,0,1] derivative
    def conv3(x, kx, ky):
        x = (
            x[:, :, :-2] * kx[0] + x[:, :, 1:-1] * kx[1] + x[:, :, 2:] * kx[2]
        )
        x = (
            x[:, :-2, :] * ky[0] + x[:, 1:-1, :] * ky[1] + x[:, 2:, :] * ky[2]
        )
        return x

    sx = conv3(g, (-1.0, 0.0, 1.0), (1.0, 2.0, 1.0))
    sy = conv3(g, (1.0, 2.0, 1.0), (-1.0, 0.0, 1.0))
    mag = jnp.sqrt(sx * sx + sy * sy)
    # reference: PER-FRAME normalize to [0,255] uint8 (truncating) then /255
    # (alpha_upscaling.py:163-168, edge.max() inside the frame loop)
    mx = jnp.max(mag, axis=(1, 2), keepdims=True)
    mag = jnp.floor(mag / jnp.maximum(mx, 1e-8) * 255.0) / 255.0
    return jnp.clip(mag, 0.0, 1.0)


def guided_filter(guide_gray: jnp.ndarray, src: jnp.ndarray, radius: int, eps: float) -> jnp.ndarray:
    """He et al. guided filter on [T, H, W]
    (reference: alpha_upscaling.py:235-286)."""
    mean_g = _box_filter(guide_gray, radius)
    mean_s = _box_filter(src, radius)
    corr_g = _box_filter(guide_gray * guide_gray, radius)
    corr_gs = _box_filter(guide_gray * src, radius)
    var_g = corr_g - mean_g * mean_g
    cov_gs = corr_gs - mean_g * mean_s
    a = cov_gs / (var_g + eps)
    b = mean_s - a * mean_g
    mean_a = _box_filter(a, radius)
    mean_b = _box_filter(b, radius)
    return mean_a * guide_gray + mean_b


def _max_pool3(x: jnp.ndarray) -> jnp.ndarray:
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "VALID")


def edge_guided_alpha_upscale(
    alpha_in: jnp.ndarray,  # [T, H_in, W_in] in [0, 1]
    rgb_up01: jnp.ndarray,  # [T, H_out, W_out, 3] in [0, 1]
    is_binary_mask: bool,
) -> jnp.ndarray:
    """Reference: alpha_upscaling.py:289-438. Binary-vs-gradient branch is a
    host decision (static) computed by the caller from input statistics."""
    from ..ops.resize import resize_plane

    T, H_out, W_out, _ = rgb_up01.shape
    # torch-parity antialiased bicubic (reference: F.interpolate bicubic +
    # antialias, alpha_upscaling.py:341-349)
    alpha_up = resize_plane(alpha_in.astype(jnp.float32)[..., None], H_out, W_out)[..., 0]
    alpha_up = jnp.clip(alpha_up, 0.0, 1.0)
    guide = jnp.mean(rgb_up01.astype(jnp.float32), axis=-1)  # gray [T,H,W]

    if not is_binary_mask:
        out = guided_filter(guide, alpha_up, radius=3, eps=0.002)
        return jnp.clip(out, 0.0, 1.0)

    edges = sobel_edges(rgb_up01)
    refined = guided_filter(guide, alpha_up, radius=2, eps=0.002)
    transition = _max_pool3(edges)
    solid_threshold = 0.05
    is_solid = transition < solid_threshold
    binary = (refined > 0.5).astype(jnp.float32)
    contrast = jax.nn.sigmoid((refined - 0.5) * 12.0)
    edge_strength = jnp.clip(edges / 0.25, 0.0, 1.0)
    in_edges = refined * (1 - edge_strength) + contrast * edge_strength
    combined = jnp.where(is_solid, binary, in_edges)
    very_solid = transition < 0.03
    combined = jnp.where(very_solid, (combined > 0.5).astype(jnp.float32), combined)
    tight = edges > 0.15
    mid = (combined > 0.3) & (combined < 0.7)
    snap = mid & ~tight
    out = jnp.where(snap, (combined > 0.5).astype(jnp.float32), combined)
    return jnp.clip(out, 0.0, 1.0)


def upscale_alpha_batch(alpha: np.ndarray, rgb_hi01: np.ndarray) -> np.ndarray:
    """alpha: [T, H_in, W_in, 1]; rgb_hi01: [T, H_out, W_out, 3] in [0,1].
    Returns [T, H_out, W_out] in [0,1]."""
    a = np.asarray(alpha, np.float32)[..., 0]
    binary_ratio = float(((a < 0.1) | (a > 0.9)).mean())
    is_binary = binary_ratio > 0.95  # reference: alpha_upscaling.py:316-321
    out = edge_guided_alpha_upscale(jnp.asarray(a), jnp.asarray(rgb_hi01), is_binary)
    return np.asarray(jax.device_get(out))
