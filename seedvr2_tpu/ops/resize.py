"""Resize + padding transforms (on-device, channels-last).

Reference pipeline: NaResize(mode="side") -> clamp -> DivisiblePad(16) ->
Normalize(0.5, 0.5) (reference: src/core/generation_utils.py:72-84,
src/data/image/transforms/na_resize.py:23-54, divisible_crop.py:43-80).

The reference resizes with torch bicubic (a=-0.75); jax.image 'cubic' is the
Keys kernel (a=-0.5). Both are antialiased bicubics; the difference is below
visible thresholds and is accepted as a framework-level numeric (goldens are
per-framework, SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def side_resize_dims(
    h: int, w: int, resolution: int, max_resolution: int = 0, downsample_only: bool = False
) -> Tuple[int, int]:
    """Target dims: scale shortest side to `resolution`, cap longest at
    `max_resolution` (reference: na_resize.py:23-54)."""
    scale = resolution / min(h, w)
    if downsample_only:
        scale = min(scale, 1.0)
    if max_resolution > 0 and max(h, w) * scale > max_resolution:
        scale = max_resolution / max(h, w)
    return round(h * scale), round(w * scale)


def resize_video(video: jnp.ndarray, size: Tuple[int, int], method: str = "cubic") -> jnp.ndarray:
    """video: [T, H, W, C] -> [T, size[0], size[1], C], antialiased on
    downscale (matches torchvision antialias=True behaviour)."""
    T, H, W, C = video.shape
    out = jax.image.resize(
        video.astype(jnp.float32),
        (T, size[0], size[1], C),
        method=method,
        antialias=True,
    )
    return out.astype(video.dtype)


def divisible_pad(video: jnp.ndarray, factor: int = 16) -> jnp.ndarray:
    """Zero-pad H/W up to a multiple of `factor` (bottom/right), lossless
    (reference: divisible_crop.py:43-80 — padding replaced cropping)."""
    T, H, W, C = video.shape
    ph = (-H) % factor
    pw = (-W) % factor
    if ph == 0 and pw == 0:
        return video
    return jnp.pad(video, ((0, 0), (0, ph), (0, pw), (0, 0)))


def pipeline_transform(
    video: jnp.ndarray,  # [T, H, W, C] in [0, 1]
    resolution: int,
    max_resolution: int = 0,
    divisible: int = 16,
) -> jnp.ndarray:
    """Full reference transform: resize-side -> clamp -> pad/16 ->
    normalize to [-1, 1]. Returns [T, H', W', C]."""
    T, H, W, C = video.shape
    th, tw = side_resize_dims(H, W, resolution, max_resolution)
    out = resize_video(video, (th, tw))
    out = jnp.clip(out, 0.0, 1.0)
    out = divisible_pad(out, divisible)
    return out * 2.0 - 1.0


def true_target_dims(h: int, w: int, resolution: int, max_resolution: int = 0) -> Tuple[int, int]:
    """Output dims before padding, rounded down to even for codecs
    (reference: generation_utils.py:132-137)."""
    th, tw = side_resize_dims(h, w, resolution, max_resolution)
    return (th // 2) * 2, (tw // 2) * 2
