"""Resize + padding transforms (on-device, channels-last).

Reference pipeline: NaResize(mode="side") -> clamp -> DivisiblePad(16) ->
Normalize(0.5, 0.5) (reference: src/core/generation_utils.py:72-84,
src/data/image/transforms/na_resize.py:23-54, divisible_crop.py:43-80).

The reference resizes with torch/PIL antialiased bicubic (a=-0.5)
(torchvision TVF.resize, side_resize.py:60-74; alpha path
F.interpolate(..., antialias=True), alpha_upscaling.py:341-349). We
reproduce that exactly: PIL-style separable resample weights (support
scaled by the downscale factor, boundary taps renormalized) precomputed on
host per (in, out) pair and applied as two dense matmuls — a layout that
rides the MXU instead of gather-heavy convolution. Verified vs torch
F.interpolate(mode='bicubic', antialias=True) across down/up/odd scale
factors in tests/test_reference_parity.py::TestResizeParity.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL bicubic kernel (a=-0.5) — torch's antialias=True path is
    PIL-compatible and uses a=-0.5; only the non-antialiased torch bicubic
    uses a=-0.75. The reference always resizes with antialias=True
    (side_resize.py:60-62, alpha_upscaling.py:341-349)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        np.where(ax < 2.0, (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a, 0.0),
    )


@lru_cache(maxsize=256)
def resample_matrix(in_size: int, out_size: int) -> np.ndarray:
    """PIL/torch-antialias separable bicubic weights as a dense
    [out_size, in_size] float32 matrix (each row has <= 4*max(scale,1)+2
    nonzeros). Matches torch F.interpolate(mode='bicubic',
    align_corners=False, antialias=True) for down- AND upscale."""
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    support = 2.0 * fscale
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax, dtype=np.float64)
        w = _cubic_kernel((xs - center + 0.5) / fscale)
        s = w.sum()
        if s != 0.0:
            w = w / s
        m[i, xmin:xmax] = w.astype(np.float32)
    return m


def resize_plane(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., out_h, out_w, C] torch-parity bicubic."""
    H, W = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(resample_matrix(H, out_h))
    mw = jnp.asarray(resample_matrix(W, out_w))
    # fp32 islands: image resampling feeds color statistics downstream
    # (reference keeps these ops in fp32, half_precision_fixes.py:55-121)
    y = jnp.einsum("hH,...Hwc->...hwc", mh, x.astype(jnp.float32), precision="highest")
    return jnp.einsum("wW,...hWc->...hwc", mw, y, precision="highest")


def side_resize_dims(
    h: int, w: int, resolution: int, max_resolution: int = 0, downsample_only: bool = False
) -> Tuple[int, int]:
    """Target dims: scale shortest side to `resolution`, cap longest at
    `max_resolution` (reference: na_resize.py:23-54, side_resize.py:47-74).

    Matches torchvision's int-size resize exactly: the long side FLOORS
    (``int(size * long / short)``, torchvision _compute_resized_output_size)
    — round() was off by one at e.g. (20, 24) -> res 33. The max_resolution
    cap then re-scales the *resized* dims with round(), which is the
    reference's own code (side_resize.py:72)."""
    size = min(h, w) if (downsample_only and min(h, w) < resolution) else resolution
    short, long_ = (h, w) if h <= w else (w, h)
    new_short, new_long = size, int(size * long_ / short)
    th, tw = (new_short, new_long) if h <= w else (new_long, new_short)
    if max_resolution > 0 and max(th, tw) > max_resolution:
        scale = max_resolution / max(th, tw)
        th, tw = round(th * scale), round(tw * scale)
    return th, tw


def resize_video(video: jnp.ndarray, size: Tuple[int, int], method: str = "torch_bicubic") -> jnp.ndarray:
    """video: [T, H, W, C] -> [T, size[0], size[1], C]. Default is the
    torch-parity antialiased bicubic (resize_plane); 'cubic'/'linear' fall
    back to jax.image.resize (Keys a=-0.5 kernel)."""
    T, H, W, C = video.shape
    if method == "torch_bicubic":
        return resize_plane(video, size[0], size[1]).astype(video.dtype)
    out = jax.image.resize(
        video.astype(jnp.float32),
        (T, size[0], size[1], C),
        method=method,
        antialias=True,
    )
    return out.astype(video.dtype)


def to_f01(v) -> jnp.ndarray:
    """Promote device frames to float32 [0,1]. uint8/uint16 inputs are
    scaled by 1/255 resp. 1/65535 IN-PROGRAM — the video path uploads raw
    decoder bytes (1-2 B/px instead of 4), and `u.astype(f32)/max` on
    device equals the host conversion the fp32 path performs
    (io/frameops.py), so numerics follow the same [0,1] contract either
    way. uint16 is the ffmpeg reader's lossless >8-bit decode
    (io/video.py:FFmpegReader). PlanarYUV420 input (the codec's native
    planes, 1.5 B/px on the link) is colorspace-converted here so every
    downstream path sees the same RGB [0,1] contract (ops/yuv.py)."""
    from .yuv import PlanarYUV420, yuv420_to_rgb01

    if isinstance(v, PlanarYUV420):
        return yuv420_to_rgb01(v)
    f = v.astype(jnp.float32)
    if v.dtype == jnp.uint8:
        return f / 255.0
    if v.dtype == jnp.uint16:
        return f / 65535.0
    return f


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
