"""On-device yuv420p <-> RGB conversion and the planar frame container.

Why this exists: the pipeline's source and sink are almost always yuv420p
video (every mp4 the reference reads or writes is — its CLI decodes to
RGB on the HOST with cv2/swscale and re-encodes to yuv420p on the way
out, /root/reference/inference_cli.py:469-575, 640-713). Doing the
colorspace conversion on the TPU instead means the host link carries the
codec's native planes: 1.5 B/px instead of 3 B/px for 8-bit RGB24 (3 vs
6 for the 10-bit sink) — on this dev tunnel (~40 MB/s) that is ~0.17 s
off the upload and ~0.2 s off the exposed final-chunk fetch of the
5-frame 1080p workload, and on a real PCIe host it still halves the
transfer plus drops the host-side swscale pass entirely. The conversion
itself is a handful of VPU ops that XLA fuses into the neighbouring
resize / pack stages.

Colorimetry: BT.601 limited range ("MPEG" range), the default both
swscale (untagged rawvideo) and cv2 apply — so files produced through
the device path match the reference writer's within rounding. Chroma is
2x2 box-averaged on encode and bilinearly upsampled (half-pixel centers,
jax.image.resize 'linear') on decode.

Depth: 8-bit planes are uint8 codes (Y 16..235, C 16..240); 10-bit
planes are uint16 holding 10-bit codes (x4 offsets/excursions), the
layout ffmpeg's yuv420p10le rawvideo expects.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_KR, _KG, _KB = 0.299, 0.587, 0.114  # BT.601


def _ranges(depth: int):
    s = float(1 << (depth - 8))
    return 16.0 * s, 219.0 * s, 128.0 * s, 224.0 * s  # y0, yr, c0, cr


def _code_dtype(depth: int):
    return jnp.uint8 if depth == 8 else jnp.uint16


@dataclass
class PlanarYUV420:
    """yuv420p frames as three planes: y [T,H,W], u/v [T,H/2,W/2].

    Registered as a jax pytree, so it flows through jax.jit / device_put
    unchanged — the fused head executable takes it directly as its frame
    argument. ``shape`` mimics the THWC contract ((T,H,W,3)) so the
    batching / geometry code paths need no planar special-casing.
    """

    y: Any
    u: Any
    v: Any
    depth: int = 8

    @property
    def shape(self):
        t, h, w = self.y.shape
        return (t, h, w, 3)

    @property
    def ndim(self):
        return 4

    def __len__(self):
        return self.y.shape[0]

    def tmap(self, fn) -> "PlanarYUV420":
        """Apply the same temporal (axis-0) transform to every plane."""
        return PlanarYUV420(fn(self.y), fn(self.u), fn(self.v), self.depth)

    def __getitem__(self, key) -> "PlanarYUV420":
        if not (isinstance(key, slice) or isinstance(key, int)):
            raise TypeError("PlanarYUV420 indexes frames (axis 0) only")
        if isinstance(key, int):
            key = slice(key, key + 1 if key != -1 else None)
        return self.tmap(lambda p: p[key])

    def to_numpy(self) -> "PlanarYUV420":
        return PlanarYUV420(
            np.asarray(self.y), np.asarray(self.u), np.asarray(self.v), self.depth
        )

    def tobytes(self) -> bytes:
        """Frame-interleaved planar bytes (Y,U,V per frame) — exactly what
        ffmpeg's rawvideo yuv420p/yuv420p10le demuxer consumes."""
        parts = []
        for t in range(len(self)):
            parts += [
                np.ascontiguousarray(self.y[t]).tobytes(),
                np.ascontiguousarray(self.u[t]).tobytes(),
                np.ascontiguousarray(self.v[t]).tobytes(),
            ]
        return b"".join(parts)


def _flatten(p: PlanarYUV420):
    return (p.y, p.u, p.v), p.depth


def _unflatten(depth, children):
    return PlanarYUV420(*children, depth=depth)


jax.tree_util.register_pytree_node(PlanarYUV420, _flatten, _unflatten)


def is_planar(x) -> bool:
    return isinstance(x, PlanarYUV420)


def yuv420_to_rgb01(frames: PlanarYUV420) -> jnp.ndarray:
    """Planar codes -> float32 RGB in [0,1], [T,H,W,3]. Chroma is
    bilinearly upsampled (half-pixel centers); matrix is BT.601 limited."""
    y0, yr, c0, cr = _ranges(frames.depth)
    t, h, w = frames.y.shape
    yp = (frames.y.astype(jnp.float32) - y0) / yr
    up = (frames.u.astype(jnp.float32) - c0) / cr
    vp = (frames.v.astype(jnp.float32) - c0) / cr
    up = jax.image.resize(up, (t, h, w), method="linear")
    vp = jax.image.resize(vp, (t, h, w), method="linear")
    r = yp + 1.402 * vp
    b = yp + 1.772 * up
    g = (yp - _KR * r - _KB * b) / _KG
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def rgb01_to_yuv420(rgb01: jnp.ndarray, depth: int = 8) -> PlanarYUV420:
    """float RGB [0,1] [T,H,W,3] -> planar codes. H and W must be even
    (the caller guarantees it — see Runner yuv gating). Chroma is the 2x2
    box mean of the per-pixel Pb/Pr (matrix first, then subsample — the
    two commute since both are linear)."""
    t, h, w, _ = rgb01.shape
    y0, yr, c0, cr = _ranges(depth)
    r, g, b = rgb01[..., 0], rgb01[..., 1], rgb01[..., 2]
    yp = _KR * r + _KG * g + _KB * b
    pb = (b - yp) / 1.772
    pr = (r - yp) / 1.402
    y = y0 + yr * yp
    u = c0 + cr * pb.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    v = c0 + cr * pr.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    hi = float((1 << depth) - 1)
    dt = _code_dtype(depth)
    return PlanarYUV420(
        jnp.clip(jnp.round(y), 0.0, hi).astype(dt),
        jnp.clip(jnp.round(u), 0.0, hi).astype(dt),
        jnp.clip(jnp.round(v), 0.0, hi).astype(dt),
        depth,
    )


# ------------------------- host-side (numpy) twins ------------------------- #


def yuv420_to_rgb01_np(frames: PlanarYUV420) -> np.ndarray:
    """Numpy twin of yuv420_to_rgb01 (nearest-equivalent bilinear), for the
    non-fused fallback path and for tests. Uses the same half-pixel-center
    bilinear chroma upsample."""
    y0, yr, c0, cr = _ranges(frames.depth)
    t, h, w = frames.y.shape
    yp = (np.asarray(frames.y, np.float32) - y0) / yr
    up = (np.asarray(frames.u, np.float32) - c0) / cr
    vp = (np.asarray(frames.v, np.float32) - c0) / cr
    up = _bilinear2x_np(up, h, w)
    vp = _bilinear2x_np(vp, h, w)
    r = yp + 1.402 * vp
    b = yp + 1.772 * up
    g = (yp - _KR * r - _KB * b) / _KG
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


def _bilinear2x_np(p: np.ndarray, h: int, w: int) -> np.ndarray:
    """2x bilinear upsample with half-pixel centers (matches
    jax.image.resize(method='linear') for an exact 2x factor)."""
    t, hh, ww = p.shape
    # output sample i maps to source coordinate (i + 0.5)/2 - 0.5
    yi = (np.arange(h, dtype=np.float32) + 0.5) / 2.0 - 0.5
    xi = (np.arange(w, dtype=np.float32) + 0.5) / 2.0 - 0.5
    y0i = np.clip(np.floor(yi).astype(np.int64), 0, hh - 1)
    x0i = np.clip(np.floor(xi).astype(np.int64), 0, ww - 1)
    y1i = np.clip(y0i + 1, 0, hh - 1)
    x1i = np.clip(x0i + 1, 0, ww - 1)
    fy = np.clip(yi - y0i, 0.0, 1.0)[None, :, None]
    fx = np.clip(xi - x0i, 0.0, 1.0)[None, None, :]
    a = p[:, y0i][:, :, x0i]
    b = p[:, y0i][:, :, x1i]
    c = p[:, y1i][:, :, x0i]
    d = p[:, y1i][:, :, x1i]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def rgb01_to_yuv420_np(rgb01: np.ndarray, depth: int = 8) -> PlanarYUV420:
    """Numpy twin of rgb01_to_yuv420 — reader-side conversion for tests
    and for synthesizing planar fixtures from RGB material."""
    t, h, w, _ = rgb01.shape
    y0, yr, c0, cr = _ranges(depth)
    r, g, b = rgb01[..., 0], rgb01[..., 1], rgb01[..., 2]
    yp = _KR * r + _KG * g + _KB * b
    pb = (b - yp) / 1.772
    pr = (r - yp) / 1.402
    y = y0 + yr * yp
    u = c0 + cr * pb.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    v = c0 + cr * pr.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    hi = float((1 << depth) - 1)
    dt = np.uint8 if depth == 8 else np.uint16
    return PlanarYUV420(
        np.clip(np.round(y), 0.0, hi).astype(dt),
        np.clip(np.round(u), 0.0, hi).astype(dt),
        np.clip(np.round(v), 0.0, hi).astype(dt),
        depth,
    )
