"""Rotary position embeddings (axial 3D), TPU-native.

Reproduces the numerics of the ``rotary_embedding_torch`` usage in the
reference (reference: src/models/dit_3b/rope.py, src/models/dit_7b/rope.py):

- 3B "mmrope3d": lang-style inverse-theta frequencies, joint video+text
  positions — video token (t,h,w) uses temporal position ``txt_len + t`` and
  text token i uses position ``i`` replicated across all three axes
  (reference: dit_3b/rope.py:154-176).
- 7B "pixel" rope: linspace(1, max_freq/2) * pi frequencies over positions
  linspace(-1, 1, n) per axis, applied per attention window
  (reference: dit_7b/rope.py:49-70, dit_7b/nablocks/mmsr_block.py:126-128).

Frequencies are computed statically (Python ints in, jnp arrays out) so
everything is constant-folded under jit. Rotation is applied in float32 —
the reference also upcasts (dit_3b/rope.py:118-126).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def rope_lang_freqs(num: int, theta: float = 10000.0) -> np.ndarray:
    """Per-axis lang-style frequency vector of length ``2*num``
    ([f0, f0, f1, f1, ...], matching rotary_embedding_torch's repeat)."""
    f = 1.0 / (theta ** (np.arange(0, 2 * num, 2, dtype=np.float64) / (2 * num)))
    return np.repeat(f, 2)


def rope_pixel_freqs(num: int, max_freq: float = 256.0) -> np.ndarray:
    """Per-axis pixel-style frequencies, length ``2*num``."""
    f = np.linspace(1.0, max_freq / 2.0, num, dtype=np.float64) * np.pi
    return np.repeat(f, 2)


@lru_cache(maxsize=64)
def axial_freqs_lang(
    dims: Tuple[int, ...],
    freq_dim: int,
    theta: float = 10000.0,
    offsets: Tuple[int, ...] = None,
) -> np.ndarray:
    """Axial angles for lang rope. ``freq_dim`` is the per-axis rotary dim
    (e.g. 42 for rope_dim=128 over 3 axes). Returns [*dims, len(dims)*freq_dim]
    float32. ``offsets`` shifts integer positions per axis."""
    n = len(dims)
    if offsets is None:
        offsets = (0,) * n
    per_axis = rope_lang_freqs(freq_dim // 2, theta)  # [freq_dim]
    parts = []
    for ax, d in enumerate(dims):
        pos = np.arange(d, dtype=np.float64) + offsets[ax]
        ang = np.einsum("p,f->pf", pos, per_axis)  # [d, freq_dim]
        shape = [1] * n + [freq_dim]
        shape[ax] = d
        parts.append(np.broadcast_to(ang.reshape(shape), tuple(dims) + (freq_dim,)))
    return np.concatenate(parts, axis=-1).astype(np.float32)


@lru_cache(maxsize=256)
def axial_freqs_pixel(
    dims: Tuple[int, ...], freq_dim: int, max_freq: float = 256.0
) -> np.ndarray:
    """Axial angles for pixel rope: positions linspace(-1, 1, d) per axis."""
    n = len(dims)
    per_axis = rope_pixel_freqs(freq_dim // 2, max_freq)
    parts = []
    for ax, d in enumerate(dims):
        pos = np.linspace(-1.0, 1.0, d) if d > 1 else np.array([-1.0])
        ang = np.einsum("p,f->pf", pos, per_axis)
        shape = [1] * n + [freq_dim]
        shape[ax] = d
        parts.append(np.broadcast_to(ang.reshape(shape), tuple(dims) + (freq_dim,)))
    return np.concatenate(parts, axis=-1).astype(np.float32)


def mmrope3d_freqs(
    vid_thw: Tuple[int, int, int], txt_len: int, rope_dim: int, theta: float = 10000.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Joint video/text angles for the 3B mmrope3d scheme.

    Per-axis rotary dim = rope_dim // 3 rounded down to even (rope_dim=128 ->
    42 dims/axis, 126 total; the last 2 head dims pass through).

    Video: axis positions (txt_len + t, h, w). Text: position i on all axes.
    Reference: dit_3b/rope.py:154-176.
    """
    t, h, w = vid_thw
    per = (rope_dim // 3) & ~1  # even per-axis dim: 42 for 128
    vid = axial_freqs_lang((t, h, w), per, theta, offsets=(txt_len, 0, 0))
    vid = vid.reshape(t * h * w, 3 * per)
    txt_axis = axial_freqs_lang((txt_len,), per, theta) if txt_len else np.zeros((0, per), np.float32)
    txt = np.tile(txt_axis.reshape(txt_len, per), (1, 3))
    return vid, txt


def window_pixel_freqs(win_thw: Tuple[int, int, int], rope_dim: int, max_freq: float = 256.0) -> np.ndarray:
    """Per-window pixel-rope angles for the 7B scheme: rope constructed with
    dim=head_dim//2 over 3 axes -> per-axis rotary dim = (head_dim//2)//3
    rounded to even (64 -> 20 dims/axis, 60 total; 68 pass through).
    Reference: dit_7b/rope.py:49-70."""
    t, h, w = win_thw
    per = (rope_dim // 3) & ~1
    f = axial_freqs_pixel((t, h, w), per, max_freq)
    return f.reshape(t * h * w, 3 * per)


def pad_angles(angles: np.ndarray, dim: int) -> np.ndarray:
    """Zero-pad per-position angle tables to the full head dim. A zero angle
    is an exact identity rotation (cos=1, sin=0), so full-width application
    equals the reference's rotate-first-R-dims semantics while avoiding the
    slice/concat the partial form costs on TPU (these showed up as ~5% of
    the DiT step in profiles)."""
    r = angles.shape[-1]
    if r == dim:
        return angles
    pad = [(0, 0)] * (angles.ndim - 1) + [(0, dim - r)]
    return np.pad(angles, pad)


def apply_rotary(x: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotate the leading ``angles.shape[-1]`` channels of ``x``.

    x: [..., L, D]; angles: broadcastable [..., L, R] with R <= D (R even).
    Pairs are interleaved GPT-J style: (x0, x1) -> (x0 c - x1 s, x1 c + x0 s).
    Computation in float32, result cast back to x.dtype. When R == D the
    slice/concat is skipped entirely (see pad_angles).
    """
    r = angles.shape[-1]
    dtype = x.dtype
    full = r == x.shape[-1]
    xf = (x if full else x[..., :r]).astype(jnp.float32)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    x2 = xf.reshape(xf.shape[:-1] + (r // 2, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    out = (xf * cos + rot * sin).astype(dtype)
    if full:
        return out
    return jnp.concatenate([out, x[..., r:]], axis=-1)
