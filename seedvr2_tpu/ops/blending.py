"""Temporal-overlap blending windows.

Reference: src/core/generation_utils.py:284-312 (Hann crossfade over the
middle third for overlap >= 3, linear otherwise) — used both for batch
overlap inside one process and for multi-chip frame-parallel seams.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def overlap_weights(overlap: int) -> np.ndarray:
    """Weight of the *previous* batch over the overlap region."""
    if overlap >= 3:
        t = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
        u = np.clip((t - 1.0 / 3.0) / (1.0 / 3.0), 0.0, 1.0)
        return (0.5 + 0.5 * np.cos(np.pi * u)).astype(np.float32)
    return np.linspace(1.0, 0.0, overlap, dtype=np.float32)


def blend_overlapping_frames(
    prev_tail: jnp.ndarray, cur_head: jnp.ndarray, overlap: int
) -> jnp.ndarray:
    """prev_tail/cur_head: [overlap, H, W, C]."""
    w_prev = jnp.asarray(overlap_weights(overlap)).reshape(overlap, 1, 1, 1).astype(prev_tail.dtype)
    return prev_tail * w_prev + cur_head * (1.0 - w_prev)
