"""Normalization primitives with float32 statistics.

The reference uses "fused" RMS/LayerNorm shims computing stats in the input
dtype (reference: src/models/dit_3b/normalization.py:70-109) and GroupNorm
for the VAE. On TPU we always accumulate statistics in float32 and cast back;
XLA fuses these into neighbouring ops, so no hand-written kernel is needed
for the norm itself.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray], eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over channels-last input [..., C]. Statistics are taken over
    all non-batch spatial dims and the channels within each group, matching
    torch.nn.GroupNorm on NC... layout (reference VAE uses GroupNorm(32)
    per-frame-batch; here the leading axis is batch).
    """
    dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = out.reshape(x.shape)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
