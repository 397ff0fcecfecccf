"""Fused Pallas attention kernel for windowed SeedVR2 attention.

Replaces the reference's external flash-attn/SageAttention CUDA kernels
(reference: src/optimization/compatibility.py:286-545,
src/models/dit_3b/attention.py:80-148). Design point: after 720p window
normalization every window is <= ~405 video tokens + text, so S is a few
hundred — the whole (q, k, v, logits) working set of one (batch, head)
program fits in VMEM. A single-block kernel with fp32 softmax is then both
simpler and faster than an online-softmax streaming loop: no rescaling
passes, one MXU matmul pair per program.

Padding rows (window ragged tails) are masked via the key-validity mask;
query padding rows still produce finite output because text keys are always
valid (window sequences end with text tokens).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    S, D = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0]  # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0]  # [1, S] bool (broadcast over queries)
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    s = jnp.where(mask, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)  # all-masked row safety
    p = (e / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_attention_padded(q, k, v, kv_valid, interpret=False):
    """Mosaic requires the last two block dims to be (8k, 128k)-aligned, so
    heads are hoisted to a leading program dimension ([B,S,H,D] ->
    [B*H,S,D]); the transposes are bandwidth-trivial next to the attention
    matmuls."""
    B, S, H, D = q.shape
    scale = 1.0 / float(np.sqrt(D))
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    mask = jnp.broadcast_to(kv_valid[:, None, None, :], (B, H, 1, S)).reshape(B * H, 1, S)

    spec = pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=4 * B * H * S * D * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
    )(qt, kt, vt, mask)
    return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def flash_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,  # [B, S] bool
    q_valid: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    B, S, H, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kv_valid is None:
        kv_valid = jnp.ones((B, S), bool)
    # pad S to a lane-friendly multiple; padded keys are masked invalid
    Sp = max(_round_up(S, 128), 128)
    if Sp != S:
        pad = [(0, 0), (0, Sp - S), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_valid = jnp.pad(kv_valid, [(0, 0), (0, Sp - S)])
    out = _flash_attention_padded(q, k, v, kv_valid, interpret=interpret)
    out = out[:, :S]
    if q_valid is not None:
        out = out * q_valid[:, :, None, None].astype(out.dtype)
    return out
