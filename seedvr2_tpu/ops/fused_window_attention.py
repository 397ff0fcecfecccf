"""Fused window attention: QK rms-norm + RoPE + per-window text append +
softmax in one Pallas kernel, head-major end to end.

Motivation (profile in docs/PERFORMANCE.md): the XLA attention path spends
~40% of the DiT step on layout copies, mask padding and rope slicing. This
kernel takes q/k/v in the head-major layout the projections can emit for
free ([B, H, nW, S, D] — layout changes ride the GEMM output layout), and
performs in VMEM per (batch, window, head) program:

    q/k <- rms_norm(q/k) * w           (fp32 stats; reference qk_norm,
                                        dit_3b/nablocks/attention/mmattn.py)
    q/k <- rotate(q/k, cos, sin)       (fp32, zero-padded angles)
    K   <- [k ; txt_k],  V <- [v ; txt_v]
    out <- softmax(q K^T * scale + mask) V

Folding the qk-norm here (round 3) removes a full materialization of the
normalized qkv tensor per layer (the former jnp.stack) plus two separate
norm passes — ~600MB of HBM round-trips per 7B layer.

Grid order is (B, nW, H) with heads innermost: the per-window rope angle
tables ([nW, S, D] fp32 cos+sin — the largest kernel input after qkv) keep
the same block index across all H inner steps, so Pallas fetches them once
per window instead of once per (head, window) — at 7B geometry that saves
~500MB of angle re-reads per layer.

Text tokens attend inside every window exactly like the reference's
repeat-concat (dit_3b/nablocks/attention/mmattn.py:190-257); their
per-window outputs are returned separately for mean-coalescing outside.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rotate(x, cos, sin):
    """GPT-J pairwise rotation without (S, D/2, 2) reshapes (Mosaic cannot
    lower that layout cast): rotate_half via lane rolls —
    rot[2i] = -x[2i+1], rot[2i+1] = x[2i]."""
    xf = x.astype(jnp.float32)
    D = xf.shape[-1]
    left = pltpu.roll(xf, D - 1, axis=1)  # x[d+1] (circular)
    right = pltpu.roll(xf, 1, axis=1)  # x[d-1]
    even = (jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1) % 2) == 0
    rot = jnp.where(even, -left, right)
    return xf * cos + rot * sin


def _kernel(
    vq_ref, vk_ref, vv_ref,  # [1, 1, 1, S, D]
    tq_ref, tk_ref, tv_ref,  # [1, 1, Lt, D]
    cos_ref, sin_ref,  # [1, S, D] fp32
    tcos_ref, tsin_ref,  # [1, Lt, D] fp32 (zeros when txt rope disabled)
    mask_ref,  # [1, 1, S] bool (vid slot validity)
    norm_ref,  # [4, D] fp32: rows nq_vid, nk_vid, nq_txt, nk_txt
    ovid_ref,  # [1, 1, 1, S, D]
    otxt_ref,  # [1, 1, 1, Lt, D]
    *,
    scale: float,
    rope_txt: bool,
    qk_norm: bool,
    eps: float,
    quant_qk: bool = False,
):
    S, D = vq_ref.shape[3], vq_ref.shape[4]
    Lt = tq_ref.shape[2]
    dt = vq_ref.dtype

    def norm(x, row):
        """rms_norm over the head dim, fp32 stats, cast back to the compute
        dtype — op-for-op the outside rms_norm (ops/normalization.py:17-24)
        so folding it here is numerically identical."""
        if not qk_norm:
            return x
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * jnp.reciprocal(jnp.sqrt(var + eps)) * norm_ref[row][None, :]
        return out.astype(dt)

    cos = cos_ref[0]
    sin = sin_ref[0]
    vq = _rotate(norm(vq_ref[0, 0, 0], 0), cos, sin).astype(dt)
    vk = _rotate(norm(vk_ref[0, 0, 0], 1), cos, sin).astype(dt)
    tq = norm(tq_ref[0, 0], 2)
    tk = norm(tk_ref[0, 0], 3)
    if rope_txt:
        tq = _rotate(tq, tcos_ref[0], tsin_ref[0]).astype(dt)
        tk = _rotate(tk, tcos_ref[0], tsin_ref[0]).astype(dt)
    vv = vv_ref[0, 0, 0]
    tv = tv_ref[0, 0]
    valid = mask_ref[0, 0][None, :]  # [1, S] vid-slot validity

    def _quant(x):  # per-token symmetric int8 (SageAttention's q/k scheme)
        xf = x.astype(jnp.float32)
        s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) * (1.0 / 127.0) + 1e-8
        return jnp.round(xf / s).astype(jnp.int8), s

    def qk(a, b):  # [Ma, D] x [Mb, D] -> [Ma, Mb] fp32
        if quant_qk:
            a8, sa = _quant(a)
            b8, sb = _quant(b)
            s32 = jax.lax.dot_general(
                a8, b8, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return s32.astype(jnp.float32) * (sa * scale) * sb[:, 0][None, :]
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    def pv(p, val):  # [M, K] fp32 x [K, D] -> [M, D] fp32
        return jax.lax.dot_general(
            p.astype(dt), val, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def attend(q):  # blockwise softmax over [vid keys | txt keys]
        s_v = jnp.where(valid, qk(q, vk), -1e30)
        s_t = qk(q, tk)
        m = jnp.maximum(
            jnp.max(s_v, axis=-1, keepdims=True), jnp.max(s_t, axis=-1, keepdims=True)
        )
        e_v = jnp.exp(s_v - m)
        e_t = jnp.exp(s_t - m)
        den = jnp.sum(e_v, axis=-1, keepdims=True) + jnp.sum(e_t, axis=-1, keepdims=True)
        den = jnp.where(den == 0.0, 1.0, den)
        inv = 1.0 / den
        return (pv(e_v * inv, vv) + pv(e_t * inv, tv)).astype(dt)

    ovid_ref[0, 0, 0] = attend(vq)
    otxt_ref[0, 0, 0] = attend(tq)


@functools.partial(
    jax.jit, static_argnames=("rope_txt", "qk_norm", "eps", "interpret", "quant_qk")
)
def fused_window_attention(
    vid_qkv: jnp.ndarray,  # [B, 3, H, nW, S, D] (windowed, head-major)
    txt_qkv: jnp.ndarray,  # [B, 3, H, Lt, D]
    vid_angles: jnp.ndarray,  # [nW, S, D] fp32 (zero-padded to D)
    txt_angles: jnp.ndarray,  # [Lt, D] fp32 (zeros if not rope_txt)
    valid: jnp.ndarray,  # [nW, S] bool
    rope_txt: bool,
    norms: Optional[jnp.ndarray] = None,  # [4, D] fp32 qk-norm weights
    qk_norm: bool = False,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
    quant_qk: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (vid_out [B, H, nW, S, D], txt_out [B, H, nW, Lt, D]).

    ``quant_qk``: per-token int8 q/k with fp32 scale outer product on the
    logits — the reference's SageAttention tier (compatibility.py:387-545);
    rope/norm/softmax/PV stay fp32/bf16."""
    B, _, H, nW, S, D = vid_qkv.shape
    Lt = txt_qkv.shape[3]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = 1.0 / float(np.sqrt(D))
    if norms is None:
        norms = jnp.ones((4, D), jnp.float32)

    cos = jnp.cos(vid_angles)
    sin = jnp.sin(vid_angles)
    tcos = jnp.cos(txt_angles)[None]
    tsin = jnp.sin(txt_angles)[None]
    mask = valid[:, None, :]  # [nW, 1, S]

    vq, vk, vv = vid_qkv[:, 0], vid_qkv[:, 1], vid_qkv[:, 2]  # [B,H,nW,S,D]
    tq, tk, tv = txt_qkv[:, 0], txt_qkv[:, 1], txt_qkv[:, 2]  # [B,H,Lt,D]

    # Grid (B, nW, H): heads innermost so the [1,S,D] angle/mask blocks keep
    # the same index across H consecutive steps and are not re-fetched.
    vspec = pl.BlockSpec((1, 1, 1, S, D), lambda b, w, h: (b, h, w, 0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 1, Lt, D), lambda b, w, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, S, D), lambda b, w, h: (w, 0, 0), memory_space=pltpu.VMEM)
    taspec = pl.BlockSpec((1, Lt, D), lambda b, w, h: (0, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, S), lambda b, w, h: (w, 0, 0), memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((4, D), lambda b, w, h: (0, 0), memory_space=pltpu.VMEM)

    ovid, otxt = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, rope_txt=rope_txt, qk_norm=qk_norm, eps=eps,
            quant_qk=quant_qk,
        ),
        grid=(B, nW, H),
        in_specs=[vspec, vspec, vspec, tspec, tspec, tspec, aspec, aspec, taspec, taspec, mspec, nspec],
        out_specs=(
            pl.BlockSpec((1, 1, 1, S, D), lambda b, w, h: (b, h, w, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Lt, D), lambda b, w, h: (b, h, w, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, nW, S, D), vid_qkv.dtype),
            jax.ShapeDtypeStruct((B, H, nW, Lt, D), vid_qkv.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * nW * (S + Lt) * (S + Lt) * D,
            bytes_accessed=2 * B * H * nW * (S + Lt) * D * 4,
            transcendentals=B * H * nW * (S + Lt) * (S + Lt),
        ),
    )(vq, vk, vv, tq, tk, tv, cos, sin, tcos, tsin, mask, norms)
    return ovid, otxt


def fused_window_attention_sharded(
    vid_qkv: jnp.ndarray,  # [B, 3, H, nW, S, D]
    txt_qkv: jnp.ndarray,  # [B, 3, H, Lt, D]
    vid_angles: jnp.ndarray,  # [nW, S, D]
    txt_angles: jnp.ndarray,  # [Lt, D]
    valid: jnp.ndarray,  # [nW, S]
    rope_txt: bool,
    mesh: jax.sharding.Mesh,
    norms: Optional[jnp.ndarray] = None,
    qk_norm: bool = False,
    eps: float = 1e-5,
    seq: bool = True,
    tensor: bool = True,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused kernel under seq/tensor sharding via shard_map.

    Windows are independent, so the window axis shards over "seq" and the
    head axis over "tensor" with NO collectives inside — each device runs
    the kernel on its local (nW/seq, H/tensor) shard (the reference instead
    runs flash-attn after hand-written all-to-alls, distributed/ops.py:
    188-229). The batch axis rides "data". Windows are padded to a multiple
    of the seq axis with all-invalid windows; callers must slice outputs
    back to the true window count before the text mean-coalesce.

    Returns (vid_out [B, H, nW_pad, S, D], txt_out [B, H, nW_pad, Lt, D],
    where nW_pad = ceil(nW / seq_size) * seq_size).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS_DATA, AXIS_SEQ, AXIS_TENSOR

    B, _, H, nW, S, D = vid_qkv.shape
    ns = mesh.shape[AXIS_SEQ] if seq else 1
    nt = mesh.shape[AXIS_TENSOR] if tensor else 1
    nd = mesh.shape[AXIS_DATA]
    if norms is None:
        norms = jnp.ones((4, D), jnp.float32)
    if H % nt != 0 or B % nd != 0:
        # heads/batch don't split cleanly -> single-program fallback
        return fused_window_attention(
            vid_qkv, txt_qkv, vid_angles, txt_angles, valid, rope_txt,
            norms, qk_norm, eps, interpret,
        )

    pad_w = (-nW) % ns
    if pad_w:
        vid_qkv = jnp.pad(vid_qkv, ((0, 0), (0, 0), (0, 0), (0, pad_w), (0, 0), (0, 0)))
        vid_angles = jnp.pad(vid_angles, ((0, pad_w), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, pad_w), (0, 0)))  # padded windows: all-invalid

    s_ax = AXIS_SEQ if seq else None
    t_ax = AXIS_TENSOR if tensor else None
    in_specs = (
        P(AXIS_DATA, None, t_ax, s_ax, None, None),  # vid_qkv
        P(AXIS_DATA, None, t_ax, None, None),  # txt_qkv
        P(s_ax, None, None),  # vid_angles
        P(None, None),  # txt_angles (replicated)
        P(s_ax, None),  # valid
        P(None, None),  # norms (replicated)
    )
    out_specs = (
        P(AXIS_DATA, t_ax, s_ax, None, None),  # ovid
        P(AXIS_DATA, t_ax, s_ax, None, None),  # otxt
    )

    def local(vqkv, tqkv, vang, tang, vld, nrm):
        return fused_window_attention(
            vqkv, tqkv, vang, tang, vld, rope_txt, nrm, qk_norm, eps, interpret
        )

    f = jax.shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)
    return f(vid_qkv, txt_qkv, vid_angles, txt_angles, valid, norms)
