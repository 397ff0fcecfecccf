"""Folded MAGViT upsample: expansion + depth-to-space + 3x3x3 conv as ONE
low-resolution convolution.

The reference decoder upsamples by a learned 1x1x1 expansion (C -> ratio*C),
depth-to-space, then a 3x3x3 causal conv at the DOUBLED resolution
(reference: attn_video_vae.py:91-174 Upsample3D + the up-block conv). Both
steps are linear, so their composition is a single linear map from the
low-res activations to the high-res conv output. Because a 2x axis maps any
3 consecutive high-res taps onto only 2 distinct low-res pixels, the folded
kernel has 2 taps per upsampled axis:

    naive  (per low-res px): expansion 8C^2 + conv 8px * 27 taps * C^2 = 224 C^2 MACs
    folded (per low-res px): 8 phases * (2*2*2 taps) * C^2          =  64 C^2 MACs

i.e. 3.5x fewer FLOPs for the spatiotemporal (tz=2) upsamples and 2.33x
(4C^2 + 108C^2 vs 4 * 3*2*2 * C^2 = 48C^2) for the spatial-only one — on
the ops that dominate the decode body (the up1/up2 upsample convs run at
doubled resolution and are ~40 of the 138 TFLOP of a 1088x1024 decode tile,
docs/PERFORMANCE.md round-4 stage profile). The folded conv also never
materializes the high-res pre-conv tensor (~2.8 GB at the up2 tile).

On TPU the conv + phase interleave run in one Pallas kernel
(ops/fold_upsample_kernel.py) — XLA's lowering of the same conv
materializes the full fp32 phase tensor and runs at ~50 TFLOP/s
(scripts/fold_stage_probe.py). Off-TPU a pure-XLA form (ones-channel for
the bias, offset-sliced interleave) keeps numerics identical for tests.

Exactness:

- Weight fold: K[cell] = sum over original taps landing on that low-res
  cell of E_phase @ W_tap, computed in fp32. Equal to the naive path up to
  float reassociation.
- Spatial zero padding: a padded high-res tap contributes ZERO, not
  b_phase; the expansion-bias table ``btab`` is therefore added under the
  same per-tap boundary masks (Pallas) or rides a zero-padded ones channel
  (XLA form).
- Causal head (tz=2): the first temporal slice replicates high-res frame 0
  twice and drops the duplicated frame 1 (_remove_head, reference:
  causal_inflation_lib.py:412-437), which breaks the pure phase pattern for
  output frames 0..2 only; those three frames get their own tiny folded
  kernels (_T_MAP_S0/_T_MAP_S12). Streaming slices are phase-pure with a
  ONE low-res frame carry (the naive path carries the same information as
  2 high-res frames).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import VAEConfig
from .causal_conv import StreamCtx

# Per-axis tap mapping for a 2x-upsampled dim, high-res output row 2i+u,
# kernel tap kh in {0,1,2}, after the offset alignment (low input padded
# (1,1), low kernel 2, phase u reads conv output positions [u : H+u]):
#   u=0: rows 2i-1,2i,2i+1 -> x[i-1]@ph1, x[i]@ph0, x[i]@ph1
#   u=1: rows 2i,2i+1,2i+2 -> x[i]@ph0,  x[i]@ph1, x[i+1]@ph0
# entries: kh -> (low tap d, source phase)
_S_MAP = {0: ((0, 1), (1, 0), (1, 1)), 1: ((0, 0), (0, 1), (1, 0))}

# Temporal mapping for tz=2 phase-pure PAIRS (window = two consecutive low
# frames (first, second)); pair element a produces high-res frames
# (2j, 2j+1) in streaming alignment / (2j+1, 2j+2) in first-slice alignment
# — same kernel, different window source (see upsample_folded):
#   a=0: W0@(first,z0) + W1@(first,z1) + W2@(second,z0)
#   a=1: W0@(first,z1) + W1@(second,z0) + W2@(second,z1)
_T_MAP_PAIR = {0: ((0, 0), (0, 1), (1, 0)), 1: ((0, 1), (1, 0), (1, 1))}

# First-slice specials (head = [f0, f0] prepended to [f0, f2, f3, ...]
# after _remove_head; f_{2t+p} = phase (t, p)):
#   out[0] = (W0+W1+W2) f0                      <- x[0] @ z0 only
#   out[1] = (W0+W1) f0 + W2 f2                 <- x[0]@z0, x[1]@z0
#   out[2] = W0 f0 + W1 f2 + W2 f3              <- x[0]@z0, x[1]@z0, x[1]@z1
_T_MAP_S0 = {0: ((0, 0), (0, 0), (0, 0))}
_T_MAP_S12 = {0: ((0, 0), (0, 0), (1, 0)), 1: ((0, 0), (1, 0), (1, 1))}

# tz=1: the temporal axis is not upsampled — taps stay 3, causal.
_T_MAP_TZ1 = {0: ((0, 0), (1, 0), (2, 0))}


def _fold_core(W, E, be, tz: int, tmap: Dict, kt_low: int):
    """Fold weights in fp32.

    W: [3,3,3,C,C] conv weights; E: [C, ratio*C] expansion; be: [ratio*C]
    expansion bias. Returns (K [kt_low,2,2,C,A*4*C], btab [2,2,A*4*C]) with
    output channel layout block ((a*2+u)*2+v)*C + c (A = len(tmap)); btab
    is summed over the temporal tap (temporal taps never read padding —
    input is carry-extended/valid) and masked spatially by the consumer.
    """
    C = W.shape[-1]
    A = len(tmap)
    Wf = W.astype(jnp.float32)
    Ef = E.astype(jnp.float32)
    bf = be.astype(jnp.float32)
    cols = []
    bcols = []
    for a in range(A):
        for u in (0, 1):
            for v in (0, 1):
                cell: Dict[Tuple[int, int, int], list] = {}
                for kt in range(3):
                    dt, zp = tmap[a][kt]
                    for kh in range(3):
                        dh, hp = _S_MAP[u][kh]
                        for kw in range(3):
                            dw, wp = _S_MAP[v][kw]
                            blk = (hp * 2 + wp) * tz + (zp if tz == 2 else 0)
                            cell.setdefault((dt, dh, dw), []).append((blk, (kt, kh, kw)))
                col = []
                bcol = {}
                for dt in range(kt_low):
                    for dh in (0, 1):
                        for dw in (0, 1):
                            terms = cell.get((dt, dh, dw), ())
                            if terms:
                                acc = None
                                bacc = None
                                for blk, tap in terms:
                                    Eb = Ef[:, blk * C : (blk + 1) * C]
                                    bb = bf[blk * C : (blk + 1) * C]
                                    m = Eb @ Wf[tap]
                                    bm = bb @ Wf[tap]
                                    acc = m if acc is None else acc + m
                                    bacc = bm if bacc is None else bacc + bm
                                col.append(acc)
                                prev = bcol.get((dh, dw))
                                bcol[(dh, dw)] = bacc if prev is None else prev + bacc
                            else:
                                col.append(jnp.zeros((C, C), jnp.float32))
                cols.append(jnp.stack(col).reshape(kt_low, 2, 2, C, C))
                bcols.append(
                    jnp.stack(
                        [
                            bcol.get((dh, dw), jnp.zeros((C,), jnp.float32))
                            for dh in (0, 1)
                            for dw in (0, 1)
                        ]
                    ).reshape(2, 2, C)
                )
    K = jnp.concatenate(cols, axis=-1)  # [kt,2,2,C, A*4*C]
    btab = jnp.concatenate(bcols, axis=-1)  # [2,2, A*4*C]
    return K, btab


def _fold_kernel(W, E, be, tz: int, tmap: Dict, kt_low: int, dtype):
    """Augmented form for the XLA path: bias rides a ones channel
    ([kt,2,2,C+1,P]; the ones channel zero-pads with the input, killing
    bias contributions of out-of-image taps exactly like the high-res
    conv's zero padding)."""
    K, btab = _fold_core(W, E, be, tz, tmap, kt_low)
    P = K.shape[-1]
    C = K.shape[3]
    aug = jnp.zeros((kt_low, 2, 2, C + 1, P), jnp.float32)
    aug = aug.at[:, :, :, :C, :].set(K)
    aug = aug.at[0, :, :, C, :].set(btab)
    return aug.astype(dtype)


def _phase_conv(xa: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Valid temporal conv, spatially padded (1,1) with kernel 2 so both
    output phases' windows exist: [B,T,H,W,C+1] -> [B,T-kt+1,H+1,W+1,P]."""
    return jax.lax.conv_general_dilated(
        xa,
        K,
        window_strides=(1, 1, 1),
        padding=[(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(xa.dtype)


def _interleave(y: jnp.ndarray, A: int, C: int) -> jnp.ndarray:
    """[B,Tp,H+1,W+1,A*4*C] -> [B,Tp*A,2H,2W,C] picking each spatial
    phase's window offset (phase u/v=1 is shifted one low-res px)."""
    B, Tp, H1, W1, _ = y.shape
    H, W = H1 - 1, W1 - 1
    y = y.reshape(B, Tp, H1, W1, A, 2, 2, C)
    p00 = y[:, :, :H, :W, :, 0, 0]
    p01 = y[:, :, :H, 1:, :, 0, 1]
    p10 = y[:, :, 1:, :W, :, 1, 0]
    p11 = y[:, :, 1:, 1:, :, 1, 1]
    row0 = jnp.stack([p00, p01], axis=5)  # [B,Tp,H,W,A,2v,C]
    row1 = jnp.stack([p10, p11], axis=5)
    grid = jnp.stack([row0, row1], axis=4)  # [B,Tp,H,W,2u,A,2v,C]
    grid = grid.transpose(0, 1, 5, 2, 4, 3, 6, 7)  # B,Tp,A,H,u,W,v,C
    return grid.reshape(B, Tp * A, 2 * H, 2 * W, C)


def _augment(x: jnp.ndarray) -> jnp.ndarray:
    B, T, H, W, _ = x.shape
    return jnp.concatenate([x, jnp.ones((B, T, H, W, 1), x.dtype)], axis=-1)


def _use_pallas(C: int) -> bool:
    return jax.default_backend() == "tpu" and C % 128 == 0


def _run(x_ext, W3, E, be, tz, tmap, kt_low, A):
    """One folded conv on temporally pre-extended input -> interleaved
    high-res frames [B, Tp*A, 2H, 2W, C]."""
    C = x_ext.shape[-1]
    if _use_pallas(C):
        from ...ops.fold_upsample_kernel import fold_upsample_conv

        K, btab = _fold_core(W3, E, be, tz, tmap, kt_low)
        return fold_upsample_conv(
            x_ext, K, btab, jnp.zeros((C,), jnp.float32), A
        )
    Kaug = _fold_kernel(W3, E, be, tz, tmap, kt_low, x_ext.dtype)
    return _interleave(_phase_conv(_augment(x_ext), Kaug), A, C)


def upsample_folded(
    p: Dict,
    cfg: VAEConfig,
    x: jnp.ndarray,
    ctx: StreamCtx,
    name: str,
    temporal_up: bool,
) -> jnp.ndarray:
    """Drop-in replacement for model._upsample with identical semantics
    (up to fp32 fold reassociation). Streaming carry is the RAW low-res
    input tail under leaf ``mem_lo`` (1 frame for tz=2, 2 for tz=1) —
    strictly less HBM than the naive path's high-res carry."""
    B, T, H, W, C = x.shape
    W3 = p["conv"]["w"]
    E = p["upscale"]["w"][0, 0, 0]
    be = p["upscale"]["b"]
    bc = p["conv"].get("b")
    with ctx.scope(name):
        if temporal_up:
            if ctx.mode == "active":
                carry = ctx.get("mem_lo").astype(x.dtype)
                xin = jnp.concatenate([carry, x], axis=1)
                out = _run(xin, W3, E, be, 2, _T_MAP_PAIR, 2, 2)  # 2T frames
            else:
                parts = [_run(x[:, :1], W3, E, be, 2, _T_MAP_S0, 1, 1)]
                if T >= 2:
                    parts.append(_run(x[:, :2], W3, E, be, 2, _T_MAP_S12, 2, 2))
                if T >= 3:
                    # pair windows (x[j], x[j+1]) for j>=1 -> frames 3..2T-2
                    parts.append(_run(x[:, 1:], W3, E, be, 2, _T_MAP_PAIR, 2, 2))
                out = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            if ctx.mode != "disabled":
                ctx.put("mem_lo", x[:, -1:])
        else:
            if ctx.mode == "active":
                carry = ctx.get("mem_lo").astype(x.dtype)
            else:
                carry = jnp.repeat(x[:, :1], 2, axis=1)  # replicate-first head
            if ctx.mode != "disabled":
                ctx.put("mem_lo", x[:, -2:])
            xin = jnp.concatenate([carry, x], axis=1)
            out = _run(xin, W3, E, be, 1, _T_MAP_TZ1, 3, 1)
        if bc is not None:
            out = out + bc.astype(out.dtype)
        return out
