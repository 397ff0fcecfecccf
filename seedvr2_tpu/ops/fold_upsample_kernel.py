"""Pallas kernel for the folded MAGViT upsample (transposed-conv form).

models/vae/folded_upsample.py turns [expansion -> depth-to-space -> 3x3x3
conv] into one low-resolution conv with 2 taps per upsampled axis and
phase-grouped outputs (3.5x fewer FLOPs than the naive form). XLA's
lowering of that conv materializes the full fp32 phase tensor
([T,H+1,W+1,8C] — 5.7GB at the up2 decode tile) and runs at ~50 TFLOP/s,
with another full relayout pass for the phase interleave
(scripts/fold_stage_probe.py). This kernel does both steps in VMEM:

- grid (a, Tp, Hb, Wb): per block, 8 shifted [M,C]@[C,C] MXU matmuls per
  spatial phase accumulate in fp32 (one temporal phase ``a`` per grid
  step so the [kt,2,2,C,4C] weight slice stays resident in VMEM);
- the 2x2 spatial phases are interleaved IN VMEM and written as one
  [2*th, 2*tw, C] block of the final high-res tensor — the phase tensor
  never exists in HBM;
- spatial zero-padding semantics ride per-tap boundary masks; the
  expansion bias (which a padded tap must NOT contribute) is added via
  the same masks from a per-cell table (see folded_upsample fold).

Input is temporally pre-extended by the caller (streaming carry or
replicate-head), so temporal taps never touch padding — exactly like
ops/conv3d_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    x_ref,  # [kt, th+2, tw+8, C] halo'd low-res slab (Element-blocked)
    k_ref,  # [kt, 2, 2, C, 4*C] folded weights for temporal phase a
    bt_ref,  # [2, 2, 4*C] fp32 expansion-bias table (masked per tap)
    bc_ref,  # [1, C] fp32 conv bias (unconditional)
    o_ref,  # [1, 2*th, 2*tw, C] high-res output block
    *,
    kt: int,
    th: int,
    tw: int,
    c: int,
    H: int,
    W: int,
):
    h = pl.program_id(2)
    w_ = pl.program_id(3)
    M = th * tw

    # Boundary masks built directly at [M, 1] (a bool (th,tw)->(M,1)
    # reshape is an unsupported Mosaic shape cast): tap (u+dh) at local
    # row r reads global low row h*th + r - 1 + (u+dh); out of [0, H)
    # means the high-res conv read zero padding there.
    im = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    lr = im // tw
    lc = im % tw
    rm = []
    cm = []
    for k in range(3):
        gr = h * th + lr - 1 + k
        gc = w_ * tw + lc - 1 + k
        rm.append((gr >= 0) & (gr < H))
        cm.append((gc >= 0) & (gc < W))

    for u in (0, 1):
        for v in (0, 1):
            ph = u * 2 + v
            acc = jnp.zeros((M, c), jnp.float32)
            for dt in range(kt):
                for dh in (0, 1):
                    for dw in (0, 1):
                        xs = x_ref[
                            dt, u + dh : u + dh + th, v + dw : v + dw + tw, :
                        ].reshape(M, c)
                        acc += jax.lax.dot_general(
                            xs,
                            k_ref[dt, dh, dw, :, ph * c : (ph + 1) * c],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
            for dh in (0, 1):
                for dw in (0, 1):
                    m2 = rm[u + dh] & cm[v + dw]
                    acc += jnp.where(
                        m2, bt_ref[dh, dw, ph * c : (ph + 1) * c][None, :], 0.0
                    )
            acc = (acc + bc_ref[0][None, :]).reshape(th, tw, c)
            # Direct sub-ref store: the output block is [1, th, 2, tw, 2C]
            # — row-major-identical to the interleaved [2th, 2tw, C] high-res
            # tile (channel order (v, c) == interleaved columns; interior
            # dim u == interleaved rows). No concat/stack/transpose in VMEM
            # (all are unsupported Mosaic shape casts across the phase dims).
            o_ref[0, :, u, :, v * c : (v + 1) * c] = acc.astype(o_ref.dtype)


def _tile_for(c: int) -> Tuple[int, int]:
    """(th, tw): M = th*tw >= 1024 keeps the MXU busy; slab+acc+out blocks
    stay well under VMEM with the [kt,2,2,C,4C] weight slice resident."""
    if c <= 128:
        return 16, 256
    if c <= 256:
        return 16, 128
    return 8, 128


def fold_upsample_conv(
    x_ext: jnp.ndarray,  # [B, Tp+kt-1, H, W, C] temporally pre-extended
    K: jnp.ndarray,  # [kt, 2, 2, C, A*4*C] folded weights (A temporal phases)
    btab: jnp.ndarray,  # [2, 2, A*4*C] fp32 expansion-bias table
    bc: jnp.ndarray,  # [C] conv bias
    A: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Returns [B, Tp*A, 2H, 2W, C]: the folded upsample conv with phases
    interleaved, valid in time (Tp = x_ext.shape[1] - kt + 1)."""
    B, Text, H, W, C = x_ext.shape
    kt = K.shape[0]
    Tp = Text - kt + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    th, tw = _tile_for(C)
    th = min(th, _round_up(H, 8))
    tw = min(tw, _round_up(W, 128))
    Hp = _round_up(H, th)
    Wp = _round_up(W, tw)

    # halo: 1 low side; W high side padded to +7 so the block's
    # second-to-last dim (tw+8) stays sublane-aligned (Mosaic requires %8).
    xp = jnp.pad(x_ext, ((0, 0), (0, 0), (1, Hp - H + 1), (1, Wp - W + 7), (0, 0)))
    Kk = K.astype(x_ext.dtype)  # [kt,2,2,C, A*4C]
    btf = btab.astype(jnp.float32)  # [2,2, A*4C]
    bcf = bc.astype(jnp.float32).reshape(1, C)

    grid = (A, Tp, Hp // th, Wp // tw)
    kern = functools.partial(_kernel, kt=kt, th=th, tw=tw, c=C, H=H, W=W)

    x_spec = pl.BlockSpec(
        (Element(kt), Element(th + 2), Element(tw + 8), Element(C)),
        lambda a, t, h, w_: (t, h * th, w_ * tw, 0),
        memory_space=pltpu.VMEM,
    )
    # per temporal phase: the a-th 4C-wide block of the last dim
    k_spec = pl.BlockSpec(
        (kt, 2, 2, C, 4 * C),
        lambda a, t, h, w_: (0, 0, 0, 0, a),
        memory_space=pltpu.VMEM,
    )
    bt_spec = pl.BlockSpec(
        (2, 2, 4 * C), lambda a, t, h, w_: (0, 0, a), memory_space=pltpu.VMEM
    )
    bc_spec = pl.BlockSpec((1, C), lambda a, t, h, w_: (0, 0), memory_space=pltpu.VMEM)

    def run_one(xb):
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_spec, k_spec, bt_spec, bc_spec],
            out_specs=pl.BlockSpec(
                (1, th, 2, tw, 2 * C),
                lambda a, t, h, w_: (t * A + a, h, 0, w_, 0),
                memory_space=pltpu.VMEM,
            ),
            # row-major-identical to [Tp*A, 2Hp, 2Wp, C] (see _kernel note)
            out_shape=jax.ShapeDtypeStruct((Tp * A, Hp, 2, Wp, 2 * C), x_ext.dtype),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel", "parallel", "parallel"),
                # the [kt,2,2,C,4C] weight block alone is 16.8MB at C=512 —
                # over the 16MB default scoped-vmem limit; the full working
                # set (weights + double-buffered slab/out + fp32 acc) is
                # ~45MB of the chip's 128MB VMEM.
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 8 * kt // 2 * A * Tp * Hp * Wp * C * 4 * C,
                bytes_accessed=2 * Tp * (A * Hp * Wp * 4 * C + Hp * Wp * C),
                transcendentals=0,
            ),
        )(xb, Kk, btf, bcf)
        return out.reshape(Tp * A, 2 * Hp, 2 * Wp, C)

    outs = [run_one(xp[i]) for i in range(B)]
    return jnp.stack(outs)[:, :, : 2 * H, : 2 * W, :]
