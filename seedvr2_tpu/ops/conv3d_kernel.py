"""Pallas 3x3x3 convolution kernel for the causal video VAE.

XLA's TPU lowering of Conv3D reaches only ~17% MFU at the VAE's shapes
(measured: 27.8 TFLOP/s on 512x512x128ch tiles vs 166 TFLOP/s on plain
matmuls — docs/PERFORMANCE.md), and the VAE dominates pipeline wall time
exactly as the reference observes of CUDA ("The VAE is slow",
reference README.md:999). This kernel expresses the 3x3x3 conv as 27
shifted [M,Cin]@[Cin,Cout] MXU matmuls accumulated in fp32:

- overlapping (halo) input blocks are fetched with Element-indexed
  BlockSpecs, so Pallas pipelines/double-buffers the slab DMA itself;
- input is pre-padded spatially, temporally pre-extended upstream
  (causal head extension in models/vae/causal_conv.py), so programs never
  touch bounds;
- grid: (frames, H tiles, W tiles, Cout tiles); the weight tile for the
  current Cout slice lives in VMEM across the whole sweep.

Only stride-1 3x3x3 convs with lane-aligned channels use this path
(the bulk of VAE FLOPs); conv_in (3 input channels), 1x1x1 shortcuts and
strided downsamplers stay on XLA.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element

# Default ON: the kernel is faster than XLA's Conv3D at every measured VAE
# shape (docs/PERFORMANCE.md; 64 vs 51 TFLOP/s at frame scale) and
# numerically exact (tests/test_conv3d_kernel.py). Per-(shape) compile
# failures fall back to XLA with a logged warning
# (models/vae/causal_conv.py). Disable with set_conv_backend("xla").
_ENABLED = True


def set_conv_backend(name: str) -> None:
    global _ENABLED
    _ENABLED = name == "pallas"


def compile_fallback(e: Exception) -> bool:
    """Backend-compile-failure escape hatch for the jitted-call layer.

    The try/except inside causal_conv3d catches only trace-time errors; a
    Mosaic/backend failure surfaces when the ENCLOSING jit compiles (e.g. a
    fused whole-pipeline program embedding many pallas_calls that a remote
    compile helper rejects). Callers that jit programs containing this
    kernel (Runner._with_oom_fallback, phases.generate) call this on a
    non-OOM error: if it looks like a compile failure while the pallas path
    was on, the path is disabled and True is returned — the caller drops its
    compiled-fn caches and retries once via the XLA conv lowering. A second
    failure re-raises, so real errors stay visible."""
    global _ENABLED
    if not _ENABLED:
        return False
    msg = str(e)
    if "RESOURCE_EXHAUSTED" in msg:
        return False
    markers = (
        "Mosaic", "mosaic", "tpu_compile_helper", "pallas", "Pallas",
        "INTERNAL", "UNIMPLEMENTED", "INVALID_ARGUMENT", "compil",
    )
    if not any(m in msg for m in markers):
        return False
    _ENABLED = False
    import warnings

    warnings.warn(
        f"pallas conv3d disabled after enclosing-jit compile failure: "
        f"{type(e).__name__}: {msg[:200]}"
    )
    return True


def _kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, th: int, tw: int, cin: int):
    """x_ref: [3, th+2, tw+8, Cin] halo'd slab (Element-blocked);
    w_ref: [3,3,3,Cin,co]; o_ref: [1, th, tw, co]."""
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for kt in range(3):
        for kh in range(3):
            for kw in range(3):
                xs = x_ref[kt, kh : kh + th, kw : kw + tw, :].reshape(th * tw, cin)
                acc_ref[...] += jax.lax.dot_general(
                    xs,
                    w_ref[kt, kh, kw],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out = acc_ref[...] + b_ref[0].astype(jnp.float32)
    o_ref[...] = out.reshape(1, th, tw, o_ref.shape[-1]).astype(o_ref.dtype)


def _kernel_gn(
    x_ref, s_ref, f_ref, w_ref, b_ref, o_ref, xn_ref, acc_ref,
    *, th: int, tw: int, cin: int, H: int, W: int,
):
    """Fused GroupNorm+SiLU prologue variant (decode's GN/SiLU passes run at
    HBM bandwidth between convs — fusing them into the conv's slab load
    removes a full-tensor write+read per resnet norm, ROADMAP #9).

    x_ref: RAW halo'd slab [3, th+2, tw+8, Cin]; s_ref/f_ref: per-frame
    fp32 scale/shift rows [3, Cin] (GroupNorm folded to x*scale+shift,
    gn_silu_tables); xn_ref: normalized-slab scratch. The spatial halo is
    ZERO in conv semantics only AFTER normalization (SAME padding pads the
    activations), so out-of-image positions are masked to zero here — the
    raw pad zeros would otherwise normalize to silu(shift) != 0."""
    h = pl.program_id(1)
    w_ = pl.program_id(2)

    @pl.when(pl.program_id(3) == 0)  # slab is identical across Cout blocks
    def _prologue():
        rows = h * th + jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 8), 0)
        cols = w_ * tw + jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 8), 1)
        mask = ((rows >= 1) & (rows <= H) & (cols >= 1) & (cols <= W))[:, :, None]
        for kt in range(3):
            xk = x_ref[kt].astype(jnp.float32)
            xk = xk * s_ref[kt][None, None, :] + f_ref[kt][None, None, :]
            xk = xk * jax.nn.sigmoid(xk)
            xn_ref[kt] = jnp.where(mask, xk, 0.0).astype(xn_ref.dtype)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for kt in range(3):
        for kh in range(3):
            for kw in range(3):
                xs = xn_ref[kt, kh : kh + th, kw : kw + tw, :].reshape(th * tw, cin)
                acc_ref[...] += jax.lax.dot_general(
                    xs,
                    w_ref[kt, kh, kw],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out = acc_ref[...] + b_ref[0].astype(jnp.float32)
    o_ref[...] = out.reshape(1, th, tw, o_ref.shape[-1]).astype(o_ref.dtype)


def gn_silu_tables(x_ext: jnp.ndarray, gw, gb, groups: int, eps: float = 1e-6):
    """Fold per-frame GroupNorm into per-(frame, channel) affine tables.

    x_ext: RAW [B, T, H, W, C]; returns (scale, shift) fp32 [B, T, C] with
    x*scale + shift == (GroupNorm(x) * gw + gb) per (b, t) — per-frame stats
    exactly like models/vae/model.py:_gn (reference causal_norm_wrapper
    rearranges to (b t) c h w). Two-pass variance matches
    ops/normalization.group_norm bit-for-bit in fp32."""
    B, Tt, H, W, C = x_ext.shape
    xf = x_ext.astype(jnp.float32).reshape(B, Tt, H * W, groups, C // groups)
    mean = jnp.mean(xf, axis=(2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 4), keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    # broadcast group stats to channels: [B, T, g, 1] -> [B, T, C]
    mean_c = jnp.broadcast_to(
        mean[:, :, 0], (B, Tt, groups, C // groups)
    ).reshape(B, Tt, C)
    rstd_c = jnp.broadcast_to(
        rstd[:, :, 0], (B, Tt, groups, C // groups)
    ).reshape(B, Tt, C)
    gwf = gw.astype(jnp.float32)
    gbf = gb.astype(jnp.float32)
    scale = rstd_c * gwf
    shift = gbf - mean_c * scale
    return scale, shift


def _tile_for(cin: int) -> Tuple[int, int, int]:
    """(th, tw, co_tile): keep slab ~<4MB and weights in VMEM."""
    if cin <= 128:
        return 16, 256, 128
    if cin <= 256:
        return 16, 128, 128
    return 8, 128, 128


def _tile_for_fused(cin: int) -> Tuple[int, int, int]:
    """Fused-GN tiles: the normalized-slab scratch (_kernel_gn xn_ref) lives
    alongside the double-buffered raw slab, so rows shrink to keep total
    VMEM ~<12MB; halo re-read grows (th+2)/th but the c128+ convs are
    MXU-bound, not DMA-bound (docs/PERFORMANCE.md decode accounting)."""
    if cin <= 128:
        return 8, 256, 128
    return 8, 128, 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def conv3d_3x3x3(
    x_ext: jnp.ndarray,  # [B, T+2, H, W, C_in] (temporally pre-extended)
    w: jnp.ndarray,  # [3, 3, 3, C_in, C_out]
    b: Optional[jnp.ndarray],  # [C_out]
    interpret: Optional[bool] = None,
    scale: Optional[jnp.ndarray] = None,  # [B, T+2, C_in] fp32 (gn_silu_tables)
    shift: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns [B, T, H, W, C_out] (SAME spatial padding, valid temporal).

    With ``scale``/``shift`` the kernel applies silu(x*scale + shift) to the
    raw input slab before convolving (fused per-frame GroupNorm+SiLU; see
    _kernel_gn), masking the spatial halo to zero post-normalization."""
    B, Text, H, W, Cin = x_ext.shape
    T = Text - 2
    Cout = w.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fused_gn = scale is not None

    th, tw, co_tile = _tile_for_fused(Cin) if fused_gn else _tile_for(Cin)
    th = min(th, _round_up(H, 8))
    tw = min(tw, _round_up(W, 128))
    Hp = _round_up(H, th)
    Wp = _round_up(W, tw)
    n_co = (Cout + co_tile - 1) // co_tile
    Cop = n_co * co_tile

    # halo: +1 low side; high side up to the last block's reach
    # (h blocks read th+2 rows from hi*th; w blocks read tw+8 cols).
    xp = jnp.pad(x_ext, ((0, 0), (0, 0), (1, Hp - H + 1), (1, Wp - W + 7), (0, 0)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 0), (0, Cop - Cout)))
    bp = jnp.pad(
        (b if b is not None else jnp.zeros((Cout,), x_ext.dtype)), ((0, Cop - Cout),)
    ).reshape(1, Cop)

    grid = (T, Hp // th, Wp // tw, n_co)

    x_spec = pl.BlockSpec(
        (Element(3), Element(th + 2), Element(tw + 8), Element(Cin)),
        lambda t, h, w_, c: (t, h * th, w_ * tw, 0),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec(
        (3, 3, 3, Cin, co_tile),
        lambda t, h, w_, c: (0, 0, 0, 0, c),
        memory_space=pltpu.VMEM,
    )
    b_spec = pl.BlockSpec((1, co_tile), lambda t, h, w_, c: (0, c), memory_space=pltpu.VMEM)
    sf_spec = pl.BlockSpec(
        (Element(3), Element(Cin)), lambda t, h, w_, c: (t, 0), memory_space=pltpu.VMEM
    )
    if fused_gn:
        kern = functools.partial(_kernel_gn, th=th, tw=tw, cin=Cin, H=H, W=W)
        in_specs = [x_spec, sf_spec, sf_spec, w_spec, b_spec]
        scratch = [
            pltpu.VMEM((3, th + 2, tw + 8, Cin), x_ext.dtype),
            pltpu.VMEM((th * tw, co_tile), jnp.float32),
        ]
    else:
        kern = functools.partial(_kernel, th=th, tw=tw, cin=Cin)
        in_specs = [x_spec, w_spec, b_spec]
        scratch = [pltpu.VMEM((th * tw, co_tile), jnp.float32)]

    def run_one(*args):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, th, tw, co_tile), lambda t, h, w_, c: (t, h, w_, c), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((T, Hp, Wp, Cop), x_ext.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 27 * T * Hp * Wp * Cin * Cop,
                bytes_accessed=2 * T * Hp * Wp * (Cin + Cop) * 3,
                transcendentals=0,
            ),
        )(*args)

    if fused_gn:
        outs = [
            run_one(xp[i], scale[i].astype(jnp.float32), shift[i].astype(jnp.float32), wp, bp)
            for i in range(B)
        ]
    else:
        outs = [run_one(xp[i], wp, bp) for i in range(B)]
    out = jnp.stack(outs)[:, :, :H, :W, :Cout]
    return out


def _kernel_im2col(x_ref, w_ref, b_ref, o_ref, col_ref, *, th: int, tw: int, cin: int):
    """Tap-folded im2col: gather the 27 taps into one [M, 27*Cin] VMEM
    matrix, then a single MXU matmul with contraction depth 27*Cin instead
    of 27 accumulating K=Cin matmuls (docs/PERFORMANCE.md: raising effective
    K past the MXU's 128-deep pipeline is the identified headroom).

    x_ref: [3, th+2, tw+8, Cin] halo'd slab; w_ref: [27*Cin, co];
    col_ref: [th*tw, 27*Cin] scratch; o_ref: [1, th, tw, co].
    """
    for kt in range(3):
        for kh in range(3):
            for kw in range(3):
                tap = (kt * 3 + kh) * 3 + kw
                col_ref[:, tap * cin : (tap + 1) * cin] = x_ref[
                    kt, kh : kh + th, kw : kw + tw, :
                ].reshape(th * tw, cin)
    out = jax.lax.dot_general(
        col_ref[...],
        w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0].astype(jnp.float32)
    o_ref[...] = out.reshape(1, th, tw, o_ref.shape[-1]).astype(o_ref.dtype)


def _tile_for_im2col(cin: int) -> Tuple[int, int, int]:
    """(th, tw, co_tile): keep the [M, 27*Cin] col scratch ~<=7MB bf16."""
    if cin <= 128:
        return 8, 128, 128
    if cin <= 256:
        return 4, 128, 128
    return 2, 128, 128


def conv3d_3x3x3_im2col(
    x_ext: jnp.ndarray,  # [B, T+2, H, W, C_in] (temporally pre-extended)
    w: jnp.ndarray,  # [3, 3, 3, C_in, C_out]
    b: Optional[jnp.ndarray],  # [C_out]
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Returns [B, T, H, W, C_out] (SAME spatial padding, valid temporal)."""
    B, Text, H, W, Cin = x_ext.shape
    T = Text - 2
    Cout = w.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    th, tw, co_tile = _tile_for_im2col(Cin)
    th = min(th, _round_up(H, 8))
    tw = min(tw, _round_up(W, 128))
    Hp = _round_up(H, th)
    Wp = _round_up(W, tw)
    n_co = (Cout + co_tile - 1) // co_tile
    Cop = n_co * co_tile

    xp = jnp.pad(x_ext, ((0, 0), (0, 0), (1, Hp - H + 1), (1, Wp - W + 7), (0, 0)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 0), (0, Cop - Cout)))
    wp = wp.reshape(27 * Cin, Cop)
    bp = jnp.pad(
        (b if b is not None else jnp.zeros((Cout,), x_ext.dtype)), ((0, Cop - Cout),)
    ).reshape(1, Cop)

    kern = functools.partial(_kernel_im2col, th=th, tw=tw, cin=Cin)
    grid = (T, Hp // th, Wp // tw, n_co)

    x_spec = pl.BlockSpec(
        (Element(3), Element(th + 2), Element(tw + 8), Element(Cin)),
        lambda t, h, w_, c: (t, h * th, w_ * tw, 0),
        memory_space=pltpu.VMEM,
    )

    def run_one(xb):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec(
                    (27 * Cin, co_tile),
                    lambda t, h, w_, c: (0, c),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, co_tile), lambda t, h, w_, c: (0, c), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, th, tw, co_tile), lambda t, h, w_, c: (t, h, w_, c), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((T, Hp, Wp, Cop), x_ext.dtype),
            scratch_shapes=[pltpu.VMEM((th * tw, 27 * Cin), x_ext.dtype)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 27 * T * Hp * Wp * Cin * Cop,
                bytes_accessed=2 * T * Hp * Wp * (Cin + Cop) * 3,
                transcendentals=0,
            ),
        )(xb, wp, bp)

    outs = [run_one(xp[i]) for i in range(B)]
    out = jnp.stack(outs)[:, :, :H, :W, :Cout]
    return out


def enabled_for(w_shape: Tuple[int, ...], stride: Tuple[int, int, int]) -> bool:
    """True when this kernel handles the conv (stride-1 3x3x3, lane-aligned
    channels)."""
    if not _ENABLED:
        return False
    kt, kh, kw, cin, cout = w_shape
    return (
        (kt, kh, kw) == (3, 3, 3)
        and stride == (1, 1, 1)
        and cin % 128 == 0
        and cout % 128 == 0
    )
