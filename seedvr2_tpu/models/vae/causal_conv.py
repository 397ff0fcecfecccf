"""Temporally-causal 3D convolution with functional streaming state.

The reference's ``InflatedCausalConv3d`` holds a per-module ``self.memory``
tensor and a MemoryState enum threading DISABLED/INITIALIZING/ACTIVE through
every forward (reference: src/models/video_vae_v3/modules/
causal_inflation_lib.py:62-305). That mutable-module design cannot live
under jit; here the carry is explicit:

- first slice (or non-streaming): the head is extended by replicating the
  first frame ``2 * temporal_pad`` times (reference: extend_head,
  causal_inflation_lib.py:422-437);
- streaming: the carry (last ``k_t - stride_t`` frames of the *extended*
  input) is concatenated instead (reference: basic_forward :229-248).

State is a dict path -> array collected by ``StreamCtx`` so encode/decode
are pure functions of (params, x, state). The reference's recursive spatial
splitting under a memory budget (:115-211) is unnecessary on TPU — XLA
schedules the convolution in tiles; spatial *tiling* for quality parity
lives in models/vae/tiling.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

State = Dict[str, jnp.ndarray]

# GroupNorm+SiLU fusion into the Pallas conv prologue. MEASURED A WASH at
# the bench shapes in a verified-calm window (scripts/decode_ab_gn.py,
# 2026-08-18: decode 2.349s separate vs 2.345s fused, encode 1.242 vs
# 1.243) — XLA already overlaps the normalize write with neighbouring MXU
# work, so the saved HBM pass is off the critical path. Default OFF to
# keep the round-3-proven lowering; the kernel + toggle stay for shapes
# where the balance differs (both settings numerically equivalent,
# tests/test_conv3d_kernel.py).
_GN_FUSION = False


def set_gn_fusion(on: bool) -> None:
    global _GN_FUSION
    _GN_FUSION = bool(on)


class StreamCtx:
    """Threads streaming-conv state through a (traced) VAE forward.

    mode: "disabled" (single shot), "init" (first temporal slice),
    "active" (subsequent slices, consume carries from in_state).
    """

    def __init__(self, mode: str = "disabled", in_state: Optional[State] = None):
        assert mode in ("disabled", "init", "active")
        self.mode = mode
        self.in_state = in_state or {}
        self.out_state: State = {}
        self._path = []

    def scope(self, name: str):
        ctx = self

        class _Scope:
            def __enter__(self_inner):
                ctx._path.append(name)

            def __exit__(self_inner, *a):
                ctx._path.pop()

        return _Scope()

    @property
    def path(self) -> str:
        return "/".join(self._path)

    def get(self, leaf: str) -> Optional[jnp.ndarray]:
        return self.in_state.get(f"{self.path}/{leaf}")

    def put(self, leaf: str, value: jnp.ndarray) -> None:
        self.out_state[f"{self.path}/{leaf}"] = value


def causal_conv3d(
    p: Dict[str, jnp.ndarray],
    x: jnp.ndarray,  # [B, T, H, W, C]
    ctx: StreamCtx,
    name: str,
    stride: Tuple[int, int, int] = (1, 1, 1),
    spatial_pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1)),
    temporal_pad: Optional[int] = None,
    gn=None,  # (norm_params, num_groups): fuse GroupNorm+SiLU prologue
) -> jnp.ndarray:
    """w: [kt, kh, kw, Cin, Cout] (DHWIO); b: [Cout].

    temporal_pad defaults to (kt - 1) // 2 like torch Conv3d padding=k//2.

    ``gn``: run per-frame GroupNorm+SiLU on the input INSIDE this op
    (conv(silu(gn(x)))). The streaming carry then holds the RAW input tail
    — per-frame GroupNorm commutes with temporal concatenation (a frame's
    stats don't depend on which slice it arrives in), so normalizing the
    extended raw tensor is bit-identical to extending the normalized one,
    and the Pallas fast path can fold the normalization into the conv's
    slab load (ops/conv3d_kernel.py:_kernel_gn — removes the full-tensor
    normalize write + conv re-read, ROADMAP #9)."""
    w = p["w"]
    kt = w.shape[0]
    if temporal_pad is None:
        temporal_pad = (kt - 1) // 2

    with ctx.scope(name):
        mem = ctx.get("mem") if ctx.mode == "active" else None
        if mem is not None:
            x_ext = jnp.concatenate([mem.astype(x.dtype), x], axis=1)
        elif temporal_pad > 0:
            head = jnp.repeat(x[:, :1], 2 * temporal_pad, axis=1)
            x_ext = jnp.concatenate([head, x], axis=1)
        else:
            x_ext = x
        cache = kt - stride[0]
        if cache > 0 and ctx.mode != "disabled":
            ctx.put("mem", x_ext[:, -cache:])

    if gn is not None and not _GN_FUSION:
        # A/B off-position: normalize the extended raw tensor up front
        # (bit-identical — per-frame GN commutes with extension) and run
        # the plain conv paths below, i.e. round-3 behavior.
        from ...ops.normalization import group_norm

        norm_p, groups = gn
        B_, Tt_, H_, W_, C_ = x_ext.shape
        xn = group_norm(
            x_ext.reshape(B_ * Tt_, H_, W_, C_), groups, norm_p["w"], norm_p["b"], eps=1e-6
        )
        x_ext = jax.nn.silu(xn.astype(jnp.float32)).astype(x.dtype).reshape(x_ext.shape)
        gn = None

    # Fast path: fused Pallas kernel for the dominant stride-1 3x3x3 convs
    # (ops/conv3d_kernel.py). Falls back to XLA per shape on compile issues.
    if spatial_pad == ((1, 1), (1, 1)):
        from ...ops import conv3d_kernel as ck

        if ck.enabled_for(tuple(w.shape), stride):
            key = ("conv3d", tuple(x_ext.shape), tuple(w.shape), gn is not None)
            if key not in _KERNEL_BLOCKLIST:
                try:
                    if gn is not None:
                        norm_p, groups = gn
                        sc, sf = ck.gn_silu_tables(
                            x_ext, norm_p["w"], norm_p["b"], groups
                        )
                        return ck.conv3d_3x3x3(
                            x_ext, w.astype(x.dtype), p.get("b"), scale=sc, shift=sf
                        )
                    return ck.conv3d_3x3x3(x_ext, w.astype(x.dtype), p.get("b"))
                except Exception as e:
                    # Per-shape fallback, loudly: a silent blocklist hides
                    # kernel regressions (round-1 review finding).
                    import warnings

                    _KERNEL_BLOCKLIST.add(key)
                    warnings.warn(
                        f"pallas conv3d fell back to XLA for x{tuple(x_ext.shape)} "
                        f"w{tuple(w.shape)}: {type(e).__name__}: {str(e)[:200]}"
                    )

    if gn is not None:
        # XLA fallback: normalize the extended raw tensor per frame, then
        # convolve — identical numerics to the fused kernel (spatial zero
        # padding applies to the NORMALIZED activations below).
        from ...ops.normalization import group_norm

        norm_p, groups = gn
        B, Tt, H, W, C = x_ext.shape
        xn = group_norm(
            x_ext.reshape(B * Tt, H, W, C), groups, norm_p["w"], norm_p["b"], eps=1e-6
        )
        xn = jax.nn.silu(xn.astype(jnp.float32)).astype(x.dtype)
        x_ext = xn.reshape(B, Tt, H, W, C)

    y = jax.lax.conv_general_dilated(
        x_ext,
        w.astype(x.dtype),
        window_strides=stride,
        padding=[(0, 0), spatial_pad[0], spatial_pad[1]],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


_KERNEL_BLOCKLIST = set()
