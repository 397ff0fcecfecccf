"""Temporal slicing and spatial tiling drivers for the VAE.

Mirrors the reference's memory-bounded execution strategies
(reference: src/models/video_vae_v3/modules/attn_video_vae.py:1254-1630):

- slicing_encode/decode: split time into (1 + k*split) slices; the first
  slice runs in "init" mode, the rest in "active" mode consuming the
  streaming conv state — numerically identical to a single full pass.
- tiled_encode/decode: spatial tiles with separable cosine-ramp blending on
  interior edges only, accumulated into sum/weight buffers.

On TPU these also serve a second purpose: each slice/tile is a fixed-shape
jit invocation, so one compiled executable serves arbitrarily long videos.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import VAEConfig
from .causal_conv import StreamCtx
from .model import decoder_forward, encoder_forward, posterior_mode


# --------------------------------------------------------------------------- #
# Temporal slicing
# --------------------------------------------------------------------------- #


def _temporal_slices(T: int, first: int, rest: int):
    """Slice boundaries: first frame + chunks (reference:
    attn_video_vae.py:1256-1263 — x[:, :, :1+rest] then chunks of rest)."""
    bounds = [(0, min(1 + rest, T))]
    s = 1 + rest
    while s < T:
        bounds.append((s, min(s + rest, T)))
        s += rest
    return bounds


@partial(jax.jit, static_argnames=("cfg", "mode"))
def _encode_slice(params, cfg: VAEConfig, x, state, mode: str):
    ctx = StreamCtx(mode, state)
    out = encoder_forward(params, cfg, x, ctx)
    return out, ctx.out_state


@partial(jax.jit, static_argnames=("cfg", "mode"))
def _decode_slice(params, cfg: VAEConfig, z, state, mode: str):
    ctx = StreamCtx(mode, state)
    out = decoder_forward(params, cfg, z, ctx)
    return out, ctx.out_state


def slicing_encode(params, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, W, 3] (T = 4n+1) -> moments [B, n+1, H/8, W/8, 2C]."""
    T = x.shape[1]
    split = cfg.slicing_sample_min_size
    if (T - 1) <= split:
        return _encode_slice(params, cfg, x, {}, "disabled")[0]
    outs = []
    state = {}
    for i, (s, e) in enumerate(_temporal_slices(T, 1, split)):
        out, state = _encode_slice(params, cfg, x[:, s:e], state, "init" if i == 0 else "active")
        outs.append(out)
    return jnp.concatenate(outs, axis=1)


def slicing_decode(params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z: [B, T', H', W', C] -> [B, 4(T'-1)+1, 8H', 8W', 3]."""
    T = z.shape[1]
    split = cfg.slicing_latent_min_size
    if (T - 1) <= split:
        return _decode_slice(params, cfg, z, {}, "disabled")[0]
    outs = []
    state = {}
    for i, (s, e) in enumerate(_temporal_slices(T, 1, split)):
        out, state = _decode_slice(params, cfg, z[:, s:e], state, "init" if i == 0 else "active")
        outs.append(out)
    return jnp.concatenate(outs, axis=1)


# --------------------------------------------------------------------------- #
# Spatial tiling
# --------------------------------------------------------------------------- #


def _cosine_ramp(n: int) -> np.ndarray:
    """Exact cosine fade, linspace(0,1) endpoints included (reference:
    attn_video_vae.py:1588-1610). Endpoint zeros are safe because the ramp
    LENGTH is clamped to the smallest actual seam overlap (_seam_ramp) — a
    ramp can never span farther than its seam, so the opposite tile is
    always at full weight where this one reaches zero."""
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)
    return 0.5 - 0.5 * np.cos(t * np.pi)


def _seam_ramp(tile: int, starts: list, overlap: int) -> int:
    """Blend-ramp length for one axis: the configured overlap clamped to the
    smallest ACTUAL seam overlap of the grid.

    _axis_grid rounds interior starts independently, so one seam's actual
    overlap can be ``overlap - 1``. An endpoint-zero cosine ramp longer than
    that seam would give BOTH adjacent tiles ~0 weight on the same column and
    acc/max(cnt, eps) produced a dark seam line (ADVICE r2). Clamping the
    ramp to the seam restores the invariant that wherever one tile's ramp
    hits zero the neighbouring tile is at weight 1 — and keeps the ramps
    bit-exact with the reference whenever the grid seams equal the
    configured overlap (tests/test_reference_parity.py::
    test_vae_tiled_encode_parity; tests/test_vae.py::
    test_axis_weights_never_vanish covers the shortened-seam grids)."""
    r = max(0, min(overlap, tile - 1))
    for a, b in zip(starts, starts[1:]):
        r = min(r, a + tile - b)
    return max(0, r)


def _tile_starts(total: int, tile: int, stride: int) -> list:
    """Uniform full-size tile starts covering [0, total): stride steps with the
    last start clamped to ``total - tile`` so every tile holds real content.

    The reference instead clips edge tiles to the image bound
    (attn_video_vae.py:1526-1535) which yields ragged shapes; shifting the
    last start keeps ONE compiled decoder shape (TPU static-shape requirement)
    while still decoding only real pixels. When (total - tile) % stride == 0
    the two grids coincide exactly."""
    if total <= tile:
        return [0]
    starts = list(range(0, total - tile, stride))
    starts.append(total - tile)
    return starts


def effective_pixel_overlap(ov: int, extent_lat: int, ltmax: int, sf: int) -> int:
    """Pixel overlap for one axis after the hard-seam guard.

    A pixel overlap that floors to ZERO latent overlap (any ov < sf,
    including the explicit 0 of the full-axis column configs) declares
    "this axis fits in one tile". When the axis still needs more than one
    tile — e.g. the (1088,1024)/(0,128) 1080p config applied to a 4K clip —
    zero latent overlap would leave an unblended hard seam; the reference
    always blends tile seams (reference: attn_video_vae.py:1544-1596), so
    restore the default blended 128px overlap on that axis instead. Shared
    by tiled_encode/tiled_decode/tiled_decode_staged/column_chunk_plan and
    the --tile_debug overlay (utils/tile_debug.py) so the drawn grid is the
    grid that runs."""
    if extent_lat > ltmax and ov // sf <= 0:
        return 128
    return ov


def _axis_grid(total: int, tile_max: int, overlap: int) -> Tuple[int, list]:
    """Equalized tile grid for one axis (latent coordinates).

    The naive fixed-size grid decodes up to ~1.9x the image area at common
    shapes (e.g. 512-tiles on 1088x1920): the shift-last-start tile overlaps
    its neighbour by almost a full tile. Keeping the *count* the naive grid
    needs but shrinking every tile to the minimum size that still covers
    with >= ``overlap``, redundant conv work drops to ~1.3x with identical
    seam quality (the cosine blend only needs ``overlap`` pixels). Returns
    (tile, starts); tiles remain uniform so one compiled shape serves all.
    """
    if total <= tile_max:
        return total, [0]
    overlap = min(overlap, tile_max - 1)
    n = math.ceil((total - overlap) / (tile_max - overlap))
    tile = math.ceil((total + (n - 1) * overlap) / n)
    starts = [round(i * (total - tile) / (n - 1)) for i in range(n)]
    return tile, starts


def _edge_weights(n: int, ov: int, at_start_edge: bool, at_end_edge: bool) -> np.ndarray:
    w = np.ones(n, dtype=np.float32)
    ov = max(0, min(ov, n - 1))
    if ov > 0:
        ramp = _cosine_ramp(ov)
        if not at_start_edge:
            w[:ov] = ramp
        if not at_end_edge:
            w[-ov:] = 1.0 - ramp
    return w


def _scan_tiled(
    run_group,  # [B*g, T, th_in, tw_in, Cin] -> [B*g, T2, th_out, tw_out, Cout]
    tile_in: jnp.ndarray,  # [B, n_tiles_padded, T, th_in, tw_in, Cin]
    weights: np.ndarray,  # [n_tiles_padded, th_out, tw_out]; 0 for pad tiles
    out_starts: np.ndarray,  # [n_tiles_padded, 2] output-space (y, x)
    out_hw: Tuple[int, int],
    tile_batch: int,
    tile_sharding,
) -> jnp.ndarray:
    """Sequential tile-group driver as one ``lax.scan``.

    The body (one group of ``tile_batch`` tiles through the model + blended
    scatter-add at dynamic offsets) is traced and compiled ONCE regardless of
    grid size, and scan's carry makes group-by-group execution explicit — XLA
    cannot overlap the independent group computations and multiply peak HBM
    by the group count, which is exactly what happens if the groups are
    unrolled side by side under one jit. Remainder groups are padded with a
    duplicate of the last tile carrying zero blend weight, so every group has
    one shape and padding cannot double-count.

    The sample axis B rides INSIDE each scan step ([B*g] through the model):
    under a "data"-sharded batch (multichip frame-DP segments) every chip
    works on its own segment's tile k simultaneously — a per-sample Python
    loop would serialize the mesh instead."""
    B = tile_in.shape[0]
    g = tile_batch
    n_groups = tile_in.shape[1] // g
    out_shape = jax.eval_shape(
        run_group,
        jax.ShapeDtypeStruct((B * g,) + tuple(tile_in.shape[2:]), tile_in.dtype),
    )
    T2, th_out, tw_out, c_out = out_shape.shape[1:]
    H_out, W_out = out_hw

    xs = (
        # [n_groups, B, g, T, th, tw, C]: scan over groups; inside a step the
        # model sees [B*g] with B as the MAJOR axis so a "data"-sharded B
        # keeps its sharding through the reshape (GSPMD merges a sharded
        # major dim; a minor-dim sharding would force an all-gather).
        tile_in.reshape((B, n_groups, g) + tile_in.shape[2:]).transpose(
            (1, 0, 2) + tuple(range(3, tile_in.ndim + 1))
        ),
        jnp.asarray(weights.reshape(n_groups, g, th_out, tw_out)),
        jnp.asarray(out_starts.reshape(n_groups, g, 2).astype(np.int32)),
    )
    acc0 = jnp.zeros((B, T2, H_out, W_out, c_out), jnp.float32)
    cnt0 = jnp.zeros((1, 1, H_out, W_out, 1), jnp.float32)

    def body(carry, inp):
        acc, cnt = carry
        batch, w, st = inp  # batch: [B, g, T, th, tw, C]
        batch = batch.reshape((B * g,) + batch.shape[2:])
        if tile_sharding is not None:
            # distribute the group's tiles across the mesh's data axis: on an
            # N-chip slice spatial tiling doubles as tile parallelism
            # (SURVEY §2.3 "VAE tiles sharded across mesh devices")
            batch = jax.lax.with_sharding_constraint(batch, tile_sharding)
        out = run_group(batch)  # [B*g, T2, th_out, tw_out, Cout]
        out = out.reshape((B, g) + out.shape[1:])
        for gi in range(g):  # static unroll within one group
            w2 = w[gi][None, None, :, :, None]
            y, x = st[gi, 0], st[gi, 1]
            upd = out[:, gi].astype(jnp.float32) * w2
            cur = jax.lax.dynamic_slice(
                acc, (0, 0, y, x, 0), (B, T2, th_out, tw_out, c_out)
            )
            acc = jax.lax.dynamic_update_slice(acc, cur + upd, (0, 0, y, x, 0))
            curc = jax.lax.dynamic_slice(cnt, (0, 0, y, x, 0), (1, 1, th_out, tw_out, 1))
            cnt = jax.lax.dynamic_update_slice(cnt, curc + w2[:, :1], (0, 0, y, x, 0))
        return (acc, cnt), None

    (acc, cnt), _ = jax.lax.scan(body, (acc0, cnt0), xs)
    return acc / jnp.clip(cnt, 1e-6)


def _pad_tiles(tiles: list, weights: list, tile_batch: int):
    """Pad the tile list to a multiple of ``tile_batch`` with zero-weight
    duplicates of the last tile."""
    pad = (-len(tiles)) % tile_batch
    if pad:
        tiles = tiles + [tiles[-1]] * pad
        weights = weights + [np.zeros_like(weights[-1])] * pad
    return tiles, np.stack(weights)


def tiled_encode(
    params,
    cfg: VAEConfig,
    x: jnp.ndarray,
    tile_size: Tuple[int, int] = (512, 512),
    tile_overlap: Tuple[int, int] = (64, 64),
    tile_batch: int = 1,
    tile_sharding=None,  # NamedSharding over the tile-batch dim (multi-chip)
) -> jnp.ndarray:
    """Spatial tiling in latent-space coordinates (reference:
    attn_video_vae.py:1302-1468). Tile/overlap are pixel-space values.
    Tiles are encoded ``tile_batch`` at a time through one scanned encoder
    body (see _scan_tiled)."""
    B, T, H, W, _ = x.shape
    sf = cfg.spatial_downsample_factor
    ltmax_h, ltmax_w = max(1, tile_size[0] // sf), max(1, tile_size[1] // sf)
    H_lat, W_lat = math.ceil(H / sf), math.ceil(W / sf)
    if H <= tile_size[0] and W <= tile_size[1]:
        return slicing_encode(params, cfg, x)
    # Sub-latent overlaps on a multi-tile axis get the default blended
    # overlap back (effective_pixel_overlap; matching note in tiled_decode).
    ov_h = effective_pixel_overlap(tile_overlap[0], H_lat, ltmax_h, sf)
    ov_w = effective_pixel_overlap(tile_overlap[1], W_lat, ltmax_w, sf)
    lo_h = max(0, min(ov_h // sf, ltmax_h - 1))
    lo_w = max(0, min(ov_w // sf, ltmax_w - 1))

    # Equalized uniform tile grid (see _axis_grid). H/W are /16-padded
    # upstream (DivisiblePad) so pixel-space starts are latent-aligned.
    lt_h, rows = _axis_grid(H_lat, ltmax_h, lo_h)
    lt_w, cols = _axis_grid(W_lat, ltmax_w, lo_w)
    tiles = [(y, x0) for y in rows for x0 in cols]
    r_h = _seam_ramp(lt_h, rows, lo_h)
    r_w = _seam_ramp(lt_w, cols, lo_w)
    weights = []
    for (y, x0) in tiles:
        wh = _edge_weights(lt_h, r_h, y == 0, y == rows[-1])
        ww = _edge_weights(lt_w, r_w, x0 == 0, x0 == cols[-1])
        weights.append(np.outer(wh, ww))
    tiles, weights = _pad_tiles(tiles, weights, tile_batch)

    # Edge-pad to the latent grid extent so every tile slice is full-size
    # even when H/W are not multiples of sf (the pipeline pads to /16
    # upstream, but tiled_encode is also a public API).
    Hp, Wp = H_lat * sf, W_lat * sf
    if Hp != H or Wp != W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")
    tile_in = jnp.stack(
        [x[:, :, y * sf : (y + lt_h) * sf, x0 * sf : (x0 + lt_w) * sf] for (y, x0) in tiles],
        axis=1,
    )  # [B, n_tiles, T, th, tw, 3]
    result = _scan_tiled(
        lambda b: slicing_encode(params, cfg, b),
        tile_in,
        weights,
        np.asarray(tiles),
        (H_lat, W_lat),
        tile_batch,
        tile_sharding,
    )
    return result.astype(x.dtype)


def tiled_decode(
    params,
    cfg: VAEConfig,
    z: jnp.ndarray,
    tile_size: Tuple[int, int] = (512, 512),
    tile_overlap: Tuple[int, int] = (64, 64),
    tile_batch: int = 1,
    tile_sharding=None,  # NamedSharding over the tile-batch dim (multi-chip)
) -> jnp.ndarray:
    """Reference: attn_video_vae.py:1470-1630, redesigned for the MXU: a
    *uniform full-size* tile grid (shift-last-start, _tile_starts) so all
    tiles share one compiled shape and contain only real content, decoded in
    batches of ``tile_batch`` through a single compiled decoder executable
    (the reference loops tile-by-tile with ragged edge tiles). Cosine-ramp
    blending in pixel space is unchanged; remainder groups are padded to
    ``tile_batch`` so sharding applies to every group."""
    B, T, H, W, _ = z.shape
    sf = cfg.spatial_downsample_factor
    ltmax_h, ltmax_w = max(1, tile_size[0] // sf), max(1, tile_size[1] // sf)
    if H <= ltmax_h and W <= ltmax_w:
        return slicing_decode(params, cfg, z)
    # An overlap that floors to zero latent overlap on a multi-tile axis
    # would leave an unblended hard seam — restore the default blended
    # overlap there (effective_pixel_overlap).
    ov_h = effective_pixel_overlap(tile_overlap[0], H, ltmax_h, sf)
    ov_w = effective_pixel_overlap(tile_overlap[1], W, ltmax_w, sf)
    lo_h = max(0, min(ov_h // sf, ltmax_h - 1))
    lo_w = max(0, min(ov_w // sf, ltmax_w - 1))

    # Equalized uniform tile grid in latent space (see _axis_grid).
    lt_h, rows = _axis_grid(H, ltmax_h, lo_h)
    lt_w, cols = _axis_grid(W, ltmax_w, lo_w)

    tiles = [(y, x) for y in rows for x in cols]
    th, tw = lt_h * sf, lt_w * sf

    # Per-tile pixel-space blend weights (interior edges only). Ramp length
    # clamps to the smallest actual seam overlap in PIXEL space (latent
    # seams * sf) — see _seam_ramp.
    r_h = _seam_ramp(th, [y * sf for y in rows], ov_h)
    r_w = _seam_ramp(tw, [x * sf for x in cols], ov_w)
    weights = []
    for (y, x) in tiles:
        wh = _edge_weights(th, r_h, y == 0, y == rows[-1])
        ww = _edge_weights(tw, r_w, x == 0, x == cols[-1])
        weights.append(np.outer(wh, ww))
    tiles, weights = _pad_tiles(tiles, weights, tile_batch)

    tile_in = jnp.stack(
        [z[:, :, y : y + lt_h, x : x + lt_w] for (y, x) in tiles], axis=1
    )  # [B, n_tiles, T, lt_h, lt_w, C]
    result = _scan_tiled(
        lambda b: slicing_decode(params, cfg, b),
        tile_in,
        weights,
        np.asarray(tiles) * sf,  # pixel-space output starts
        (H * sf, W * sf),
        tile_batch,
        tile_sharding,
    )
    return result.astype(z.dtype)


class ColumnChunkPlan:
    """Static geometry for the streamed column-chunk decode
    (pipeline/runner.py:fused_batch_chunks): a single row of >= 2
    full-height column tiles, decoded left-to-right as separate
    executables chained by an (acc, cnt) carry strip, each emitting a
    finalized packed column chunk the host can fetch while the next tile
    still computes. All fields are pixel-space unless noted."""

    def __init__(self, sf, lt_w, cols, tw, th, ramp, halo, emit, true_w):
        self.sf = sf
        self.lt_w = lt_w  # latent tile width
        self.cols = cols  # latent col starts (len >= 2)
        self.tw = tw  # pixel tile width
        self.th = th  # pixel tile height (full frame height)
        self.ramp = ramp  # seam blend ramp length
        self.halo = halo  # color-fix halo (0 when color is skipped)
        self.emit = emit  # chunk end boundaries; emit[-1] == true_w
        self.true_w = true_w


def column_chunk_plan(
    cfg: VAEConfig,
    H: int,  # latent rows of the decode input
    W: int,  # latent cols
    tile_size: Tuple[int, int],
    tile_overlap: Tuple[int, int],
    true_h: int,
    true_w: int,
    halo: int,
) -> Optional[ColumnChunkPlan]:
    """Build a ColumnChunkPlan for tiled_decode's EXACT grid, or None when
    streaming would change numerics. Valid only when the grid is a single
    row of >= 2 column tiles; ``halo`` must cover the color fix's spatial
    receptive field (wavelet: 5 dilated 3x3 levels, radii 1+2+4+8+16 = 31
    -> halo 32) so every emitted pixel sees only final blended values.
    The radius-clamp guard rejects shapes where wavelet_blur's
    min(H, W) // 8 safety clamp (ops/color.py:33) would act differently on
    a halo'd chunk than on the full frame."""
    sf = cfg.spatial_downsample_factor
    ltmax_h = max(1, tile_size[0] // sf)
    ltmax_w = max(1, tile_size[1] // sf)
    if H > ltmax_h:  # more than one tile row: not a column grid
        return None
    # keep the grid identical to tiled_decode's hard-seam guard
    ov_w = effective_pixel_overlap(tile_overlap[1], W, ltmax_w, sf)
    lo_w = max(0, min(ov_w // sf, ltmax_w - 1))
    lt_w, cols = _axis_grid(W, ltmax_w, lo_w)
    if len(cols) < 2:
        return None
    tw, th = lt_w * sf, H * sf
    if true_h > th or true_w > W * sf:
        return None
    p = [x * sf for x in cols]
    ramp = _seam_ramp(tw, p, ov_w)
    emit = []
    prev = 0
    for i in range(len(cols) - 1):
        e = p[i + 1] - halo
        # interior boundary + its right halo must stay inside the real
        # frame: a halo truncated at true_w would replicate-pad where the
        # full-frame fix sees real pixels
        if e <= prev or (halo and p[i + 1] > true_w) or e - halo < 0:
            return None
        emit.append(e)
        prev = e
    if true_w <= prev:
        return None
    emit.append(true_w)
    if halo:
        # wavelet_blur radius clamp parity (see docstring)
        m_full = max(1, min(true_h, true_w) // 8)
        lo = 0
        for i, e in enumerate(emit):
            a = max(0, lo - (halo if i else 0))
            b = min(true_w, e + (halo if i < len(emit) - 1 else 0))
            m_chunk = max(1, min(true_h, b - a) // 8)
            if m_chunk != m_full and (m_chunk < 16 or m_full < 16):
                return None
            lo = e
    return ColumnChunkPlan(sf, lt_w, tuple(cols), tw, th, ramp, halo, tuple(emit), true_w)


def tiled_decode_staged(
    params,
    cfg: VAEConfig,
    z,  # [B, T', H', W', C] latent (device or host)
    tile_size: Tuple[int, int] = (1024, 1024),
    tile_overlap: Tuple[int, int] = (128, 128),
) -> np.ndarray:
    """Host-staged tiled decode: one jitted per-tile decode, blended
    accumulation in HOST memory (numpy). The device never holds more than
    one tile's activations plus the latent — this is the unbounded-
    resolution rung of the decode OOM ladder, mirroring the reference's
    offload-device accumulation + preallocated final_video (reference:
    attn_video_vae.py:1612-1625, generation_phases.py:865-879). Weights
    ride in as an argument so every tile reuses ONE executable. Returns a
    host float32 array in the decoder's output range ([-1, 1])."""
    z = jnp.asarray(z)
    B, T, H, W, _ = z.shape
    sf = cfg.spatial_downsample_factor
    ltmax_h, ltmax_w = max(1, tile_size[0] // sf), max(1, tile_size[1] // sf)
    # Keep grid selection identical to tiled_decode's hard-seam guard.
    ov_h = effective_pixel_overlap(tile_overlap[0], H, ltmax_h, sf)
    ov_w = effective_pixel_overlap(tile_overlap[1], W, ltmax_w, sf)
    lo_h = max(0, min(ov_h // sf, ltmax_h - 1))
    lo_w = max(0, min(ov_w // sf, ltmax_w - 1))
    lt_h, rows = _axis_grid(H, ltmax_h, lo_h)
    lt_w, cols = _axis_grid(W, ltmax_w, lo_w)
    th, tw = lt_h * sf, lt_w * sf
    r_h = _seam_ramp(th, [y * sf for y in rows], ov_h)
    r_w = _seam_ramp(tw, [x * sf for x in cols], ov_w)

    out_shape = jax.eval_shape(
        lambda zt: slicing_decode(params, cfg, zt),
        jax.ShapeDtypeStruct((B, T, lt_h, lt_w, z.shape[-1]), z.dtype),
    )
    T2, c_out = out_shape.shape[1], out_shape.shape[-1]

    dec_tile = jax.jit(
        lambda p, zt, wmap: slicing_decode(p, cfg, zt).astype(jnp.float32)
        * wmap[None, None, :, :, None]
    )

    acc = np.zeros((B, T2, H * sf, W * sf, c_out), np.float32)
    cnt = np.zeros((1, 1, H * sf, W * sf, 1), np.float32)
    for y in rows:
        for x in cols:
            wh = _edge_weights(th, r_h, y == 0, y == rows[-1])
            ww = _edge_weights(tw, r_w, x == 0, x == cols[-1])
            wmap = np.outer(wh, ww).astype(np.float32)
            out = np.asarray(
                dec_tile(params, z[:, :, y : y + lt_h, x : x + lt_w], jnp.asarray(wmap))
            )
            ys, xs = y * sf, x * sf
            acc[:, :, ys : ys + th, xs : xs + tw] += out
            cnt[0, 0, ys : ys + th, xs : xs + tw, 0] += wmap
    return acc / np.clip(cnt, 1e-6, None)


# --------------------------------------------------------------------------- #
# Top-level encode/decode with scale/shift (runner-facing)
# --------------------------------------------------------------------------- #


def vae_encode(
    params,
    cfg: VAEConfig,
    video: jnp.ndarray,  # [B, T, H, W, 3] in [-1, 1], T = 4n+1
    tiled: bool = False,
    tile_size: Tuple[int, int] = (512, 512),
    tile_overlap: Tuple[int, int] = (64, 64),
    tile_batch: int = 1,
    tile_sharding=None,
) -> jnp.ndarray:
    """Returns scaled latent [B, T', H/8, W/8, C]: (mode(z) - shift) * scale
    (reference: src/core/infer.py:186-189; deterministic posterior mode per
    attn_video_vae.py:1688)."""
    moments = (
        tiled_encode(params, cfg, video, tile_size, tile_overlap, tile_batch, tile_sharding)
        if tiled
        else slicing_encode(params, cfg, video)
    )
    z = posterior_mode(moments)
    return (z - cfg.shifting_factor) * cfg.scaling_factor


def vae_decode(
    params,
    cfg: VAEConfig,
    latent: jnp.ndarray,  # [B, T', H', W', C] scaled
    tiled: bool = False,
    tile_size: Tuple[int, int] = (512, 512),
    tile_overlap: Tuple[int, int] = (64, 64),
    tile_batch: int = 1,
    tile_sharding=None,
) -> jnp.ndarray:
    z = latent / cfg.scaling_factor + cfg.shifting_factor
    return (
        tiled_decode(params, cfg, z, tile_size, tile_overlap, tile_batch, tile_sharding)
        if tiled
        else slicing_decode(params, cfg, z)
    )
