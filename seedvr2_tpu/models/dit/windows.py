"""3D shifted-window partitioning, computed statically for TPU.

The reference slices a per-sample [T, H, W, C] tensor into ragged windows at
runtime with dynamic index maps memoized per forward (reference:
src/models/dit_3b/window.py:28-83, na.py:616-641). Shapes inside one
pipeline run are constant, so here the partition is *host-side Python math*:
for a given (t, h, w) we precompute

- gather indices [n_win, max_len] mapping window slots -> flat THW tokens,
- a validity mask for ragged windows padded to ``max_len``,
- the inverse scatter permutation (windows tile the volume exactly once),

which become compile-time constants under jit. Window sizes are normalized
to 720p: the window *size in latent tokens* is resolution-independent
(~15x27 spatial at (4,3,3)), so higher resolutions mean more windows of the
same static shape — ideal for a fixed-tile Pallas kernel.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import List, NamedTuple, Tuple

import numpy as np

Slice3 = Tuple[slice, slice, slice]


def window_sizes_720p(
    size: Tuple[int, int, int], num_windows: Tuple[int, int, int]
) -> Tuple[int, int, int]:
    """720p-normalized window sizes (reference: window.py:31-35)."""
    t, h, w = size
    rnt, rnh, rnw = num_windows
    scale = math.sqrt((45 * 80) / (h * w))
    resized_h, resized_w = round(h * scale), round(w * scale)
    wh = math.ceil(resized_h / rnh)
    ww = math.ceil(resized_w / rnw)
    wt = math.ceil(min(t, 30) / rnt)
    return wt, wh, ww


def _axis_cuts(extent: int, win: int, shifted: bool) -> List[Tuple[int, int]]:
    """Half-open ``(start, stop)`` intervals covering ``[0, extent)``.

    Unshifted: aligned cuts every ``win`` tokens, last one clipped.  Shifted
    (only when the axis holds more than one window): the grid moves back by
    half a window, producing a leading partial window, full interior windows
    at ``int((i + 0.5) * win)`` boundaries, and a trailing partial window.
    The boundary formula must match the reference partition exactly for
    checkpoint parity (reference: src/models/dit_3b/window.py:28-83);
    tests/test_windows.py compares against it directly.
    """
    if win >= extent:
        return [(0, extent)]
    if not shifted:
        return [(lo, min(lo + win, extent)) for lo in range(0, extent, win)]
    cuts: List[Tuple[int, int]] = []
    hi = 0
    i = 0
    while hi < extent:
        lo = hi
        hi = min(int((i + 0.5) * win), extent)
        i += 1
        if hi > lo:
            cuts.append((lo, hi))
    return cuts


def _grid(
    size: Tuple[int, int, int], num_windows: Tuple[int, int, int], shifted: bool
) -> List[Slice3]:
    """Cartesian product of per-axis cuts as slice triples, ordered w-major
    then h then t (the reference's window enumeration order)."""
    t, h, w = size
    wt, wh, ww = window_sizes_720p(size, num_windows)
    t_cuts = _axis_cuts(t, wt, shifted)
    h_cuts = _axis_cuts(h, wh, shifted)
    w_cuts = _axis_cuts(w, ww, shifted)
    out: List[Slice3] = []
    for w_lo, w_hi in w_cuts:
        for h_lo, h_hi in h_cuts:
            for t_lo, t_hi in t_cuts:
                out.append((slice(t_lo, t_hi), slice(h_lo, h_hi), slice(w_lo, w_hi)))
    return out


def make_windows(
    size: Tuple[int, int, int], num_windows: Tuple[int, int, int]
) -> List[Slice3]:
    """Plain window grid (reference: window.py:28-49)."""
    return _grid(size, num_windows, shifted=False)


def make_shifted_windows(
    size: Tuple[int, int, int], num_windows: Tuple[int, int, int]
) -> List[Slice3]:
    """Half-window shifted grid (reference: window.py:51-83)."""
    return _grid(size, num_windows, shifted=True)


def get_window_op(method: str):
    if method in ("720pwin_by_size_bysize", "win"):
        return make_windows
    if method in ("720pswin_by_size_bysize", "swin"):
        return make_shifted_windows
    raise ValueError(f"Unknown windowing method: {method}")


class WindowPlan(NamedTuple):
    """Static gather/scatter plan for one (shape, method) pair."""

    index: np.ndarray  # [n_win, max_len] int32 into flat THW
    valid: np.ndarray  # [n_win, max_len] bool
    inverse: np.ndarray  # [L] int32 into flat (n_win * max_len)
    shapes: Tuple[Tuple[int, int, int], ...]  # per-window (t, h, w)
    lens: np.ndarray  # [n_win] int32 true lengths

    @property
    def n_win(self) -> int:
        return self.index.shape[0]

    @property
    def max_len(self) -> int:
        return self.index.shape[1]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=256)
def window_plan(
    size: Tuple[int, int, int],
    num_windows: Tuple[int, int, int],
    shifted: bool,
    pad_to_multiple: int = 1,
) -> WindowPlan:
    """Build the dense plan. ``pad_to_multiple`` rounds max_len up (e.g. to
    a lane multiple for the Pallas kernel)."""
    t, h, w = size
    slices = (make_shifted_windows if shifted else make_windows)(size, num_windows)
    flat = np.arange(t * h * w, dtype=np.int32).reshape(t, h, w)
    idx_list = [flat[st, sh, sw].reshape(-1) for (st, sh, sw) in slices]
    shapes = tuple(
        (
            len(range(*st.indices(t))),
            len(range(*sh.indices(h))),
            len(range(*sw.indices(w))),
        )
        for (st, sh, sw) in slices
    )
    lens = np.array([x.size for x in idx_list], dtype=np.int32)
    max_len = _round_up(int(lens.max()), pad_to_multiple)
    n = len(idx_list)
    index = np.zeros((n, max_len), dtype=np.int32)
    valid = np.zeros((n, max_len), dtype=bool)
    for i, ids in enumerate(idx_list):
        index[i, : ids.size] = ids
        valid[i, : ids.size] = True
    # Inverse permutation: flat slot position for each token.
    slot = np.arange(n * max_len, dtype=np.int32).reshape(n, max_len)
    inverse = np.empty(t * h * w, dtype=np.int32)
    inverse[index[valid]] = slot[valid]
    return WindowPlan(index, valid, inverse, shapes, lens)
