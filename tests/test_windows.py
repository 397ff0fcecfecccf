"""Window partition parity vs the reference's pure-math window module
(loaded directly from /root/reference — it has no heavy deps), plus
gather/scatter plan invariants."""

import importlib.util

import numpy as np
import pytest

from seedvr2_tpu.models.dit import windows as W

REF = "/root/reference/src/models/dit_3b/window.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_window", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF_MOD = _load_ref()

SIZES = [
    (1, 32, 32),  # 512x512 image latent after patch (64x64 latent /2)
    (2, 45, 80),  # 5-frame 720p
    (5, 68, 120),  # 1080p clip
    (2, 135, 240),  # 4K
    (8, 17, 31),  # odd shapes
    (1, 8, 8),  # tiny (windows >= dims)
]


@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("shifted", [False, True])
def test_window_slices_match_reference(size, shifted):
    ours = (W.make_shifted_windows if shifted else W.make_windows)(size, (4, 3, 3))
    ref_fn = (
        REF_MOD.make_shifted_720Pwindows_bysize if shifted else REF_MOD.make_720Pwindows_bysize
    )
    theirs = ref_fn(size, (4, 3, 3))
    assert ours == theirs


@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("shifted", [False, True])
def test_plan_partitions_exactly(size, shifted):
    plan = W.window_plan(size, (4, 3, 3), shifted)
    t, h, w = size
    L = t * h * w
    # every token appears exactly once among valid slots
    tokens = plan.index[plan.valid]
    assert tokens.size == L
    assert np.array_equal(np.sort(tokens), np.arange(L))
    # inverse round-trips
    flat_slots = np.full(plan.n_win * plan.max_len, -1, np.int64)
    flat_slots[plan.valid.reshape(-1)] = plan.index[plan.valid]
    recovered = flat_slots[plan.inverse]
    assert np.array_equal(recovered, np.arange(L))
    # shapes match lens
    assert all(np.prod(s) == l for s, l in zip(plan.shapes, plan.lens))


def test_window_sizes_are_resolution_independent():
    """720p normalization: spatial window token size stays ~15x27 across
    resolutions (SURVEY.md: windows computed in 720p-normalized units)."""
    for size in [(2, 45, 80), (2, 90, 160), (2, 135, 240)]:
        wt, wh, ww = W.window_sizes_720p(size, (4, 3, 3))
        assert (wh, ww) == (15, 27)


def test_pad_to_multiple():
    plan = W.window_plan((2, 45, 80), (4, 3, 3), False, pad_to_multiple=128)
    assert plan.max_len % 128 == 0
