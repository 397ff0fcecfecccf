"""Batch index math, temporal padding, overlap blending
(reference semantics: generation_phases.py:271-404, generation_utils.py
:284-312, 560-657)."""

import numpy as np
import pytest

from seedvr2_tpu.ops.blending import blend_overlapping_frames, overlap_weights
from seedvr2_tpu.pipeline import batching as B


def test_compute_batches_no_overlap():
    specs = B.compute_batches(12, 5)
    assert [(s.start, s.end) for s in specs] == [(0, 5), (5, 10), (10, 12)]
    assert specs[-1].ori_length == 2


def test_compute_batches_overlap():
    # step = 5 - 2 = 3; batch fully inside overlap is dropped
    specs = B.compute_batches(11, 5, temporal_overlap=2)
    assert [(s.start, s.end) for s in specs] == [(0, 5), (3, 8), (6, 11)]
    # next start would be 9, end 11 -> 2 <= overlap -> dropped
    specs = B.compute_batches(13, 5, temporal_overlap=2)
    assert [(s.start, s.end) for s in specs] == [(0, 5), (3, 8), (6, 11), (9, 13)]


def test_uniform_padding():
    specs = B.compute_batches(12, 5, uniform_batch_size=True)
    assert specs[-1].uniform_padding == 3
    images = np.arange(12, dtype=np.float32).reshape(12, 1, 1, 1)
    v = B.prepare_batch(images, specs[-1])
    assert v.shape[0] == 5  # padded to batch_size (already 4n+1)
    # first two frames are the real ones
    np.testing.assert_array_equal(v[:2, 0, 0, 0], [10, 11])


def test_pad_to_4n1():
    for t, expect in [(1, 1), (4, 5), (5, 5), (6, 9), (12, 13), (13, 13)]:
        v = np.random.rand(t, 2, 2, 3).astype(np.float32)
        out = B.pad_to_4n1(v)
        assert out.shape[0] == expect
        np.testing.assert_array_equal(out[:t], v)


def test_pad_reversed_content():
    v = np.arange(6, dtype=np.float32).reshape(6, 1, 1, 1)
    out = B.pad_temporal_reversed(v, 3)
    # reversed frames: v[-4:-1] reversed = [4,3,2]
    np.testing.assert_array_equal(out[6:, 0, 0, 0], [4, 3, 2])
    pre = B.pad_temporal_reversed(v, 2, prepend=True)
    # v[1:3] reversed = [2,1]
    np.testing.assert_array_equal(pre[:2, 0, 0, 0], [2, 1])


def test_pad_exceeding_length():
    v = np.arange(3, dtype=np.float32).reshape(3, 1, 1, 1)
    out = B.pad_temporal_reversed(v, 5)  # count >= t: repeat + reverse
    assert out.shape[0] == 8
    np.testing.assert_array_equal(out[:3, 0, 0, 0], [0, 1, 2])


def test_optimal_batch_size():
    assert B.optimal_batch_size(7) == 5
    assert B.optimal_batch_size(13) == 13
    assert B.optimal_batch_size(3) == 1


def test_overlap_weights():
    w = overlap_weights(2)
    np.testing.assert_allclose(w, [1.0, 0.0])
    w = overlap_weights(9)
    assert w[0] == 1.0 and w[-1] == 0.0
    # Hann plateau: first third stays 1, last third 0
    assert np.all(w[:3] == 1.0) and np.all(w[-2:] == 0.0)


def test_blend_overlapping_frames():
    import jax.numpy as jnp

    prev = jnp.ones((4, 2, 2, 3))
    cur = jnp.zeros((4, 2, 2, 3))
    out = np.asarray(blend_overlapping_frames(prev, cur, 4))
    assert out[0].max() == 1.0 and out[-1].min() == 0.0


def test_split_frame_ranges():
    r = B.split_frame_ranges(100, 2, 4)
    assert r == [(0, 54), (50, 100)]
    r = B.split_frame_ranges(10, 3, 0)
    assert r == [(0, 4), (4, 7), (7, 10)]
