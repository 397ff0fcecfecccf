"""Streaming resume manifest behaviour."""

import os

import numpy as np

from seedvr2_tpu.io import video as V
from seedvr2_tpu.io.resume import ResumeManifest


def _mk_input(tmp_path):
    p = str(tmp_path / "in.mp4")
    frames = (np.random.RandomState(0).rand(8, 16, 16, 3) > 0.5).astype(np.float32)
    w = V.make_video_writer(p, 16, 16, 10.0)
    w.write(frames)
    w.close()
    return p


def test_manifest_roundtrip(tmp_path):
    inp = _mk_input(tmp_path)
    out = str(tmp_path / "out.mp4")
    m = ResumeManifest(out, inp, total_frames=8, chunk_size=4)
    assert m.chunks_done == 0

    # write segment 0
    seg = m.segment_path(0)
    w = V.make_video_writer(seg, 16, 16, 10.0)
    w.write(np.zeros((4, 16, 16, 3), np.float32))
    w.close()
    m.mark_done(0, seg)

    # reload matches
    m2 = ResumeManifest.load_if_matching(out, inp, 8, 4)
    assert m2 is not None and m2.chunks_done == 1 and m2.frames_done == 4

    # mismatched chunk size -> no resume
    assert ResumeManifest.load_if_matching(out, inp, 8, 5) is None

    # finish and finalize
    seg1 = m2.segment_path(1)
    w = V.make_video_writer(seg1, 16, 16, 10.0)
    w.write(np.ones((4, 16, 16, 3), np.float32))
    w.close()
    m2.mark_done(1, seg1)
    final = m2.finalize()
    assert os.path.exists(final)
    # without ffmpeg segments are kept; with ffmpeg they are concatenated
    r = V.VideoReader(final)
    assert r.total_frames in (4, 8)
    r.close()
