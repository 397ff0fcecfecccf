"""Host video/image I/O: cv2 round trips, chunked streaming, input typing."""

import os

import numpy as np
import pytest

from seedvr2_tpu.io import video as V


def test_input_type(tmp_path):
    assert V.input_type(str(tmp_path)) == "directory"
    assert V.input_type("a.mp4") == "video"
    assert V.input_type("a.PNG") == "image"
    with pytest.raises(ValueError):
        V.input_type("a.txt")


def test_image_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(16, 20, 3).astype(np.float32)
    p = str(tmp_path / "x.png")
    V.write_image(p, img)
    back = V.read_image(p)
    assert back.shape == (16, 20, 3)
    assert np.abs(back - img).max() < 1.0 / 255 + 1e-6


def test_rgba_image_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.rand(8, 8, 4).astype(np.float32)
    p = str(tmp_path / "x.png")
    V.write_image(p, img)
    back = V.read_image(p)
    assert back.shape == (8, 8, 4)
    assert np.abs(back - img).max() < 1.0 / 255 + 1e-6


def test_video_roundtrip_and_chunks(tmp_path):
    rng = np.random.RandomState(2)
    frames = (rng.rand(12, 32, 48, 3) > 0.5).astype(np.float32)  # high-contrast
    p = str(tmp_path / "v.mp4")
    w = V.make_video_writer(p, 48, 32, 10.0)
    w.write(frames)
    w.close()
    assert os.path.getsize(p) > 0

    r = V.VideoReader(p)
    assert r.total_frames == 12
    chunks = list(r.chunks(5, overlap=2))
    r.close()
    # chunk boundaries: [0:5], carry 2 -> [3:8], [6:11], [9:12]
    assert [len(c) for c in chunks][0] == 5
    total_unique = sum(len(c) for c in chunks) - 2 * (len(chunks) - 1)
    assert total_unique == 12


def test_png_sequence(tmp_path):
    frames = np.zeros((3, 8, 8, 3), np.float32)
    d = str(tmp_path / "seq")
    V.write_png_sequence(d, frames, start_index=5)
    assert sorted(os.listdir(d)) == [
        "frame_000005.png",
        "frame_000006.png",
        "frame_000007.png",
    ]
