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


# --------------------------------------------------------------------------- #
# ffmpeg reader backend (--video_backend; VERDICT r4 #8)
# --------------------------------------------------------------------------- #

_has_ffmpeg = V.have_ffmpeg() and V.have_ffprobe()


def test_ffprobe_stream_parsing():
    """Metadata normalization incl. bit depth from pix_fmt (no ffmpeg
    binary needed — pure parsing)."""
    s = {
        "width": 640, "height": 360, "r_frame_rate": "30000/1001",
        "nb_frames": "145", "pix_fmt": "yuv420p10le",
    }
    m = V._parse_ffprobe_stream(s)
    assert m["width"] == 640 and m["height"] == 360
    assert abs(m["fps"] - 29.97) < 0.01
    assert m["total_frames"] == 145
    assert m["bits"] == 10
    # 8-bit + packet-count fallback
    m8 = V._parse_ffprobe_stream(
        {"width": 16, "height": 16, "r_frame_rate": "25/1",
         "nb_frames": "N/A", "nb_read_packets": "7", "pix_fmt": "yuv420p"}
    )
    assert m8["bits"] == 8 and m8["total_frames"] == 7


def test_make_video_reader_backend_selection(tmp_path):
    frames = (np.random.RandomState(0).rand(3, 16, 16, 3) > 0.5).astype(np.float32)
    path = str(tmp_path / "sel.mp4")
    w = V.make_video_writer(path, 16, 16, 10.0)
    w.write(frames)
    w.close()
    r = V.make_video_reader(path, backend="opencv")
    assert isinstance(r, V.VideoReader)
    r.close()
    if not _has_ffmpeg:
        with pytest.raises(RuntimeError):
            V.make_video_reader(path, backend="ffmpeg")
        # auto degrades to cv2
        r = V.make_video_reader(path, backend="auto")
        assert isinstance(r, V.VideoReader)
        r.close()


@pytest.mark.skipif(not _has_ffmpeg, reason="ffmpeg/ffprobe not in PATH")
def test_ffmpeg_reader_matches_cv2_on_8bit(tmp_path):
    frames = (np.random.RandomState(1).rand(5, 20, 24, 3) > 0.5).astype(np.float32)
    path = str(tmp_path / "ab.mp4")
    w = V.make_video_writer(path, 24, 20, 10.0)
    w.write(frames)
    w.close()
    a = V.VideoReader(path)
    b = V.FFmpegReader(path)
    fa, fb = a.read(), b.read()
    a.close(); b.close()
    assert fa.shape == fb.shape
    assert float(np.abs(fa - fb).mean()) < 0.02  # same decode, codec noise only


@pytest.mark.skipif(not _has_ffmpeg, reason="ffmpeg/ffprobe not in PATH")
def test_ffmpeg_reader_10bit_roundtrip(tmp_path):
    """A synthetic 10-bit x265 gradient must decode to uint16 with more
    than 256 distinct levels — the >8-bit input path the cv2 reader cannot
    provide (reference reads 8-bit only)."""
    import subprocess

    t, h, w = 3, 32, 64
    grad = np.linspace(0, 65535, w, dtype=np.uint16)
    frames = np.broadcast_to(grad[None, None, :, None], (t, h, w, 3)).copy()
    path = str(tmp_path / "ten.mp4")
    p = subprocess.Popen(
        ["ffmpeg", "-y", "-loglevel", "error", "-f", "rawvideo",
         "-pix_fmt", "rgb48le", "-s", f"{w}x{h}", "-r", "10", "-i", "-",
         "-c:v", "libx265", "-crf", "1", "-pix_fmt", "yuv420p10le", path],
        stdin=subprocess.PIPE,
    )
    p.stdin.write(frames.tobytes()); p.stdin.close()
    assert p.wait() == 0
    r = V.make_video_reader(path, dtype=np.uint8, backend="auto")  # packed
    assert isinstance(r, V.FFmpegReader) and r.bits == 10
    out = r.read()
    r.close()
    assert out.dtype == np.uint16 and out.shape == (t, h, w, 3)
    assert len(np.unique(out[0, :, :, 1])) > 256  # true >8-bit levels survive


@pytest.mark.skipif(not _has_ffmpeg, reason="ffmpeg/ffprobe not in PATH")
def test_ffmpeg_reader_seek_and_chunks(tmp_path):
    frames = np.zeros((10, 16, 16, 3), np.float32)
    for i in range(10):
        frames[i] = i / 9.0
    path = str(tmp_path / "seek.mp4")
    w = V.make_video_writer(path, 16, 16, 10.0)
    w.write(frames)
    w.close()
    r = V.FFmpegReader(path)
    r.seek(4)
    out = r.read(2)
    r.close()
    assert out.shape[0] == 2
    assert abs(float(out[0].mean()) - 4 / 9.0) < 0.05  # frame-exact seek
