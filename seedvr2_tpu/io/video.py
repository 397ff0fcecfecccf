"""Host-side video / image I/O.

Mirrors the reference CLI's I/O layer (reference: inference_cli.py:142-209
FFMPEGVideoWriter 10-bit x265, :469-824 cv2 capture + PNG writer,
:621-719 streaming chunk generator). Decode/encode stay on host CPU — the
TPU only sees float arrays.
"""

from __future__ import annotations

import os
import subprocess
from typing import Generator, Iterator, List, Optional, Tuple

import numpy as np

from . import frameops

VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v", ".flv", ".wmv", ".gif"}
IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".tif", ".webp"}


def input_type(path: str) -> str:
    """'video' | 'image' | 'directory' (reference: get_input_type,
    inference_cli.py:346-373)."""
    if os.path.isdir(path):
        return "directory"
    ext = os.path.splitext(path)[1].lower()
    if ext in VIDEO_EXTS:
        return "video"
    if ext in IMAGE_EXTS:
        return "image"
    raise ValueError(f"Unsupported input: {path}")


def read_image(path: str) -> np.ndarray:
    """[H, W, 3|4] float32 in [0, 1], RGB(A)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    if img.dtype == np.uint8:
        return frameops.u8_to_f32_rgb(img, swap_rb=True)
    if img.shape[2] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    maxv = 65535.0 if img.dtype == np.uint16 else 255.0
    return img.astype(np.float32) / maxv


def write_image(path: str, frame01: np.ndarray) -> None:
    """frame01: [H, W, 3|4] float32 in [0,1], uint8, or uint16 (packed)."""
    import cv2

    img = frameops.to_u8(frame01)
    if img.shape[2] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_RGBA2BGRA)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, img)


def _concat_t(a, b):
    """Temporal concat for ndarray frames or PlanarYUV420 planes."""
    from ..ops.yuv import PlanarYUV420, is_planar

    if is_planar(a):
        return PlanarYUV420(
            np.concatenate([a.y, b.y], axis=0),
            np.concatenate([a.u, b.u], axis=0),
            np.concatenate([a.v, b.v], axis=0),
            a.depth,
        )
    return np.concatenate([a, b], axis=0)


def _copy_t(a):
    from ..ops.yuv import is_planar

    return a.tmap(np.copy) if is_planar(a) else a.copy()


class VideoReader:
    def __init__(self, path: str, dtype=np.float32):
        """``dtype=np.uint8`` returns raw decoder bytes (RGB order, no host
        float conversion) — the pipeline scales them on device
        (ops/resize.py:to_f01), so the uplink carries 1 B/px instead of 4
        and the per-frame host astype/divide disappears."""
        import cv2

        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise FileNotFoundError(path)
        self.dtype = np.dtype(dtype)
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.total_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    def seek(self, frame_idx: int) -> None:
        import cv2

        self.cap.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)

    def read(self, n: Optional[int] = None) -> np.ndarray:
        """Read up to n frames -> [T, H, W, 3] RGB: float32 [0,1] by
        default, raw uint8 when constructed with dtype=np.uint8."""
        import cv2

        u8 = self.dtype == np.uint8
        frames = []
        while n is None or len(frames) < n:
            ok, frame = self.cap.read()
            if not ok:
                break
            # BGR -> RGB; the reversed view is materialized by np.stack.
            frames.append(frame[..., ::-1] if u8
                          else frameops.u8_to_f32_rgb(frame, swap_rb=True))
        if not frames:
            return np.zeros((0, self.height, self.width, 3), self.dtype)
        return np.stack(frames)

    def chunks(self, chunk_size: int, overlap: int = 0) -> Iterator[np.ndarray]:
        """Streaming chunk generator with overlap carry (reference:
        _stream_video_chunks, inference_cli.py:621-719)."""
        carry: Optional[np.ndarray] = None
        while True:
            need = chunk_size - (len(carry) if carry is not None else 0)
            fresh = self.read(need)
            if carry is not None and len(carry) > 0:
                chunk = _concat_t(carry, fresh) if len(fresh) else carry
            else:
                chunk = fresh
            if len(chunk) == 0:
                return
            if carry is not None and len(fresh) == 0:
                # Nothing new: the would-be chunk is exactly the carried
                # overlap, whose frames were already yielded last time.
                return
            yield chunk
            if len(fresh) < need:
                return
            carry = _copy_t(chunk[-overlap:]) if overlap > 0 else None

    def close(self):
        self.cap.release()


def have_ffprobe() -> bool:
    import shutil

    return shutil.which("ffprobe") is not None


def _parse_ffprobe_stream(stream: dict) -> dict:
    """Normalize one ffprobe video-stream dict: width/height/fps/frames and
    the source bit depth parsed from pix_fmt (yuv420p10le -> 10)."""
    import re

    num, _, den = (stream.get("r_frame_rate") or "30/1").partition("/")
    fps = float(num) / float(den or 1) if float(den or 1) else 30.0
    nb = stream.get("nb_frames")
    if nb in (None, "N/A"):
        nb = stream.get("nb_read_packets")
    pix = stream.get("pix_fmt") or "yuv420p"
    m = re.search(r"(\d+)(le|be)$", pix)
    bits = int(m.group(1)) if m else 8
    return {
        "width": int(stream["width"]),
        "height": int(stream["height"]),
        "fps": fps,
        "total_frames": int(nb) if nb not in (None, "N/A") else 0,
        "bits": bits,
        "pix_fmt": pix,
    }


def _ffprobe(path: str) -> dict:
    import json

    out = subprocess.run(
        [
            "ffprobe", "-v", "error", "-select_streams", "v:0",
            "-count_packets",
            "-show_entries",
            "stream=width,height,r_frame_rate,nb_frames,nb_read_packets,pix_fmt",
            "-of", "json", path,
        ],
        capture_output=True, check=True,
    )
    streams = json.loads(out.stdout)["streams"]
    if not streams:
        raise ValueError(f"no video stream in {path}")
    return _parse_ffprobe_stream(streams[0])


class FFmpegReader:
    """ffmpeg-subprocess video reader — the ``--video_backend ffmpeg``
    choice (reference flag: inference_cli.py:1354; there it selects the
    WRITER — the reference reads through cv2 only). Unlike cv2's 8-bit BGR
    decode, >8-bit sources (yuv420p10le x265 etc.) decode losslessly to
    uint16 rgb48le frames, feeding the pipeline's 16-bit device path
    (ops/resize.py:to_f01 scales uint16 in-program) — so 10-bit input
    survives end-to-end to the 10-bit x265 output.

    Same interface as VideoReader. ``dtype=np.uint8`` means "raw packed
    decoder output": uint8 for 8-bit sources, uint16 for deeper ones.

    ``planar=True``: when the source is yuv420-family (every h264/h265 mp4
    is), skip the decoder-side swscale pass entirely and hand back
    PlanarYUV420 codec planes — the device does the colorspace conversion
    (ops/yuv.py) and the host link carries 1.5 B/px instead of 3. Falls
    back to RGB automatically for non-420 sources; ``self.planar`` says
    which mode is live."""

    def __init__(self, path: str, dtype=np.float32, planar: bool = False):
        self.path = path
        meta = _ffprobe(path)
        self.width, self.height = meta["width"], meta["height"]
        self.fps = meta["fps"] or 30.0
        self.total_frames = meta["total_frames"]
        self.bits = meta["bits"]
        self._u16 = self.bits > 8
        self.planar = bool(
            planar
            and meta["pix_fmt"].startswith("yuv420p")
            and self.bits in (8, 10)
            and self.width % 2 == 0
            and self.height % 2 == 0
        )
        self._packed = np.dtype(dtype) == np.uint8
        self.dtype = (
            np.dtype(np.uint16 if self._u16 else np.uint8)
            if self._packed
            else np.dtype(dtype)
        )
        self._start = 0
        self.proc: Optional[subprocess.Popen] = None

    def _spawn(self):
        if self.planar:
            pix = "yuv420p10le" if self._u16 else "yuv420p"
        else:
            pix = "rgb48le" if self._u16 else "rgb24"
        cmd = ["ffmpeg", "-loglevel", "error", "-i", self.path]
        if self._start:
            # frame-exact seek: drop the first N decoded frames (cv2 parity
            # with CAP_PROP_POS_FRAMES; -ss timestamp seeks can be off by
            # a frame at fractional rates)
            cmd += ["-vf", f"select=gte(n\\,{self._start})", "-fps_mode", "passthrough"]
        cmd += ["-f", "rawvideo", "-pix_fmt", pix, "-"]
        self.proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)

    def seek(self, frame_idx: int) -> None:
        self._start = int(frame_idx)
        if self.proc is not None:
            self.proc.kill()
            self.proc = None

    def read(self, n: Optional[int] = None):
        if self.proc is None:
            self._spawn()
        raw = np.uint16 if self._u16 else np.uint8
        if self.planar:
            return self._read_planar(n, raw)
        frame_bytes = self.width * self.height * 3 * np.dtype(raw).itemsize
        frames = []
        while n is None or len(frames) < n:
            buf = self.proc.stdout.read(frame_bytes)
            if buf is None or len(buf) < frame_bytes:
                break
            frames.append(
                np.frombuffer(buf, raw).reshape(self.height, self.width, 3)
            )
        if not frames:
            return np.zeros((0, self.height, self.width, 3), self.dtype)
        out = np.stack(frames)
        if self._packed:
            return out
        scale = 65535.0 if self._u16 else 255.0
        return out.astype(np.float32) / scale

    def _read_planar(self, n: Optional[int], raw):
        from ..ops.yuv import PlanarYUV420

        h, w = self.height, self.width
        isz = np.dtype(raw).itemsize
        ybytes, cbytes = h * w * isz, (h // 2) * (w // 2) * isz
        ys, us, vs = [], [], []
        while n is None or len(ys) < n:
            buf = self.proc.stdout.read(ybytes + 2 * cbytes)
            if buf is None or len(buf) < ybytes + 2 * cbytes:
                break
            ys.append(np.frombuffer(buf, raw, h * w).reshape(h, w))
            us.append(
                np.frombuffer(buf, raw, (h // 2) * (w // 2), ybytes)
                .reshape(h // 2, w // 2)
            )
            vs.append(
                np.frombuffer(buf, raw, (h // 2) * (w // 2), ybytes + cbytes)
                .reshape(h // 2, w // 2)
            )
        if not ys:
            z = np.zeros((0, h, w), raw)
            zc = np.zeros((0, h // 2, w // 2), raw)
            return PlanarYUV420(z, zc, zc, self.bits)
        return PlanarYUV420(
            np.stack(ys), np.stack(us), np.stack(vs), self.bits
        )

    chunks = VideoReader.chunks  # same streaming-overlap generator

    def close(self):
        if self.proc is not None:
            self.proc.kill()
            self.proc = None


def make_video_reader(path: str, dtype=np.float32, backend: str = "auto",
                      planar: bool = False):
    """Reader factory honoring --video_backend (reference:
    inference_cli.py:1354): 'opencv' -> cv2; 'ffmpeg' -> FFmpegReader
    (errors if ffmpeg is absent, like the reference's check :1536); 'auto'
    -> ffmpeg when it unlocks a >8-bit source or native planar feeding
    (``planar=True`` and a yuv420 source), else cv2."""
    if backend in ("opencv", "cv2"):
        return VideoReader(path, dtype)
    if backend == "ffmpeg":
        if not (have_ffmpeg() and have_ffprobe()):
            raise RuntimeError(
                "--video_backend ffmpeg requires ffmpeg+ffprobe in PATH"
            )
        return FFmpegReader(path, dtype, planar=planar)
    if have_ffmpeg() and have_ffprobe():
        try:
            meta = _ffprobe(path)
            if meta["bits"] > 8 or (
                planar and meta["pix_fmt"].startswith("yuv420p")
            ):
                return FFmpegReader(path, dtype, planar=planar)
        except Exception:
            pass
    return VideoReader(path, dtype)


class FFmpegWriter:
    """10-bit x265 encode via ffmpeg subprocess (reference:
    FFMPEGVideoWriter, inference_cli.py:142-209)."""

    def __init__(
        self,
        path: str,
        width: int,
        height: int,
        fps: float,
        codec: str = "libx265",
        crf: int = 16,
        bit10: bool = True,
        audio_source: Optional[str] = None,
        planar_in: bool = False,
    ):
        """``planar_in=True``: frames arrive as PlanarYUV420 (the device
        packed the sink's native planes, ops/yuv.py) and stream into ffmpeg
        raw — no host colorspace pass and half the pipe bytes. The plane
        depth must match ``bit10`` (8 -> yuv420p, 10 -> yuv420p10le)."""
        if planar_in:
            pix_in = "yuv420p10le" if bit10 else "yuv420p"
        else:
            pix_in = "rgb48le" if bit10 else "rgb24"
        pix_out = "yuv420p10le" if bit10 else "yuv420p"
        self.bit10 = bit10
        self.planar_in = planar_in
        cmd = [
            "ffmpeg", "-y", "-loglevel", "error",
            "-f", "rawvideo", "-pix_fmt", pix_in,
            "-s", f"{width}x{height}", "-r", f"{fps}",
            "-i", "-",
        ]
        if audio_source:
            cmd += ["-i", audio_source, "-map", "0:v", "-map", "1:a?", "-c:a", "copy"]
        cmd += ["-c:v", codec, "-crf", str(crf), "-pix_fmt", pix_out, path]
        self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)

    def write(self, frames01) -> None:
        """frames01: [T, H, W, 3] float in [0,1], uint8, or uint16 — the
        packed dtypes stream straight into ffmpeg with no float pass.
        With planar_in, a PlanarYUV420 whose bytes pipe through raw."""
        from ..ops.yuv import is_planar

        if is_planar(frames01):
            if not self.planar_in:
                raise ValueError("writer was not constructed with planar_in")
            data = frames01.to_numpy()
        elif self.bit10:
            data = frameops.to_u16(frames01)
        else:
            data = frameops.to_u8(frames01)
        try:
            self.proc.stdin.write(data.tobytes())
        except BrokenPipeError as e:
            raise RuntimeError("ffmpeg pipe closed (encode error)") from e

    def close(self) -> None:
        if self.proc.stdin:
            self.proc.stdin.close()
        ret = self.proc.wait()
        if ret != 0:
            raise RuntimeError(f"ffmpeg exited with {ret}")


class CV2Writer:
    """8-bit mp4 fallback when ffmpeg is unavailable (the reference requires
    ffmpeg for video output; we degrade gracefully instead)."""

    def __init__(self, path: str, width: int, height: int, fps: float, **_kw):
        import cv2

        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(path, fourcc, fps, (width, height))

    def write(self, frames01) -> None:
        import cv2

        from ..ops.yuv import is_planar, yuv420_to_rgb01_np

        if is_planar(frames01):  # degraded sink: convert planes on host
            frames01 = yuv420_to_rgb01_np(frames01.to_numpy())
        for f in frames01:
            bgr = cv2.cvtColor(frameops.to_u8(f), cv2.COLOR_RGB2BGR)
            self.writer.write(bgr)

    def close(self) -> None:
        self.writer.release()


def have_ffmpeg() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def make_video_writer(path: str, width: int, height: int, fps: float,
                      backend: str = "auto", **kw):
    """Writer factory: 10-bit x265 via ffmpeg when present, else 8-bit cv2
    mp4. ``backend`` honors --video_backend like the reference
    (inference_cli.py:741-783): 'opencv' forces cv2, 'ffmpeg' requires
    ffmpeg."""
    if backend in ("opencv", "cv2"):
        return CV2Writer(path, width, height, fps)
    if backend == "ffmpeg" and not have_ffmpeg():
        raise RuntimeError("--video_backend ffmpeg requires ffmpeg in PATH")
    if have_ffmpeg():
        return FFmpegWriter(path, width, height, fps, **kw)
    return CV2Writer(path, width, height, fps)


def write_png_sequence(directory: str, frames01: np.ndarray, start_index: int = 0, prefix: str = "frame") -> None:
    """reference: save_frames_to_image, inference_cli.py:786-824."""
    os.makedirs(directory, exist_ok=True)
    for i, f in enumerate(frames01):
        write_image(os.path.join(directory, f"{prefix}_{start_index + i:06d}.png"), f)
