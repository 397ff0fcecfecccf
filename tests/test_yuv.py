"""Native yuv420p link path: conversion math, planar pipeline input,
planar packed output (monolithic + chunked), and the video IO round trip.

The reference does both colorspace conversions on HOST (cv2 decode to
BGR, ffmpeg rawvideo RGB encode — /root/reference/inference_cli.py:469-
575, 640-713); here they run on-device so the host link carries the
codec's native 1.5 B/px planes (ops/yuv.py)."""

import dataclasses
import os
import shutil
import subprocess

import jax
import numpy as np
import pytest

from seedvr2_tpu.ops import yuv
from seedvr2_tpu.pipeline import phases

from test_pipeline import _chunked_runner, _frames, _make_runner


def _smooth(t=2, h=32, w=40, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.rand(t, h, w, 3).astype(np.float32)
    # separable box blur so chroma subsampling loses little (tight bounds)
    for axis in (1, 2):
        for _ in range(4):
            x = (x + np.roll(x, 1, axis) + np.roll(x, -1, axis)) / 3.0
    return np.clip(x, 0.0, 1.0)


class TestConversionMath:
    def test_device_matches_numpy_twin(self):
        rgb = np.random.RandomState(0).rand(3, 16, 20, 3).astype(np.float32)
        pj = jax.device_get(yuv.rgb01_to_yuv420(rgb))
        pn = yuv.rgb01_to_yuv420_np(rgb)
        for a, b in ((pj.y, pn.y), (pj.u, pn.u), (pj.v, pn.v)):
            np.testing.assert_array_equal(np.asarray(a), b)
        rj = np.asarray(yuv.yuv420_to_rgb01(pn))
        rn = yuv.yuv420_to_rgb01_np(pn)
        np.testing.assert_allclose(rj, rn, atol=1e-5)

    def test_bt601_anchor_codes(self):
        black = np.zeros((1, 4, 4, 3), np.float32)
        white = np.ones((1, 4, 4, 3), np.float32)
        pb = yuv.rgb01_to_yuv420_np(black)
        pw = yuv.rgb01_to_yuv420_np(white)
        assert int(pb.y[0, 0, 0]) == 16 and int(pw.y[0, 0, 0]) == 235
        for p in (pb, pw):  # achromatic -> centered chroma
            assert int(p.u[0, 0, 0]) == 128 and int(p.v[0, 0, 0]) == 128

    def test_10bit_codes_scale(self):
        white = np.ones((1, 4, 4, 3), np.float32)
        p = yuv.rgb01_to_yuv420_np(white, depth=10)
        assert p.y.dtype == np.uint16 and int(p.y[0, 0, 0]) == 940
        assert int(p.u[0, 0, 0]) == 512
        rt = yuv.yuv420_to_rgb01_np(p)
        np.testing.assert_allclose(rt, white, atol=2e-3)

    def test_roundtrip_smooth_image(self):
        rgb = _smooth()
        rt = yuv.yuv420_to_rgb01_np(yuv.rgb01_to_yuv420_np(rgb))
        # the _smooth blur wraps (np.roll), so edges keep some chroma
        # detail; interior + edges stay under the subsample bound
        assert np.abs(rt - rgb).max() < 0.05

    def test_cv2_cross_check_luma(self):
        cv2 = pytest.importorskip("cv2")
        rgb = (_smooth(t=1) * 255).astype(np.uint8)
        ours = yuv.rgb01_to_yuv420_np(rgb.astype(np.float32) / 255.0)
        theirs = cv2.cvtColor(rgb[0], cv2.COLOR_RGB2YUV_I420)
        h = rgb.shape[1]
        np.testing.assert_allclose(
            ours.y[0].astype(np.int32), theirs[:h].astype(np.int32), atol=2
        )

    def test_planar_container_ops(self):
        p = yuv.rgb01_to_yuv420_np(_smooth(t=5))
        assert p.shape == (5, 32, 40, 3) and len(p) == 5
        s = p[1:4]
        assert len(s) == 3 and s.u.shape == (3, 16, 20)
        leaves, treedef = jax.tree_util.tree_flatten(p)
        assert len(leaves) == 3
        p2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert p2.depth == 8


class TestPipelinePlanar:
    def test_planar_input_matches_rgb_input(self):
        """Feeding native planes must reproduce the RGB path when the RGB
        frames are the planes' own host conversion — the device conversion
        (jax) and the host twin (np) agree to ~1e-5, and floats cross the
        link as f16, so the outputs track within f16 resolution."""
        runner, cfg = _make_runner()
        planes = yuv.rgb01_to_yuv420_np(_frames(t=5, h=24, w=20))
        rgb = yuv.yuv420_to_rgb01_np(planes).astype(np.float32)
        out_rgb = phases.generate(runner, rgb, cfg)
        out_planar = phases.generate(runner, planes, cfg)
        assert out_planar.shape == out_rgb.shape
        np.testing.assert_allclose(out_planar, out_rgb, atol=5e-3)

    def test_planar_input_4phase_fallback(self):
        """fused_pipeline=off: planar input converts on host up front and
        runs the reference-shaped 4-phase path."""
        runner, cfg = _make_runner(fused_pipeline="off")
        planes = yuv.rgb01_to_yuv420_np(_frames(t=5, h=24, w=20))
        out = phases.generate(runner, planes, cfg)
        assert out.shape[0] == 5 and np.isfinite(out).all()

    def test_planar_output_monolithic(self):
        """output_pixfmt=yuv420 + packed: the fused program packs the
        sink's native planes; they decode to the RGB path's frames."""
        runner, cfg = _make_runner(output_pixfmt="yuv420", output_bits=8)
        frames = _frames(t=5, h=24, w=20, seed=7)
        out = phases.generate(runner, frames, cfg, packed=True)
        assert yuv.is_planar(out) and out.depth == 8
        assert out.shape[0] == 5 and out.y.dtype == np.uint8

        runner.cfg = dataclasses.replace(cfg, output_pixfmt="rgb")
        runner.invalidate_compiled()
        ref = phases.generate(runner, frames, runner.cfg, packed=True)
        got = yuv.yuv420_to_rgb01_np(out)
        want = yuv.yuv420_to_rgb01_np(
            yuv.rgb01_to_yuv420_np(ref.astype(np.float32) / 255.0)
        )
        np.testing.assert_allclose(got, want, atol=3.0 / 255)

    def test_planar_output_unpacked_returns_float_rgb(self):
        runner, cfg = _make_runner(output_pixfmt="yuv420", output_bits=8)
        out = phases.generate(runner, _frames(t=5, h=24, w=20), cfg)
        assert isinstance(out, np.ndarray) and out.dtype == np.float32

    def test_planar_output_chunked_matches_monolithic(self):
        """Per-chunk plane packing must equal whole-frame packing: emit
        boundaries are even, so neighbouring chunks' 2x2 chroma blocks are
        disjoint (Runner._yuv_chunks_ok)."""
        runner, cfg = _chunked_runner("wavelet")
        cfg = dataclasses.replace(cfg, output_pixfmt="yuv420", output_bits=8)
        runner.cfg = cfg
        runner.invalidate_compiled()
        frames = _frames(t=5, h=24, w=96, seed=11)
        plan = runner.supports_chunked((5, 24, 96, 3), 64, 256)
        assert plan is not None
        if not runner._yuv_chunks_ok(plan, 64):
            pytest.skip("grid emits odd columns; yuv chunking gated off")
        chunked = phases.generate(runner, frames, cfg, packed=True)
        assert yuv.is_planar(chunked)

        runner.cfg = dataclasses.replace(cfg, chunked_output="off")
        runner.invalidate_compiled()
        mono = phases.generate(runner, frames, runner.cfg, packed=True)
        assert yuv.is_planar(mono)
        for a, b in ((chunked.y, mono.y), (chunked.u, mono.u), (chunked.v, mono.v)):
            np.testing.assert_allclose(
                a.astype(np.int32), b.astype(np.int32), atol=1
            )

    def test_odd_geometry_falls_back_to_rgb(self):
        """Odd output width: the pack gate must refuse planar and return
        classic packed RGB."""
        runner, cfg = _make_runner(output_pixfmt="yuv420", output_bits=8)
        cfg = dataclasses.replace(cfg, resolution=30)  # odd-ish target
        runner.cfg = cfg
        runner.invalidate_compiled()
        out = phases.generate(runner, _frames(t=5, h=24, w=21), cfg, packed=True)
        if yuv.is_planar(out):  # geometry happened to be even after pad
            assert out.shape[1] % 2 == 0 and out.shape[2] % 2 == 0
        else:
            assert out.dtype == np.uint8 and out.shape[-1] == 3


def _have_ffmpeg():
    return shutil.which("ffmpeg") and shutil.which("ffprobe")


@pytest.mark.skipif(not _have_ffmpeg(), reason="ffmpeg not installed")
class TestVideoIOPlanar:
    def _write_yuv_clip(self, path, frames01, fps=24):
        from seedvr2_tpu.io.video import FFmpegWriter

        w = FFmpegWriter(
            path, frames01.shape[2], frames01.shape[1], fps,
            codec="libx264", crf=0, bit10=False, planar_in=True,
        )
        w.write(yuv.rgb01_to_yuv420_np(frames01))
        w.close()

    def test_planar_write_read_roundtrip(self, tmp_path):
        from seedvr2_tpu.io.video import FFmpegReader

        src = _smooth(t=4, h=48, w=64, seed=5)
        path = str(tmp_path / "clip.mp4")
        self._write_yuv_clip(path, src)
        r = FFmpegReader(path, dtype=np.uint8, planar=True)
        assert r.planar
        got = r.read()
        r.close()
        assert yuv.is_planar(got) and len(got) == 4
        rt = yuv.yuv420_to_rgb01_np(got)
        # crf=0 x264 is lossless in yuv: only our own 420 subsample remains
        assert np.abs(rt - src).max() < 0.05

    def test_planar_reader_chunks_overlap(self, tmp_path):
        from seedvr2_tpu.io.video import FFmpegReader

        src = _smooth(t=6, h=32, w=32, seed=9)
        path = str(tmp_path / "clip.mp4")
        self._write_yuv_clip(path, src)
        r = FFmpegReader(path, dtype=np.uint8, planar=True)
        chunks = list(r.chunks(4, overlap=1))
        r.close()
        assert [len(c) for c in chunks] == [4, 3]
        np.testing.assert_array_equal(chunks[0].y[-1], chunks[1].y[0])

    def test_reader_factory_auto_planar(self, tmp_path):
        from seedvr2_tpu.io.video import make_video_reader

        path = str(tmp_path / "clip.mp4")
        self._write_yuv_clip(path, _smooth(t=2, h=32, w=32))
        r = make_video_reader(path, dtype=np.uint8, backend="auto", planar=True)
        assert getattr(r, "planar", False)
        r.close()
        r2 = make_video_reader(path, dtype=np.uint8, backend="auto")
        assert not getattr(r2, "planar", False)
        r2.close()
