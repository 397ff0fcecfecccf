"""End-to-end pipeline on tiny models: the whole 4-phase stack runs and is
deterministic (SURVEY.md §4: determinism as oracle)."""

import jax
import numpy as np
import pytest

from seedvr2_tpu.config import PipelineConfig, dit_tiny, vae_tiny
from seedvr2_tpu.models.dit.nadit import init_params as init_dit
from seedvr2_tpu.models.vae.model import init_vae_params
from seedvr2_tpu.pipeline import phases
from seedvr2_tpu.pipeline.runner import Runner


def _make_runner(**cfg_kw):
    dit_cfg = dit_tiny()
    vae_cfg = vae_tiny()
    cfg = PipelineConfig(
        dit=dit_cfg,
        vae=vae_cfg,
        resolution=32,
        batch_size=5,
        compute_dtype="float32",
        **cfg_kw,
    )
    dit_params = init_dit(dit_cfg, jax.random.PRNGKey(0))
    vae_params = init_vae_params(vae_cfg, jax.random.PRNGKey(1))
    # tiny model latent: 4ch -> vid_in expects 2*4+1=9... the tiny dit uses
    # 33 input channels; match by overriding latent channels via vae_tiny(4):
    # condition = [noise(4) | blur(4) | mask(1)] = 9 -> need dit with 9 in.
    import dataclasses

    dit_cfg = dataclasses.replace(dit_cfg, vid_in_channels=2 * vae_cfg.latent_channels + 1,
                                  vid_out_channels=vae_cfg.latent_channels)
    cfg = dataclasses.replace(cfg, dit=dit_cfg)
    dit_params = init_dit(dit_cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    text = rng.randn(4, dit_cfg.txt_in_dim).astype(np.float32) * 0.1
    return Runner(cfg, dit_params, vae_params, text), cfg


@pytest.fixture(scope="module")
def runner_cfg():
    return _make_runner()


def _frames(t=7, h=24, w=20, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(t, h, w, c).astype(np.float32)


def test_generate_shape_and_range(runner_cfg):
    runner, cfg = runner_cfg
    frames = _frames()
    out = phases.generate(runner, frames)
    # resolution=32 on 24x20 input: shortest side 20 -> 32, h = round(24*1.6)=38->38//2*2=38
    assert out.shape[0] == 7
    assert out.shape[3] == 3
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()


def test_generate_deterministic(runner_cfg):
    runner, cfg = runner_cfg
    frames = _frames(t=5)
    a = phases.generate(runner, frames)
    b = phases.generate(runner, frames)
    np.testing.assert_array_equal(a, b)


def test_batch_position_independence():
    """Identical inputs produce identical outputs regardless of batch
    position (per-batch seed reset — reference release note 2.5.10)."""
    runner, cfg = _make_runner(color_correction="none")
    frames = _frames(t=5, seed=3)
    # one batch of 5
    single = phases.generate(runner, frames)
    # same 5 frames twice -> two batches with identical content
    double = phases.generate(runner, np.concatenate([frames, frames], 0))
    np.testing.assert_allclose(double[5:], single, atol=1e-5)
    np.testing.assert_allclose(double[:5], single, atol=1e-5)


def test_rgba_path(runner_cfg):
    runner, cfg = runner_cfg
    rng = np.random.RandomState(1)
    frames = rng.rand(5, 24, 20, 4).astype(np.float32)
    frames[..., 3] = (frames[..., 3] > 0.5).astype(np.float32)  # binary mask
    out = phases.generate(runner, frames)
    assert out.shape[-1] == 4
    assert out[..., 3].min() >= 0.0 and out[..., 3].max() <= 1.0


def test_fused_fast_path_matches_legacy():
    """The fused decode+color+u16 path must match the two-phase path to
    uint16 rounding."""
    runner, cfg = _make_runner(color_correction="wavelet")
    frames = _frames(t=5, seed=7)
    ctx = phases.make_context(cfg)
    phases.encode_all_batches(runner, ctx, frames)
    phases.upscale_all_batches(runner, ctx)
    import copy

    upscaled = [np.asarray(u) for u in ctx["all_upscaled"]]

    ctx_fast = dict(ctx)
    ctx_fast["all_upscaled"] = [u.copy() for u in upscaled]
    phases.decode_and_postprocess_fused(runner, ctx_fast)
    fast = ctx_fast["final_video"]

    ctx_legacy = dict(ctx)
    ctx_legacy["all_upscaled"] = [u.copy() for u in upscaled]
    phases.decode_all_batches(runner, ctx_legacy)
    phases.postprocess_all_batches(runner, ctx_legacy)
    legacy = ctx_legacy["final_video"]

    assert fast.shape == legacy.shape
    np.testing.assert_allclose(fast, legacy, atol=2.0 / 65535 + 1e-4)


def test_streaming_pipeline_matches_phases():
    """generate() auto-selects the fused per-batch program; it must match
    the 4-phase path (same seeds, same noise-key sequence) to u16 rounding
    plus compiler-boundary tolerance."""
    import dataclasses

    runner, cfg = _make_runner(color_correction="wavelet")
    frames = _frames(t=9, seed=11)
    streamed = phases.generate(runner, frames, cfg)

    cfg_off = dataclasses.replace(cfg, fused_pipeline="off")
    runner.cfg = cfg_off
    runner.invalidate_compiled()
    phased = phases.generate(runner, frames, cfg_off)

    assert streamed.shape == phased.shape
    np.testing.assert_allclose(streamed, phased, atol=5e-3)


def test_streaming_cross_frame_color_trims_before_stats():
    """Cross-frame color stats (lab histograms) must run on REAL frames
    only: a padded trailing batch must match the phase-wise path, which
    trims before color (reference phase-4 semantics)."""
    import dataclasses

    runner, cfg = _make_runner(color_correction="lab")
    frames = _frames(t=7, seed=23)  # batch_size 5 -> trailing ori<5 batch
    streamed = phases.generate(runner, frames, cfg)
    cfg_off = dataclasses.replace(cfg, fused_pipeline="off")
    runner.cfg = cfg_off
    runner.invalidate_compiled()
    phased = phases.generate(runner, frames, cfg_off)
    np.testing.assert_allclose(streamed, phased, atol=5e-3)


def test_streaming_oom_falls_back_to_phases(monkeypatch):
    """RESOURCE_EXHAUSTED inside the fused program must fall back to the
    4-phase path (which owns the tiling ladder), not crash."""
    runner, cfg = _make_runner(color_correction="none")

    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: synthetic")

    monkeypatch.setattr(runner, "fused_batch", boom)
    frames = _frames(t=5, seed=3)
    out = phases.generate(runner, frames, cfg)
    assert out.shape[0] == 5 and np.isfinite(out).all()


def test_streaming_other_errors_propagate(monkeypatch):
    runner, cfg = _make_runner(color_correction="none")

    def boom(*a, **k):
        raise ValueError("not an oom")

    monkeypatch.setattr(runner, "fused_batch", boom)
    with pytest.raises(ValueError):
        phases.generate(runner, _frames(t=5, seed=3), cfg)


def test_streaming_noise_paths_match_phases():
    """Input/latent noise use the identical key sequence in both paths."""
    import dataclasses

    runner, cfg = _make_runner(
        color_correction="none", input_noise_scale=0.4, latent_noise_scale=0.3
    )
    frames = _frames(t=5, seed=13)
    streamed = phases.generate(runner, frames, cfg)
    cfg_off = dataclasses.replace(cfg, fused_pipeline="off")
    runner.cfg = cfg_off
    runner.invalidate_compiled()
    phased = phases.generate(runner, frames, cfg_off)
    np.testing.assert_allclose(streamed, phased, atol=5e-3)


def _chunked_runner(color):
    """Geometry that produces a single-row 3-column decode grid at
    64x256 output: W_lat=32, tile 16, overlap 4 -> cols [0, 9, 18]."""
    import dataclasses

    runner, cfg = _make_runner(
        color_correction=color,
        decode_tiled=True,
        decode_tile_size=(64, 128),
        decode_tile_overlap=(0, 32),
    )
    cfg = dataclasses.replace(cfg, resolution=64)
    runner.cfg = cfg
    return runner, cfg


@pytest.mark.parametrize("color", ["wavelet", "none"])
def test_chunked_stream_matches_fused(color):
    """The streamed column-chunk path (head + per-tile executables with a
    blend-carry strip, Runner.fused_batch_chunks) must reproduce the
    single-executable fused path: identical blend math, and the color-fix
    halo (32px >= the wavelet receptive field of 31) makes every emitted
    pixel see only final blended values."""
    import dataclasses

    runner, cfg = _chunked_runner(color)
    frames = _frames(t=5, h=24, w=96, seed=17)

    # the plan must exist, otherwise this test silently runs the fused path
    th, tw = 64, 256
    plan = runner.supports_chunked((5, 24, 96, 3), th, tw)
    assert plan is not None and len(plan.cols) == 3
    chunked = phases.generate(runner, frames, cfg)

    cfg_off = dataclasses.replace(cfg, chunked_output="off")
    runner.cfg = cfg_off
    runner.invalidate_compiled()
    fused = phases.generate(runner, frames, cfg_off)

    assert chunked.shape == fused.shape
    np.testing.assert_allclose(chunked, fused, atol=2.0 / 65535 + 1e-4)


def test_chunked_stream_packed_u8():
    runner, cfg = _chunked_runner("wavelet")
    frames = _frames(t=5, h=24, w=96, seed=19)
    import dataclasses

    cfg8 = dataclasses.replace(cfg, output_bits=8)
    runner.cfg = cfg8
    runner.invalidate_compiled()
    out = phases.generate(runner, frames, cfg8, packed=True)
    assert out.dtype == np.uint8 and out.shape == (5, 64, 256, 3)
    runner.cfg = dataclasses.replace(cfg8, chunked_output="off")
    runner.invalidate_compiled()
    ref = phases.generate(runner, frames, runner.cfg, packed=True)
    np.testing.assert_allclose(
        out.astype(np.int32), ref.astype(np.int32), atol=1
    )


def test_chunked_plan_rejected_for_global_color():
    runner, cfg = _chunked_runner("lab")
    assert runner.supports_chunked((5, 24, 96, 3), 64, 256) is None


def test_chunked_with_column_tiled_encode_matches_all_paths():
    """The bench workload's geometry at tiny scale: single-row COLUMN-tiled
    encode (full-height tiles, zero row overlap — adopted round 5,
    docs/PERFORMANCE.md) feeding the streamed column-chunk decode. The
    chunked path, the monolithic fused path, and the 4-phase path must all
    agree; guards the encode-grid/blend math under the fused head."""
    import dataclasses

    runner, cfg = _chunked_runner("wavelet")
    cfg = dataclasses.replace(
        cfg,
        encode_tiled=True,
        encode_tile_size=(64, 128),   # H=64 -> single tile row
        encode_tile_overlap=(0, 32),  # column grid with blended seams
    )
    runner.cfg = cfg
    frames = _frames(t=5, h=24, w=96, seed=29)

    # encode grid really is single-row multi-column at this shape
    from seedvr2_tpu.models.vae import tiling as T
    lt_w, cols = T._axis_grid(256 // 8, 128 // 8, 32 // 8)
    assert len(cols) >= 2
    assert runner.supports_chunked((5, 24, 96, 3), 64, 256) is not None

    chunked = phases.generate(runner, frames, cfg)

    cfg_off = dataclasses.replace(cfg, chunked_output="off")
    runner.cfg = cfg_off
    runner.invalidate_compiled()
    fused = phases.generate(runner, frames, cfg_off)
    np.testing.assert_allclose(chunked, fused, atol=2.0 / 65535 + 1e-4)

    cfg_phases = dataclasses.replace(cfg_off, fused_pipeline="off")
    runner.cfg = cfg_phases
    runner.invalidate_compiled()
    phased = phases.generate(runner, frames, cfg_phases)
    assert phased.shape == chunked.shape
    np.testing.assert_allclose(chunked, phased, atol=2.0 / 65535 + 1e-4)


def test_chunked_oom_retries_monolithic(monkeypatch):
    """A RESOURCE_EXHAUSTED raised while the streamed column-chunk path is
    active must first retry the fused pipeline monolithic (generate() sets
    runner._disable_chunked), not drop straight to the 4-phase ladder."""
    runner, cfg = _chunked_runner("wavelet")
    frames = _frames(t=5, h=24, w=96, seed=23)
    real = runner.fused_batch_chunks
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: fake chunked OOM")

    monkeypatch.setattr(runner, "fused_batch_chunks", boom)
    out = phases.generate(runner, frames, cfg)
    assert calls["n"] == 1  # chunked attempted once...
    assert getattr(runner, "_disable_chunked", False)  # ...then disabled
    assert out.shape == (5, 64, 256, 3)  # monolithic retry produced output
    # and the result matches the chunked path's on a fresh runner
    runner2, cfg2 = _chunked_runner("wavelet")
    ref = phases.generate(runner2, frames, cfg2)
    np.testing.assert_allclose(out, ref, atol=2.0 / 65535 + 1e-4)


def test_temporal_overlap_run():
    runner, cfg = _make_runner(temporal_overlap=2, color_correction="none")
    frames = _frames(t=11, seed=4)
    out = phases.generate(runner, frames)
    assert out.shape[0] == 11


def test_prepend_frames():
    runner, cfg = _make_runner(prepend_frames=2, color_correction="none")
    frames = _frames(t=5, seed=5)
    out = phases.generate(runner, frames)
    assert out.shape[0] == 5  # prepended frames removed


def test_uniform_batch_size_path():
    runner, cfg = _make_runner(uniform_batch_size=True, color_correction="none")
    frames = _frames(t=7, seed=8)  # 5 + 2 -> last batch padded to 5
    out = phases.generate(runner, frames)
    assert out.shape[0] == 7
    assert np.isfinite(out).all()


def test_input_and_latent_noise_paths():
    runner, cfg = _make_runner(
        input_noise_scale=0.5, latent_noise_scale=0.3, color_correction="none"
    )
    frames = _frames(t=5, seed=9)
    out = phases.generate(runner, frames)
    assert out.shape[0] == 5
    # noise paths change the result vs the clean runner
    clean_runner, _ = _make_runner(color_correction="none")
    base = phases.generate(clean_runner, frames)
    assert np.abs(out - base).max() > 1e-4


def test_all_color_methods_e2e():
    frames = _frames(t=5, seed=10)
    outs = {}
    for method in ("lab", "hsv", "wavelet_adaptive", "adain"):
        runner, cfg = _make_runner(color_correction=method)
        outs[method] = phases.generate(runner, frames)
        assert np.isfinite(outs[method]).all()
    # methods actually differ
    assert np.abs(outs["lab"] - outs["adain"]).max() > 1e-5


def test_budget_declines_stash_when_offloading():
    """VERDICT r2 #8: one shared HBM budget — at a 4K long-video shape the
    offload heuristic must trigger AND the color-ref stash must be declined
    with it (they used to size themselves independently)."""
    from seedvr2_tpu.config import PipelineConfig
    from seedvr2_tpu.pipeline import phases

    cfg = PipelineConfig(resolution=2160, batch_size=5, color_correction="lab")
    ctx = phases.make_context(cfg)
    ctx["true_dims"] = (2160, 3840)  # 4K output
    ctx["total_frames"] = 4001  # ~2min clip: latents alone ~8 GiB
    ctx["batches"] = [None] * 801  # 4n+1 batches of 5

    assert phases._offload(cfg, ctx) is True
    assert phases._stash_color_ref(cfg, ctx) is False
    # the joint decision comes from one cached budget dict
    assert ctx["_budget"]["offload"] and not ctx["_budget"]["stash"]

    # short 1080p clip: resident latents, stash allowed
    ctx2 = phases.make_context(cfg)
    ctx2["true_dims"] = (1080, 1920)
    ctx2["total_frames"] = 5
    ctx2["batches"] = [None]
    assert phases._offload(cfg, ctx2) is False
    assert phases._stash_color_ref(cfg, ctx2) is True


class TestRunBudget:
    """Pin the derived budget (VERDICT r4 weak #6: the 20%/10% constants
    were guesses, _hbm_bytes fell back to 16GB silently) at three shape
    points on a mocked 16GB chip, with the model weights in the equation."""

    class FakeRunner:
        def __init__(self, gib):
            self._b = int(gib * 2**30)

        def weight_bytes(self):
            return self._b

    def _ctx(self, phases, cfg, dims, total):
        ctx = phases.make_context(cfg)
        ctx["true_dims"] = dims
        ctx["total_frames"] = total
        ctx["batches"] = [None] * max(total // cfg.batch_size, 1)
        return ctx

    @pytest.fixture()
    def mocked_hbm(self, monkeypatch):
        from seedvr2_tpu.pipeline import phases

        monkeypatch.setattr(phases, "_hbm_bytes", lambda: 16 << 30)
        return phases

    def test_720p_short_3b_stays_resident(self, mocked_hbm):
        from seedvr2_tpu.config import PipelineConfig

        phases = mocked_hbm
        cfg = PipelineConfig(resolution=1080, batch_size=5, color_correction="lab")
        ctx = self._ctx(phases, cfg, (1080, 1920), 10)
        r = self.FakeRunner(6.6)  # 3B bf16
        assert phases._offload(cfg, ctx, r) is False
        assert phases._stash_color_ref(cfg, ctx, r) is True

    def test_4k_long_7b_offloads_and_declines_stash(self, mocked_hbm):
        from seedvr2_tpu.config import PipelineConfig

        phases = mocked_hbm
        cfg = PipelineConfig(
            resolution=2160, batch_size=5, color_correction="lab",
            decode_tiled=True, decode_tile_size=(1024, 1024),
        )
        ctx = self._ctx(phases, cfg, (2160, 3840), 1001)
        r = self.FakeRunner(7.3)  # 7B int8
        assert phases._offload(cfg, ctx, r) is True
        assert phases._stash_color_ref(cfg, ctx, r) is False
        # weights are in the equation: same shape with a tiny model and a
        # short clip fits fine
        ctx2 = self._ctx(phases, cfg, (2160, 3840), 5)
        assert phases._offload(cfg, ctx2, self.FakeRunner(0.01)) is False

    def test_4k_untiled_peak_forces_offload_even_short(self, mocked_hbm):
        """The widest decoder feature map (C0 at full 4K output) alone
        overwhelms a 16GB chip when untiled — the budget must see it even
        with near-zero latents, where the old 20%-of-HBM latent rule said
        'resident'."""
        from seedvr2_tpu.config import PipelineConfig

        phases = mocked_hbm
        cfg = PipelineConfig(resolution=2160, batch_size=5, color_correction="lab")
        ctx = self._ctx(phases, cfg, (2160, 3840), 5)  # one batch, 4K
        r = self.FakeRunner(7.3)
        budget = phases._run_budget(cfg, ctx, r)
        assert budget["peak_gib"] > 8  # C0=128 bf16 map at 4K ~ 2x(T'*H*W*256B)
        assert budget["offload"] is True and budget["stash"] is False


def test_output_bits_8_matches_16_within_quantization():
    """u8 output packing (ROADMAP #8): same pipeline, output_bits=8 must
    match the u16 path within one 8-bit quantization step."""
    runner8, cfg8 = _make_runner(output_bits=8)
    runner16, cfg16 = _make_runner()
    frames = _frames(t=5)
    out8 = phases.generate(runner8, frames)
    out16 = phases.generate(runner16, frames)
    assert out8.shape == out16.shape
    assert np.abs(out8 - out16).max() <= (0.5 / 255.0) + 1e-6


def test_streamed_vs_phased_quality_gate():
    """PSNR/SSIM quality gate (utils/metrics.py, the BASELINE.json
    measurement tools) between the fused streaming pipeline and the
    reference-shaped 4-phase pipeline: same math, different program
    boundaries — must agree to >45dB / SSIM>0.99."""
    import dataclasses

    from seedvr2_tpu.utils.metrics import video_psnr_ssim

    runner, cfg = _make_runner(color_correction="wavelet")
    frames = _frames(t=5, seed=31)
    streamed = phases.generate(runner, frames, cfg)
    cfg_off = dataclasses.replace(cfg, fused_pipeline="off")
    runner.cfg = cfg_off
    runner.invalidate_compiled()
    phased = phases.generate(runner, frames, cfg_off)
    p, s = video_psnr_ssim(streamed, phased)
    assert p > 45.0, p
    assert s > 0.99, s


def test_packed_output_matches_unpacked():
    """generate(packed=True) must return the very pixels the unpacked path
    would produce, just without the host fp32 conversion (uint16 default,
    uint8 when cfg.output_bits == 8); host-postprocess paths (RGBA) keep
    returning f32 under the caller-accepts contract."""
    runner, cfg = _make_runner(color_correction="wavelet")
    frames = _frames(t=5, seed=11)
    ref = phases.generate(runner, frames)
    packed = phases.generate(runner, frames, packed=True)
    assert packed.dtype == np.uint16
    np.testing.assert_array_equal(packed, (ref * 65535.0 + 0.5).astype(np.uint16))

    runner8, _ = _make_runner(color_correction="wavelet", output_bits=8)
    packed8 = phases.generate(runner8, frames, packed=True)
    assert packed8.dtype == np.uint8

    # RGBA forces host alpha merge -> f32 even when packing was accepted
    rgba = np.concatenate([frames, (frames[..., :1] > 0.5).astype(np.float32)], -1)
    out = phases.generate(runner, rgba, packed=True)
    assert out.dtype == np.float32 and out.shape[-1] == 4


def test_packed_output_phase_wise_path():
    """The non-streaming fast path (tensor_offload='always' disables the
    fused program) must honor packed=True through decode_and_postprocess_fused."""
    runner, cfg = _make_runner(color_correction="none", tensor_offload="always")
    frames = _frames(t=5, seed=12)
    ref = phases.generate(runner, frames)
    packed = phases.generate(runner, frames, packed=True)
    assert packed.dtype == np.uint16
    np.testing.assert_array_equal(packed, (ref * 65535.0 + 0.5).astype(np.uint16))


def test_uint8_input_matches_float():
    """uint8 ingestion (raw decoder bytes scaled on device by
    ops/resize.py:to_f01) must match the float path on BOTH pipelines: the
    same pixel values enter the same transform, only the transfer dtype
    differs (u8 exact vs f16-rounded upload -> small tolerance)."""
    import dataclasses

    runner, cfg = _make_runner(color_correction="wavelet")
    rng = np.random.RandomState(3)
    u8 = (rng.rand(5, 24, 20, 3) * 255).round().astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    out_u8 = phases.generate(runner, u8, cfg)
    out_f32 = phases.generate(runner, f32, cfg)
    assert out_u8.shape == out_f32.shape
    np.testing.assert_allclose(out_u8, out_f32, atol=5e-3)

    # phase-wise path too (fused off)
    cfg_off = dataclasses.replace(cfg, fused_pipeline="off")
    runner.cfg = cfg_off
    runner.invalidate_compiled()
    ph_u8 = phases.generate(runner, u8, cfg_off)
    np.testing.assert_allclose(ph_u8, out_u8, atol=5e-3)


def test_video_reader_uint8_roundtrip(tmp_path):
    """VideoReader(dtype=uint8) returns the same pixels as the float reader
    (exactly: the float path is u8/255)."""
    from seedvr2_tpu.io import video as vio

    rng = np.random.RandomState(5)
    fr = rng.rand(6, 16, 24, 3).astype(np.float32)
    p = str(tmp_path / "in.mp4")
    w = vio.make_video_writer(p, 24, 16, 10.0)
    w.write(fr)
    w.close()
    a = vio.VideoReader(p).read()
    b = vio.VideoReader(p, dtype=np.uint8).read()
    assert b.dtype == np.uint8 and a.dtype == np.float32
    np.testing.assert_allclose(a, b.astype(np.float32) / 255.0, atol=1e-6)
