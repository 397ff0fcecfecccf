"""END-TO-END pipeline parity vs the reference's own 4-phase driver
(VERDICT r4 #3). The per-module nets (test_reference_parity.py) cannot
catch composition bugs — batching/4n+1 padding/trim/blend/color ORDERING —
so this runs the reference's actual encode_all_batches ->
upscale_all_batches -> decode_all_batches -> postprocess_all_batches
(reference: src/core/generation_phases.py:171,542,807,1060) through
ref_shims on tiny models whose weights are shared with our Runner via the
production key maps, with the diffusion noise draws monkeypatched to
identical arrays on both sides, and compares final frames to
phases.generate at tight PSNR.
"""

import dataclasses

import numpy as np
import pytest
import torch

import ref_shims

ref_shims.install_shims()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import test_reference_parity as RP  # noqa: E402 — reuse tiny builders
from seedvr2_tpu.config import PipelineConfig, vae_tiny  # noqa: E402
from seedvr2_tpu.io import weights as W  # noqa: E402
from seedvr2_tpu.models.vae.model import init_vae_params  # noqa: E402
from seedvr2_tpu.pipeline import phases  # noqa: E402
from seedvr2_tpu.pipeline.runner import Runner  # noqa: E402
from seedvr2_tpu.utils.debug import Debug  # noqa: E402


def _noise_for(shape) -> np.ndarray:
    """Deterministic noise keyed ONLY by shape — stands in for the
    reference's per-batch set_seed + randn (generation_phases.py:661-683)
    on BOTH sides, so the diffusion starting points are bit-identical."""
    rs = np.random.RandomState(abs(hash(tuple(int(s) for s in shape))) % (2**31))
    return rs.standard_normal(tuple(int(s) for s in shape)).astype(np.float32)


@pytest.fixture(scope="module")
def shared_models():
    """Tiny 3B-style DiT + tiny VAE with weights shared reference->ours."""
    vae_cfg = vae_tiny()
    C = vae_cfg.latent_channels
    dit_cfg = dataclasses.replace(
        RP._tiny_cfg_3b(), vid_in_channels=2 * C + 1, vid_out_channels=C
    )
    ref_dit = RP._randomize(RP._build_reference_nadit_3b(dit_cfg), seed=11)
    our_dit = RP._params_from_reference(ref_dit, dit_cfg)

    ref_vae = RP._randomize(RP._build_reference_vae(vae_cfg), seed=21)
    sd = {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()}
    flat = W.convert_state_dict(sd, W.vae_key_map(vae_cfg), dtype=np.float32)
    our_vae = W.unflatten_into(
        init_vae_params(vae_cfg, jax.random.PRNGKey(0), dtype=jnp.float32), flat
    )

    txt_len = 4
    rs = np.random.RandomState(99)
    pos = (rs.standard_normal((txt_len, dit_cfg.txt_in_dim)) * 0.3).astype(np.float32)
    neg = (rs.standard_normal((txt_len, dit_cfg.txt_in_dim)) * 0.3).astype(np.float32)
    return dit_cfg, vae_cfg, ref_dit, ref_vae, our_dit, our_vae, pos, neg


def _run_reference_pipeline(shared, frames_np, *, resolution, batch_size,
                            color_correction, seed, monkeypatch):
    """Drive the reference's 4 phase functions exactly as its CLI does
    (reference: inference_cli.py:831-1012), with hand-built runner/ctx in
    place of configure_runner's checkpoint machinery (models are already
    materialized; cache disabled)."""
    from src.core.generation_phases import (
        decode_all_batches,
        encode_all_batches,
        postprocess_all_batches,
        upscale_all_batches,
    )
    from src.core.infer import VideoDiffusionInfer
    from src.utils.debug import Debug as RefDebug

    dit_cfg, vae_cfg, ref_dit, ref_vae, _, _, pos, neg = shared

    config = ref_shims.make_config(
        {
            "diffusion": {
                "schedule": {"type": "lerp", "T": 1000.0},
                "sampler": {"type": "euler", "prediction_type": "v_lerp"},
                "timesteps": {"sampling": {"type": "uniform_trailing", "steps": 1},
                              "transform": True},
                "cfg": {"scale": 1.0, "rescale": 0.0},
            },
            "vae": {
                "scaling_factor": vae_cfg.scaling_factor,
                "shifting_factor": vae_cfg.shifting_factor,
                "grouping": False,
                "dtype": "float32",
                "slicing": {"split_size": vae_cfg.slicing_sample_min_size,
                            "memory_device": "same"},
            },
        }
    )
    debug = RefDebug(enabled=False)
    runner = VideoDiffusionInfer(config, debug)
    runner.dit = ref_dit
    runner.vae = ref_vae
    ref_vae.debug = debug

    ctx = {
        "dit_device": torch.device("cpu"),
        "vae_device": torch.device("cpu"),
        "dit_offload_device": None,
        "vae_offload_device": None,
        "tensor_offload_device": None,
        "compute_dtype": torch.float32,
        "interrupt_fn": None,
        "video_transform": None,
        "text_embeds": {
            "texts_pos": [torch.from_numpy(pos.copy())],
            "texts_neg": [torch.from_numpy(neg.copy())],
        },
        "all_latents": [],
        "all_upscaled_latents": [],
        "batch_samples": [],
        "final_video": None,
        "comfyui_available": False,
        "total_frames": len(frames_np),
        "cache_context": {
            "vae_cache": False, "dit_cache": False,
            "cached_vae": False, "cached_dit": False,
            "dit_newly_cached": False, "vae_newly_cached": False,
            "global_cache": None, "dit_id": None, "vae_id": None,
            "dit_model": "", "vae_model": "",
        },
    }

    def fake_randn_like(t, dtype=None, **kw):
        out = torch.from_numpy(_noise_for(t.shape))
        return out.to(dtype or t.dtype)

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    images = torch.from_numpy(frames_np.copy())
    encode_all_batches(
        runner, ctx, images, debug, batch_size=batch_size, seed=seed,
        resolution=resolution, color_correction=color_correction,
    )
    upscale_all_batches(runner, ctx, debug, seed=seed, cache_model=True)
    decode_all_batches(runner, ctx, debug, cache_model=True)
    postprocess_all_batches(
        ctx, debug, color_correction=color_correction, batch_size=batch_size
    )
    out = ctx["final_video"]
    return np.asarray(out.detach().float().cpu().numpy())


def _run_our_pipeline(shared, frames_np, *, resolution, batch_size,
                      color_correction, seed, monkeypatch, fused):
    dit_cfg, vae_cfg, _, _, our_dit, our_vae, pos, neg = shared
    cfg = PipelineConfig(
        dit=dit_cfg,
        vae=vae_cfg,
        resolution=resolution,
        batch_size=batch_size,
        color_correction=color_correction,
        seed=seed,
        compute_dtype="float32",
        fused_pipeline="auto" if fused else "off",
    )
    runner = Runner(cfg, our_dit, our_vae, pos, neg)

    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32, **kw):
        return jnp.asarray(_noise_for(shape), dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        out = phases.generate(runner, frames_np, cfg, Debug())
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    return np.asarray(out, np.float32)


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


@pytest.mark.parametrize(
    "color,fused",
    [("wavelet", True), ("wavelet", False), ("none", True), ("lab", False)],
)
def test_pipeline_matches_reference_driver(shared_models, monkeypatch, color, fused):
    """9 frames through both full pipelines (two batches: 5 + 4->4n+1
    padding) — covers transform, batch split, padding, one-step DiT,
    decode, trim, color composition and [-1,1]->[0,1] assembly order."""
    frames = np.clip(
        np.random.RandomState(7).rand(9, 20, 24, 3) * 0.8 + 0.1, 0, 1
    ).astype(np.float32)
    ref = _run_reference_pipeline(
        shared_models, frames, resolution=32, batch_size=5,
        color_correction=color, seed=42, monkeypatch=monkeypatch,
    )
    ours = _run_our_pipeline(
        shared_models, frames, resolution=32, batch_size=5,
        color_correction=color, seed=42, monkeypatch=monkeypatch, fused=fused,
    )
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    psnr = _psnr(ref, ours)
    assert psnr > 35.0, f"pipeline diverged from reference driver: PSNR={psnr:.1f}dB"


def test_single_image_matches_reference_driver(shared_models, monkeypatch):
    """The 1-frame path (t2i branch of get_condition, single batch)."""
    frames = np.clip(
        np.random.RandomState(8).rand(1, 20, 24, 3) * 0.8 + 0.1, 0, 1
    ).astype(np.float32)
    ref = _run_reference_pipeline(
        shared_models, frames, resolution=32, batch_size=1,
        color_correction="wavelet", seed=5, monkeypatch=monkeypatch,
    )
    ours = _run_our_pipeline(
        shared_models, frames, resolution=32, batch_size=1,
        color_correction="wavelet", seed=5, monkeypatch=monkeypatch, fused=True,
    )
    assert ref.shape == ours.shape
    psnr = _psnr(ref, ours)
    assert psnr > 35.0, f"single-image pipeline diverged: PSNR={psnr:.1f}dB"
