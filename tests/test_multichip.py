"""Frame-parallel multi-chip generation on the 8-device CPU mesh."""

import dataclasses

import jax
import numpy as np
import pytest

from seedvr2_tpu.config import PipelineConfig, dit_tiny, vae_tiny
from seedvr2_tpu.models.dit.nadit import init_params as init_dit
from seedvr2_tpu.models.vae.model import init_vae_params
from seedvr2_tpu.parallel.mesh import make_mesh
from seedvr2_tpu.pipeline.multichip import generate_multichip
from seedvr2_tpu.pipeline.runner import Runner


def _make_runner():
    dit_cfg = dit_tiny()
    vae_cfg = vae_tiny()
    dit_cfg = dataclasses.replace(
        dit_cfg,
        vid_in_channels=2 * vae_cfg.latent_channels + 1,
        vid_out_channels=vae_cfg.latent_channels,
    )
    cfg = PipelineConfig(
        dit=dit_cfg,
        vae=vae_cfg,
        resolution=32,
        batch_size=5,
        compute_dtype="float32",
        color_correction="none",
    )
    dit_params = init_dit(dit_cfg, jax.random.PRNGKey(0))
    vae_params = init_vae_params(vae_cfg, jax.random.PRNGKey(1))
    text = np.random.RandomState(0).randn(4, dit_cfg.txt_in_dim).astype(np.float32) * 0.1
    return Runner(cfg, dit_params, vae_params, text), cfg


def test_multichip_generate():
    runner, cfg = _make_runner()
    mesh = make_mesh(data=2)
    rng = np.random.RandomState(0)
    frames = rng.rand(14, 24, 20, 3).astype(np.float32)
    out = generate_multichip(runner, frames, mesh, seam_overlap=3)
    assert out.shape[0] == 14
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()


def test_multichip_rgba_prepend_color_noise():
    """Feature parity with the single-chip phases: RGBA alpha re-attachment,
    prepend_frames trimming, on-device color fix, input noise (VERDICT r1 #8)."""
    runner, cfg = _make_runner()
    runner.cfg = cfg.replace(
        prepend_frames=2, color_correction="adain", input_noise_scale=0.2
    )
    mesh = make_mesh(data=2)
    rng = np.random.RandomState(2)
    frames = rng.rand(12, 24, 20, 4).astype(np.float32)
    frames[..., 3] = (frames[..., 3] > 0.5).astype(np.float32)  # binary alpha
    out = generate_multichip(runner, frames, mesh, seam_overlap=3)
    assert out.shape[0] == 12  # prepend removed
    assert out.shape[-1] == 4  # alpha re-attached
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()


def test_multichip_falls_back_single():
    runner, cfg = _make_runner()
    mesh = make_mesh(data=2)
    frames = np.random.RandomState(1).rand(3, 24, 20, 3).astype(np.float32)
    out = generate_multichip(runner, frames, mesh)
    assert out.shape[0] == 3
