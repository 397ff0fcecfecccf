"""Committed golden: the tiny-model end-to-end output must stay stable
across refactors (per-framework golden strategy, SURVEY.md §7 hard part 4).
Regenerate deliberately with scripts in tests/goldens/ if a numeric change
is intentional, and say why in the commit message."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from seedvr2_tpu.config import PipelineConfig, dit_tiny, vae_tiny
from seedvr2_tpu.io.weights import unflatten_into
from seedvr2_tpu.models.dit.nadit import init_params as init_dit
from seedvr2_tpu.models.vae.model import init_vae_params
from seedvr2_tpu.pipeline import phases
from seedvr2_tpu.pipeline.runner import Runner

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tiny_pipeline.npz")


def test_tiny_pipeline_matches_golden():
    data = np.load(GOLDEN)
    dit_cfg = dit_tiny()
    vae_cfg = vae_tiny()
    dit_cfg = dataclasses.replace(
        dit_cfg,
        vid_in_channels=2 * vae_cfg.latent_channels + 1,
        vid_out_channels=vae_cfg.latent_channels,
    )
    cfg = PipelineConfig(
        dit=dit_cfg, vae=vae_cfg, resolution=32, batch_size=5,
        compute_dtype="float32", color_correction="wavelet",
    )
    # rebuild param trees from the stored flat arrays
    t_dit = init_dit(dit_cfg, jax.random.PRNGKey(0))
    t_vae = init_vae_params(vae_cfg, jax.random.PRNGKey(1))
    dit_params = unflatten_into(t_dit, {k[4:]: data[k] for k in data.files if k.startswith("dit/")})
    vae_params = unflatten_into(t_vae, {k[4:]: data[k] for k in data.files if k.startswith("vae/")})

    runner = Runner(cfg, dit_params, vae_params, data["text"])
    out = phases.generate(runner, np.asarray(data["frames"]))
    ref = data["out"]
    assert out.shape == ref.shape
    # loose tolerance: compiler/version fp reordering is acceptable,
    # semantic changes are not
    np.testing.assert_allclose(out, ref, atol=5e-3)
