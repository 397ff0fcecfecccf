"""End-to-end loader test with a synthetic reference-layout checkpoint:
export tiny params to torch-layout safetensors, load through load_runner,
and verify forward parity with the source params."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.config import PipelineConfig, dit_tiny, vae_tiny
from seedvr2_tpu.io import weights as W
from seedvr2_tpu.models.dit.nadit import build_attn_plans, init_params as init_dit, nadit_forward
from seedvr2_tpu.models.vae.model import init_vae_params
from seedvr2_tpu.pipeline.loader import load_runner


def _write_safetensors(path, state):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)


@pytest.fixture(scope="module")
def fake_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    dit_cfg = dit_tiny()
    vae_cfg = vae_tiny()
    dit_params = init_dit(dit_cfg, jax.random.PRNGKey(0))
    vae_params = init_vae_params(vae_cfg, jax.random.PRNGKey(1))
    _write_safetensors(str(d / "tiny_dit.safetensors"), W.export_state_dict(dit_params, W.dit_key_map(dit_cfg)))
    _write_safetensors(str(d / "tiny_vae.safetensors"), W.export_state_dict(vae_params, W.vae_key_map(vae_cfg)))
    # bundled text embeddings
    import torch

    emb_dir = d / "emb"
    emb_dir.mkdir()
    torch.save(torch.randn(3, dit_cfg.txt_in_dim) * 0.1, str(emb_dir / "pos_emb.pt"))
    torch.save(torch.randn(3, dit_cfg.txt_in_dim) * 0.1, str(emb_dir / "neg_emb.pt"))
    return d, dit_cfg, vae_cfg, dit_params, vae_params


def test_load_runner_from_files(fake_model_dir):
    d, dit_cfg, vae_cfg, dit_params, vae_params = fake_model_dir
    cfg = PipelineConfig(dit=dit_cfg, vae=vae_cfg, resolution=32, compute_dtype="float32")
    runner = load_runner(
        dit_model="tiny_dit.safetensors",
        vae_model="tiny_vae.safetensors",
        model_dir=str(d),
        cfg=cfg,
        download=False,
        emb_dir=str(d / "emb"),
    )
    # loaded params produce the same DiT forward as the originals
    thw, txt_len = (1, 4, 4), 3
    plans = build_attn_plans(dit_cfg, thw, txt_len)
    vid = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 8, 8, dit_cfg.vid_in_channels)) * 0.3
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, txt_len, dit_cfg.txt_in_dim)) * 0.3
    t = jnp.array([900.0])
    ref = nadit_forward(dit_params, dit_cfg, vid, txt, t, plans)
    got = nadit_forward(runner.dit_params, dit_cfg, vid, txt, t, plans)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_load_runner_int8(fake_model_dir, monkeypatch):
    import seedvr2_tpu.ops.quant as Q

    monkeypatch.setattr(Q, "_QUANT_MIN_SIZE", 1024)  # tiny model matrices
    d, dit_cfg, vae_cfg, dit_params, _ = fake_model_dir
    cfg = PipelineConfig(dit=dit_cfg, vae=vae_cfg, resolution=32, compute_dtype="float32")
    runner = load_runner(
        dit_model="tiny_dit.safetensors",
        vae_model="tiny_vae.safetensors",
        model_dir=str(d),
        cfg=cfg,
        quantize="int8",
        download=False,
        emb_dir=str(d / "emb"),
    )
    flat = W.flatten_tree(runner.dit_params)
    assert any(k.endswith("w_q") for k in flat), "int8 quantization not applied"
    # scales stay fp32
    scales = [v for k, v in flat.items() if k.endswith("w_s")]
    assert scales and all(v.dtype == jnp.float32 for v in scales)
