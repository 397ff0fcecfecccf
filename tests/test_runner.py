"""Runner-level semantics: SR condition, timestep wiring, seeds."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from seedvr2_tpu.config import PipelineConfig, dit_tiny, vae_tiny
from seedvr2_tpu.models.dit.nadit import init_params as init_dit
from seedvr2_tpu.models.vae.model import init_vae_params
from seedvr2_tpu.pipeline.runner import Runner
from seedvr2_tpu.utils.seed import batch_key, noise_pair


def _runner(**kw):
    dit_cfg = dit_tiny()
    vae_cfg = vae_tiny()
    dit_cfg = dataclasses.replace(
        dit_cfg,
        vid_in_channels=2 * vae_cfg.latent_channels + 1,
        vid_out_channels=vae_cfg.latent_channels,
    )
    cfg = PipelineConfig(dit=dit_cfg, vae=vae_cfg, resolution=32, compute_dtype="float32", **kw)
    return Runner(
        cfg,
        init_dit(dit_cfg, jax.random.PRNGKey(0)),
        init_vae_params(vae_cfg, jax.random.PRNGKey(1)),
        np.random.RandomState(0).randn(3, dit_cfg.txt_in_dim).astype(np.float32) * 0.1,
    )


def test_condition_layout():
    """SR condition = [latent_blur | ones mask] (reference: infer.py:54-78)."""
    noise = jnp.zeros((1, 2, 4, 4, 4))
    blur = jnp.full((1, 2, 4, 4, 4), 0.7)
    cond = Runner.get_condition(noise, blur)
    assert cond.shape == (1, 2, 4, 4, 5)
    np.testing.assert_allclose(cond[..., :4], 0.7)
    np.testing.assert_allclose(cond[..., 4], 1.0)


def test_upscale_deterministic_per_seed():
    r = _runner()
    latent = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 4, 4))
    a = np.asarray(r.upscale(latent, 42))
    b = np.asarray(r.upscale(latent, 42))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(r.upscale(latent, 43))
    assert np.abs(a - c).max() > 1e-6


def test_latent_noise_scale_changes_condition():
    r0 = _runner(latent_noise_scale=0.0)
    r1 = _runner(latent_noise_scale=0.5)
    latent = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 4, 4, 4))
    a = np.asarray(r0.upscale(latent, 42))
    b = np.asarray(r1.upscale(latent, 42))
    assert np.abs(a - b).max() > 1e-6


def test_cfg_swap_never_runs_stale_closure():
    """Swapping cfg on a live Runner WITHOUT calling invalidate_compiled
    must still trace fresh closures: jit-cache keys carry a cfg digest
    (Runner._cfg_key), so a missed invalidate can at worst waste memory,
    never execute math from the old cfg."""
    r = _runner(latent_noise_scale=0.0)
    latent = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 4, 4, 4))
    a = np.asarray(r.upscale(latent, 42))
    r.cfg = dataclasses.replace(r.cfg, latent_noise_scale=0.5)
    b = np.asarray(r.upscale(latent, 42))
    assert np.abs(a - b).max() > 1e-6  # old-cfg closure would return a exactly
    # and swapping back reuses the original entry bit-exactly
    r.cfg = dataclasses.replace(r.cfg, latent_noise_scale=0.0)
    c = np.asarray(r.upscale(latent, 42))
    np.testing.assert_array_equal(a, c)


def test_seed_key_offsets():
    assert not np.array_equal(np.asarray(batch_key(1, "dit")), np.asarray(batch_key(1, "vae")))
    base, aug = noise_pair(7, (2, 3), jnp.float32)
    base2, aug2 = noise_pair(7, (2, 3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(base2))
    np.testing.assert_array_equal(np.asarray(aug), np.asarray(aug2))


def test_step_cache_reuse():
    r = _runner()
    latent = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 4, 4, 4))
    r.upscale(latent, 42)
    n = len(r._dit_step_cache)
    r.upscale(latent, 123)  # same shape -> no recompile
    assert len(r._dit_step_cache) == n
    r.upscale(jnp.zeros((1, 2, 8, 8, 4)), 42)  # new shape bucket
    assert len(r._dit_step_cache) == n + 1


def test_condition_tasks():
    noise = jnp.zeros((1, 3, 2, 2, 4))
    lat = jnp.full((1, 3, 2, 2, 4), 0.5)
    sr = Runner.get_condition(noise, lat, "sr")
    np.testing.assert_allclose(sr[..., -1], 1.0)
    i2v = Runner.get_condition(noise, lat, "i2v")
    np.testing.assert_allclose(np.asarray(i2v[0, 0, ..., -1]), 1.0)
    np.testing.assert_allclose(np.asarray(i2v[0, 1:, ..., -1]), 0.0)
    np.testing.assert_allclose(np.asarray(i2v[0, 1:, ..., :4]), 0.0)
    v2v = Runner.get_condition(noise, lat, "v2v")
    np.testing.assert_allclose(np.asarray(v2v[0, :2, ..., -1]), 1.0)
    np.testing.assert_allclose(np.asarray(v2v[0, 2:, ..., -1]), 0.0)
    t2v = Runner.get_condition(noise, lat, "t2v")
    np.testing.assert_allclose(np.asarray(t2v[..., -1]), 0.0)


def test_cfg_scale_uses_negative_branch():
    import dataclasses

    r = _runner()
    # rebuild with cfg_scale=3 and a neg embedding
    cfg = dataclasses.replace(
        r.cfg, diffusion=dataclasses.replace(r.cfg.diffusion, cfg_scale=3.0)
    )
    neg = np.random.RandomState(9).randn(3, r.cfg.dit.txt_in_dim).astype(np.float32) * 0.1
    r2 = Runner(cfg, r.dit_params, r.vae_params, np.asarray(r.text_pos[0]), neg)
    latent = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 4, 4, 4))
    base = np.asarray(r.upscale(latent, 42))
    guided = np.asarray(r2.upscale(latent, 42))
    assert np.abs(base - guided).max() > 1e-6
