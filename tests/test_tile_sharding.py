"""Tile-parallel VAE decode across the data mesh axis."""

import jax
import jax.numpy as jnp
import numpy as np

from seedvr2_tpu.config import vae_tiny
from seedvr2_tpu.models.vae import tiling
from seedvr2_tpu.models.vae.model import init_vae_params
from seedvr2_tpu.parallel.mesh import make_mesh


def test_tile_sharded_decode_matches_unsharded():
    cfg = vae_tiny()
    params = init_vae_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, cfg.latent_channels)) * 0.5

    base = tiling.tiled_decode(params, cfg, z, tile_size=(32, 32), tile_overlap=(8, 8), tile_batch=2)

    mesh = make_mesh(data=2)
    shard = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    out = tiling.tiled_decode(
        params, cfg, z, tile_size=(32, 32), tile_overlap=(8, 8),
        tile_batch=2, tile_sharding=shard,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_runner_tile_parallel_short_clip():
    """A mesh-holding Runner tile-parallelizes single-segment VAE work
    across "data" (the short-clip replacement for the reference's stubbed
    temporal context-parallel ring) and matches the meshless result."""
    import dataclasses

    from seedvr2_tpu.config import PipelineConfig, dit_tiny
    from seedvr2_tpu.models.dit.nadit import init_params as init_dit
    from seedvr2_tpu.pipeline.runner import Runner

    vae_cfg = vae_tiny()
    dit_cfg = dataclasses.replace(
        dit_tiny(),
        vid_in_channels=2 * vae_cfg.latent_channels + 1,
        vid_out_channels=vae_cfg.latent_channels,
    )
    cfg = PipelineConfig(
        dit=dit_cfg, vae=vae_cfg, resolution=32, compute_dtype="float32",
        decode_tiled=True, decode_tile_size=(32, 32), decode_tile_overlap=(8, 8),
        encode_tiled=True, encode_tile_size=(32, 32), encode_tile_overlap=(8, 8),
    )
    dit_params = init_dit(dit_cfg, jax.random.PRNGKey(0))
    vae_params = init_vae_params(vae_cfg, jax.random.PRNGKey(1))
    text = np.zeros((4, dit_cfg.txt_in_dim), np.float32)

    video = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 64, 48, 3)) * 0.4
    base_r = Runner(cfg, dit_params, vae_params, text)
    lat_base = base_r.vae_encode(video)
    dec_base = base_r.vae_decode(lat_base)

    mesh_r = Runner(cfg, dit_params, vae_params, text, mesh=make_mesh(data=2))
    lat = mesh_r.vae_encode(video)
    dec = mesh_r.vae_decode(lat)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_base), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec_base), atol=1e-5)
