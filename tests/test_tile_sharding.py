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
