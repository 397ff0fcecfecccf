#!/usr/bin/env python3
"""Where does the decode wall time live: per-tile body vs driver glue?

The round-3 anatomy summed standalone op chains to ~1.55s of the measured
2.25s tiled decode and attributed ~0.7s to 'diffuse driver glue'. This
probe splits it differently: time slicing_decode on EXACTLY the tile shape
the driver runs (one jit, no scan/blend/acc), then the full driver. If
n_tiles * per_tile ~= driver, the slack is INSIDE the decoder body (the
anatomy chains undercount: they reuse one weight and one shape); if not,
it's the scan/blend/accumulate glue.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    return float(np.asarray(jnp.sum(out.astype(jnp.float32))))


def steady(fn, n=3):
    _force(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def sentinel():
    a = jnp.asarray(np.random.RandomState(7).rand(2048, 2048).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def mm(a):
        x = a
        for _ in range(8):
            x = x @ a
        return x

    _force(mm(a))
    t0 = time.perf_counter()
    _force(mm(a))
    return time.perf_counter() - t0


def main():
    from seedvr2_tpu.config import vae_config
    from seedvr2_tpu.models.vae import tiling
    from seedvr2_tpu.models.vae.model import init_vae_params

    print(f"sentinel: {sentinel():.3f}s", flush=True)
    cfg = vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    # bench decode grid: latent 136x240, tiles (1088,1024)/(0,128) ->
    # lt 136x128, 1 row x 2 cols
    tile = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 136, 128, 16), jnp.bfloat16) * 0.5
    one = jax.jit(lambda p, z: tiling.slicing_decode(p, cfg, z))
    t_tile = steady(lambda: one(params, tile))
    print(f"per-tile slicing_decode [1,2,136,128,16]: {t_tile:.3f}s "
          f"(x2 tiles = {2*t_tile:.3f}s)", flush=True)

    latent = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 136, 240, 16), jnp.bfloat16) * 0.5
    drv = jax.jit(
        lambda p, z: tiling.vae_decode(
            p, cfg, z, tiled=True, tile_size=(1088, 1024), tile_overlap=(0, 128)
        )
    )
    t_drv = steady(lambda: drv(params, latent))
    print(f"tiled driver (2 tiles + blend/acc): {t_drv:.3f}s "
          f"(glue = {t_drv - 2*t_tile:.3f}s)", flush=True)

    # smaller-tile grid for comparison (4 tiles of 544x512-px)
    drv2 = jax.jit(
        lambda p, z: tiling.vae_decode(
            p, cfg, z, tiled=True, tile_size=(544, 512), tile_overlap=(0, 64)
        )
    )
    t_drv2 = steady(lambda: drv2(params, latent))
    print(f"tiled driver 544x512: {t_drv2:.3f}s", flush=True)

    print(f"sentinel mid: {sentinel():.3f}s", flush=True)

    # LAST (OOM risk): untiled full-frame decode — no driver at all.
    try:
        full = jax.jit(lambda p, z: tiling.slicing_decode(p, cfg, z))
        t_full = steady(lambda: full(params, latent))
        print(f"untiled full-frame decode: {t_full:.3f}s", flush=True)
    except Exception as e:
        print(f"untiled full-frame decode failed: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
    print(f"sentinel after: {sentinel():.3f}s", flush=True)


if __name__ == "__main__":
    main()
