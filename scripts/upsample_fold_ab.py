#!/usr/bin/env python3
"""A/B: folded upsample (models/vae/folded_upsample.py) vs the naive
expansion + depth-to-space + 3x3x3-conv path, at the bench decode/encode
shapes on real hardware.

Expectation from the FLOP count (docs/PERFORMANCE.md round-5): the folded
form removes ~27 of the 138 TFLOP of a 1088x1024 decode tile (3.5x cut on
the up0/up1 upsample convs, 2.33x on up2) and never materializes the
high-res pre-conv tensor, so the per-tile body should drop ~0.2-0.3s from
1.185s. Run one case per process if an OOM shows up (OOM poisons later
allocations on this platform).
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


def steady(fn, n=4):
    _force(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


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
    from seedvr2_tpu.models.vae import model as M
    from seedvr2_tpu.models.vae import tiling
    from seedvr2_tpu.models.vae.model import init_vae_params

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"sentinel: {sentinel():.3f}s", flush=True)
    cfg = vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tile = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 136, 128, 16), jnp.bfloat16) * 0.5
    latent = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 136, 240, 16), jnp.bfloat16) * 0.5

    def run(label, folded):
        M.set_folded_upsample(folded)
        one = jax.jit(lambda p, z: tiling.slicing_decode(p, cfg, z))
        t_tile, ts = steady(lambda: one(params, tile))
        print(f"[{label}] per-tile decode [1,2,136,128,16]: {t_tile:.3f}s {['%.2f' % t for t in ts]}", flush=True)
        drv = jax.jit(
            lambda p, z: tiling.vae_decode(
                p, cfg, z, tiled=True, tile_size=(1088, 1024), tile_overlap=(0, 128)
            )
        )
        t_drv, ts = steady(lambda: drv(params, latent))
        print(f"[{label}] tiled decode driver (2 tiles): {t_drv:.3f}s {['%.2f' % t for t in ts]}", flush=True)
        print(f"[{label}] sentinel: {sentinel():.3f}s", flush=True)
        return t_drv

    if which in ("naive", "both"):
        t_n = run("naive", False)
    if which in ("folded", "both"):
        t_f = run("folded", True)
    if which == "both":
        print(f"folded vs naive: {t_f:.3f}s vs {t_n:.3f}s ({t_n - t_f:+.3f}s)", flush=True)


if __name__ == "__main__":
    main()
