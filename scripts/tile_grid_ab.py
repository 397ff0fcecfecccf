#!/usr/bin/env python3
"""Tile-grid A/Bs: (1) encode full-height column tiles vs the square
1024/128 grid at the bench 1080p workload; (2) 4K decode with full-height
column tiles (removes the unblended vertical seam of the (1088,1024) grid
at 4K, where rows=2 with zero vertical overlap) vs the current grid.
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

    # --only SUBSTR: run just the matching cases (isolate OOM-prone ones)
    flt = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv else None

    print(f"sentinel: {sentinel():.3f}s", flush=True)
    cfg = vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    video = jax.random.uniform(jax.random.PRNGKey(2), (1, 5, 1088, 1920, 3), jnp.bfloat16) * 2 - 1
    for name, ts, to in (
        ("enc 1024/128 (today: 4 tiles 608x1024)", (1024, 1024), (128, 128)),
        ("enc full-height (2 tiles 1088x1024)", (1088, 1024), (0, 128)),
    ):
        if flt and flt not in name:
            continue
        fn = jax.jit(
            lambda p, v, _ts=ts, _to=to: tiling.vae_encode(
                p, cfg, v, tiled=True, tile_size=_ts, tile_overlap=_to
            )
        )
        print(f"{name}: {steady(lambda: fn(params, video)):.3f}s", flush=True)
    del video

    print(f"sentinel mid: {sentinel():.3f}s", flush=True)

    lat4k = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 272, 480, 16), jnp.bfloat16) * 0.5
    for name, ts, to in (
        ("dec4k 1088x1024 (15 blended 816x872 tiles after the seam fix)", (1088, 1024), (0, 128)),
        ("dec4k full-height (5 tiles 2176x872, no row seam)", (2176, 1024), (0, 128)),
        # tile_h=1152 is the smallest height whose equalized grid covers 2176
        # rows in TWO blended rows (lt 144, overlap 16 latent); any height in
        # [1152, 2175] yields the same grid. Buffers stay under the helper's
        # compile limit (c128 stage ~1.3GB vs full-height's 2.85GB failure).
        ("dec4k 1152x1024 (10 blended 1152x872 tiles)", (1152, 1024), (0, 128)),
        ("dec4k 1152x1152 (8 blended 1152x1056 tiles)", (1152, 1152), (0, 128)),
    ):
        if flt and flt not in name:
            continue
        try:
            fn = jax.jit(
                lambda p, z, _ts=ts, _to=to: tiling.vae_decode(
                    p, cfg, z, tiled=True, tile_size=_ts, tile_overlap=_to
                )
            )
            print(f"{name}: {steady(lambda: fn(params, lat4k)):.3f}s", flush=True)
        except Exception as e:
            print(f"{name}: failed {type(e).__name__}: {str(e)[:100]}", flush=True)
    print(f"sentinel after: {sentinel():.3f}s", flush=True)


if __name__ == "__main__":
    main()
