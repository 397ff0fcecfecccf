#!/usr/bin/env python3
"""A/B: GroupNorm+SiLU fused into the conv prologue vs separate passes.

Bench-config shapes (3B workload): decode latent 2x136x240 -> 1088x1920
with full-height 1088x1024 tiles; encode 1088x1920 with 1024/128 tiles.
int8 3B DiT resident to mimic pipeline HBM pressure. Prints steady seconds
(min of N, scalar-fetch completion) per case, sentinel before/after.
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
    _force(fn())  # compile
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
    from seedvr2_tpu.config import dit_3b, vae_config
    from seedvr2_tpu.models.vae import tiling
    from seedvr2_tpu.models.vae.causal_conv import set_gn_fusion
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.ops.quant import synthetic_quantized_dit_params_on_device

    print(f"sentinel: {sentinel():.3f}s", flush=True)
    cfg = vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    dit_resident = synthetic_quantized_dit_params_on_device(dit_3b())
    jax.block_until_ready(jax.tree.leaves(dit_resident)[0])

    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 136, 240, 16), jnp.bfloat16) * 0.5
    video = jax.random.uniform(jax.random.PRNGKey(2), (1, 5, 1088, 1920, 3), jnp.bfloat16) * 2 - 1

    for label, fused in (("separate", False), ("fused", True)):
        set_gn_fusion(fused)
        dec = jax.jit(
            lambda p, z, _l=label: tiling.vae_decode(
                p, cfg, z, tiled=True, tile_size=(1088, 1024), tile_overlap=(0, 128)
            )
        )
        t = steady(lambda: dec(params, latent))
        print(f"decode gn={label}: {t:.3f}s", flush=True)

    for label, fused in (("separate", False), ("fused", True)):
        set_gn_fusion(fused)
        enc = jax.jit(
            lambda p, v, _l=label: tiling.vae_encode(
                p, cfg, v, tiled=True, tile_size=(1024, 1024), tile_overlap=(128, 128)
            )
        )
        t = steady(lambda: enc(params, video))
        print(f"encode gn={label}: {t:.3f}s", flush=True)

    print(f"sentinel after: {sentinel():.3f}s", flush=True)


if __name__ == "__main__":
    main()
