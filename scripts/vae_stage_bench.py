#!/usr/bin/env python3
"""Stage-level VAE throughput probe on the real chip (1080p 5-frame shapes).

Usage: python scripts/vae_stage_bench.py [--dit-resident] [--cases name,name]
Prints one line per case: name, steady seconds (min of N).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    # block_until_ready is unreliable over the axon tunnel; a scalar fetch
    # forces the full computation with negligible transfer.
    return float(np.asarray(jnp.sum(out.astype(jnp.float32))))


def steady(fn, n=3):
    _force(fn())  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit-resident", action="store_true",
                    help="allocate a 3B bf16 DiT to mimic pipeline HBM pressure")
    ap.add_argument("--dit-int8", action="store_true",
                    help="allocate a 3B int8-at-rest DiT instead (the fp8-tier "
                         "default's footprint, ~3.2GB vs 6.2GB bf16)")
    ap.add_argument("--cases", type=str, default="")
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()

    from seedvr2_tpu.config import dit_3b, vae_config
    from seedvr2_tpu.models.vae import tiling
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.ops.conv3d_kernel import set_conv_backend

    cfg = vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    dit_params = None
    if args.dit_int8:
        from seedvr2_tpu.models.dit.nadit import stack_blocks
        from seedvr2_tpu.ops.quant import synthetic_quantized_dit_params

        dit_params = jax.tree.map(
            jnp.asarray, synthetic_quantized_dit_params(dit_3b())
        )
        dit_params = stack_blocks(dit_params, dit_3b())
        _force(jax.tree.leaves(dit_params)[0])
    elif args.dit_resident:
        from seedvr2_tpu.models.dit.nadit import init_params as init_dit

        dit_params = init_dit(dit_3b(), jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        jax.block_until_ready(jax.tree.leaves(dit_params)[0])

    T = args.frames
    Tl = (T - 1) // 4 + 1
    H, W = 1088, 1920
    video = jnp.asarray(np.random.RandomState(0).rand(1, T, H, W, 3).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)
    latent = jnp.asarray(np.random.RandomState(1).randn(1, Tl, H // 8, W // 8, 16) * 0.5,
                         jnp.bfloat16)

    # Jit the WHOLE tiled driver exactly as the product path does
    # (Runner._vae_fn): the eager driver pays a tunnel round trip per scan
    # step and measures ~10x slower than what the pipeline actually runs.
    def dec(tb, ts=(512, 512), to=(64, 64)):
        f = jax.jit(lambda p, z: tiling.vae_decode(
            p, cfg, z, tiled=True, tile_size=ts, tile_overlap=to, tile_batch=tb))
        return lambda: f(params, latent)

    def enc(tb, ts=(512, 512), to=(64, 64)):
        f = jax.jit(lambda p, v: tiling.vae_encode(
            p, cfg, v, tiled=True, tile_size=ts, tile_overlap=to, tile_batch=tb))
        return lambda: f(params, video)

    def dec_untiled():
        f = jax.jit(lambda p, z: tiling.vae_decode(p, cfg, z))
        return lambda: f(params, latent)

    def enc_untiled():
        f = jax.jit(lambda p, v: tiling.vae_encode(p, cfg, v))
        return lambda: f(params, video)

    cases = {
        "dec_xla_tb1": ("xla", dec(1)),
        "dec_xla_tb4": ("xla", dec(4)),
        "dec_pallas_tb1": ("pallas", dec(1)),
        "dec_pallas_tb4": ("pallas", dec(4)),
        "dec_pallas_tb8": ("pallas", dec(8)),
        "dec_xla_768": ("xla", dec(1, (768, 768), (64, 64))),
        "dec_pallas_768": ("pallas", dec(1, (768, 768), (64, 64))),
        "dec_xla_1024": ("xla", dec(1, (1024, 1024), (128, 128))),
        "dec_pallas_1024": ("pallas", dec(1, (1024, 1024), (128, 128))),
        "dec_xla_tall": ("xla", dec(1, (1088, 1024), (0, 128))),
        "dec_pallas_tall": ("pallas", dec(1, (1088, 1024), (0, 128))),
        "dec_xla_untiled": ("xla", dec_untiled()),
        "dec_pallas_untiled": ("pallas", dec_untiled()),
        "enc_xla_tb1": ("xla", enc(1)),
        "enc_pallas_tb1": ("pallas", enc(1)),
        "enc_xla_768": ("xla", enc(1, (768, 768), (64, 64))),
        "enc_xla_tall": ("xla", enc(1, (1088, 1024), (0, 128))),
        "enc_pallas_tb4": ("pallas", enc(4)),
        "enc_pallas_untiled": ("pallas", enc_untiled()),
    }
    run = [c for c in args.cases.split(",") if c] or list(cases)
    for name in run:
        backend, fn = cases[name]
        set_conv_backend(backend)
        try:
            t = steady(fn)
            print(f"{name}: {t:.3f}s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
