#!/usr/bin/env python3
"""Probe the Runner's jitted whole-VAE path under pipeline HBM pressure.

Usage: python scripts/jit_vae_probe.py [--frames 5] [--no-dit]
Measures encode + decode through Runner.vae_encode/vae_decode (the jitted
whole-tiled-driver path) with a resident bf16 3B DiT, at the pipeline's
default tile config. Fresh-process probe: one RESOURCE_EXHAUSTED poisons
HBM state, so run OOM-prone cases here rather than inside bench.py.
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
    return float(np.asarray(jnp.sum(out.astype(jnp.float32))))


def steady(fn, n=3):
    t0 = time.perf_counter()
    _force(fn())  # compile
    print(f"  (first call incl. compile: {time.perf_counter() - t0:.1f}s)", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--no-dit", action="store_true")
    ap.add_argument("--dec-tile", type=str, default="1024,1024",
                    help="decode tile h,w in pixels (e.g. 1088,1024 = full-height)")
    ap.add_argument("--dec-overlap", type=str, default="128,128")
    ap.add_argument("--skip-encode", action="store_true")
    args = ap.parse_args()
    dec_ts = tuple(int(v) for v in args.dec_tile.split(","))
    dec_to = tuple(int(v) for v in args.dec_overlap.split(","))

    from seedvr2_tpu.config import PipelineConfig
    from seedvr2_tpu.models.dit.nadit import init_params as init_dit
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.pipeline.runner import Runner

    cfg = PipelineConfig(
        encode_tiled=True,
        encode_tile_size=(1024, 1024),
        encode_tile_overlap=(128, 128),
        decode_tiled=True,
        decode_tile_size=dec_ts,
        decode_tile_overlap=dec_to,
    )
    vae_params = init_vae_params(cfg.vae, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    dit_params = None
    if not args.no_dit:
        dit_params = init_dit(cfg.dit, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        jax.block_until_ready(jax.tree.leaves(dit_params)[0])

    text = np.zeros((77, cfg.dit.txt_in_dim), np.float32)
    runner = Runner(cfg, dit_params, vae_params, text)

    T = args.frames
    Tl = (T - 1) // 4 + 1
    H, W = 1088, 1920
    video = jnp.asarray(
        np.random.RandomState(0).rand(1, T, 736, 1280, 3).astype(np.float32) * 2 - 1,
        jnp.bfloat16,
    )
    latent = jnp.asarray(
        np.random.RandomState(1).randn(1, Tl, H // 8, W // 8, cfg.vae.latent_channels) * 0.5,
        jnp.bfloat16,
    )

    print(f"encode cfg: tiled={cfg.encode_tiled} ts={cfg.encode_tile_size} "
          f"tb={cfg.encode_tile_batch}; decode cfg: tiled={cfg.decode_tiled} "
          f"ts={cfg.decode_tile_size} tb={cfg.decode_tile_batch}", flush=True)
    if not args.skip_encode:
        t = steady(lambda: runner.vae_encode(video))
        print(f"encode (jitted driver): {t:.3f}s", flush=True)
    t = steady(lambda: runner.vae_decode(latent))
    print(f"decode (jitted driver): {t:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
