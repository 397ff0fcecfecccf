#!/usr/bin/env python3
"""Staged TPU memory/latency probe: compile + run each pipeline stage
separately with timing and HBM reporting. Debugging aid for bench.py."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def hbm(tag):
    stats = jax.devices()[0].memory_stats() or {}
    used = stats.get("bytes_in_use", 0) / 1e9
    peak = stats.get("peak_bytes_in_use", 0) / 1e9
    print(f"[{tag}] HBM used={used:.2f}GB peak={peak:.2f}GB", flush=True)


def main():
    from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
    from seedvr2_tpu.models.dit.nadit import init_params as init_dit
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.ops.resize import pipeline_transform
    from seedvr2_tpu.utils.debug import Debug

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    frames_n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tiled = "--tiled" in sys.argv

    cfg = PipelineConfig(
        dit=dit_3b(),
        vae=vae_config(),
        resolution=res,
        batch_size=frames_n,
        encode_tiled=tiled,
        decode_tiled=tiled,
        encode_tile_size=(1024, 1024),
        encode_tile_overlap=(128, 128),
        decode_tile_size=(1024, 1024),
        decode_tile_overlap=(128, 128),
    )
    dtype = jnp.bfloat16
    print("init params...", flush=True)
    t0 = time.time()
    dit_params = init_dit(cfg.dit, jax.random.PRNGKey(0), dtype=dtype)
    jax.block_until_ready(dit_params)
    vae_params = init_vae_params(cfg.vae, jax.random.PRNGKey(1), dtype=dtype)
    jax.block_until_ready(vae_params)
    print(f"params ready {time.time()-t0:.1f}s", flush=True)
    hbm("params")

    rng = np.random.RandomState(0)
    text = (rng.randn(77, cfg.dit.txt_in_dim) * 0.02).astype(np.float32)
    runner = Runner(cfg, dit_params, vae_params, text, debug=Debug(True))

    frames = jnp.asarray(rng.rand(frames_n, 720, 1280, 3).astype(np.float32))

    t0 = time.time()
    tv = pipeline_transform(frames, cfg.resolution, cfg.max_resolution)
    tv = tv.astype(dtype).block_until_ready()
    print(f"transform {time.time()-t0:.1f}s shape={tv.shape}", flush=True)
    hbm("transform")

    t0 = time.time()
    lat = runner.vae_encode(tv[None]).block_until_ready()
    print(f"encode compile+run {time.time()-t0:.1f}s latent={lat.shape}", flush=True)
    hbm("encode")
    t0 = time.time()
    lat = runner.vae_encode(tv[None]).block_until_ready()
    print(f"encode steady {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    up = runner.upscale(lat, 42).block_until_ready()
    print(f"dit compile+run {time.time()-t0:.1f}s", flush=True)
    hbm("dit")
    t0 = time.time()
    up = runner.upscale(lat, 42).block_until_ready()
    print(f"dit steady {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    out = runner.vae_decode(up).block_until_ready()
    print(f"decode compile+run {time.time()-t0:.1f}s out={out.shape}", flush=True)
    hbm("decode")
    t0 = time.time()
    out = runner.vae_decode(up).block_until_ready()
    print(f"decode steady {time.time()-t0:.2f}s", flush=True)

    total = None
    print("OK", flush=True)


if __name__ == "__main__":
    main()
