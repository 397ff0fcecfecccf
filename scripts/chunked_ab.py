#!/usr/bin/env python3
"""A/B: streamed column-chunk fused pipeline vs single-executable fused.

Bench workload exactly (uint8 720p x5 -> 1080p, 3B int8, wavelet, packed
u8 output): phases.generate with cfg.chunked_output "auto" (head + one
executable per decode column tile, chunk fetch overlapping later tiles)
vs "off" (one executable per batch, output fetched after it completes).
The win, if any, is the host-fetch time hidden under device compute —
on this tunnel the u8 1080p x5 output is ~10MB/chunk at ~40MB/s.

Prints steady e2e seconds (min of N wall-clock around phases.generate)
per case, sentinel before/between/after.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sentinel():
    a = jnp.asarray(np.random.RandomState(7).rand(2048, 2048).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def mm(a):
        x = a
        for _ in range(8):
            x = x @ a
        return x

    float(np.asarray(jnp.sum(mm(a).astype(jnp.float32))))
    t0 = time.perf_counter()
    float(np.asarray(jnp.sum(mm(a).astype(jnp.float32))))
    return time.perf_counter() - t0


def main():
    from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.ops.quant import synthetic_quantized_dit_params_on_device
    from seedvr2_tpu.pipeline import phases
    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.utils.debug import Debug

    print(f"sentinel: {sentinel():.3f}s", flush=True)

    base = dict(
        dit=dit_3b(),
        vae=vae_config(),
        resolution=1080,
        batch_size=5,
        color_correction="wavelet",
        compute_dtype="bfloat16",
        output_bits=8,
        encode_tiled=True,
        encode_tile_size=(1024, 1024),
        encode_tile_overlap=(128, 128),
        decode_tiled=True,
        decode_tile_size=(1088, 1024),
        decode_tile_overlap=(0, 128),
    )
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(5, 720, 1280, 3)).astype(np.uint8)
    text = (rng.randn(77, base["dit"].txt_in_dim) * 0.02).astype(np.float32)
    dit_params = synthetic_quantized_dit_params_on_device(base["dit"])
    vae_params = init_vae_params(base["vae"], jax.random.PRNGKey(1), dtype=jnp.bfloat16)

    results = {}
    cases = (
        ("chunked", dict(chunked_output="auto")),
        ("monolithic", dict(chunked_output="off")),
        # both decode column tiles batched through ONE scanned decoder body:
        # every conv weight load serves 2x the work (the in-situ-vs-chain
        # gap is attributed to weight streaming, PERFORMANCE.md round-4)
        ("mono_tb2", dict(chunked_output="off", decode_tile_batch=2)),
        ("chunked2", dict(chunked_output="auto")),
    )
    for label, over in cases:
        cfg = PipelineConfig(**base, **over)
        runner = Runner(cfg, dit_params, vae_params, text, debug=Debug(False))
        out = phases.generate(runner, frames, packed=True)  # compile
        assert out.dtype == np.uint8 and out.shape[0] == 5, (out.dtype, out.shape)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            phases.generate(runner, frames, packed=True)
            ts.append(time.perf_counter() - t0)
        results[label] = min(ts)
        print(f"e2e {label} {over}: {min(ts):.3f}s  all={[round(t,3) for t in ts]}",
              flush=True)
        print(f"  sentinel: {sentinel():.3f}s", flush=True)
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
