#!/usr/bin/env python3
"""Benchmark: end-to-end SeedVR2-3B upscale throughput on one TPU chip.

Measures the full 4-phase pipeline (VAE encode -> one-step 3B NaDiT ->
VAE decode -> wavelet color fix) on a 5-frame 720p -> 1080p clip with
randomly-initialized bf16 weights — weight values don't change the math
cost, so this is the honest architecture-level frames/sec the reference
reports per run (reference: inference_cli.py:1694-1697).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no fps tables (BASELINE.md). We
compare against an estimated 2.0 fps for the same config on the reference's
torch/CUDA stack on a consumer RTX 4090-class GPU (README-tier hardware,
derived from the repo's qualitative claims: batch-5 720p->1080p 3B fp16 with
torch.compile). Update when a measured reference number exists.
"""

import json
import os
import sys
import time

REF_FPS_ESTIMATE = 2.0

FRAMES = 5
IN_H, IN_W = 720, 1280
RESOLUTION = 1080  # shortest-edge target
REPEATS = 4  # min-of-N; the dev tunnel adds +/-30% run-to-run noise


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
    from seedvr2_tpu.models.dit.nadit import init_params as init_dit
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.pipeline import phases
    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.utils.debug import Debug

    cfg = PipelineConfig(
        dit=dit_3b(),
        vae=vae_config(),
        resolution=RESOLUTION,
        batch_size=FRAMES,
        color_correction="wavelet",
        compute_dtype="bfloat16",
        # VAE tiling: the 16GB HBM of one v5e chip is the reference's
        # "12-16GB -> use tiling" tier (README.md:342); reference-default
        # 512/64 tiles keep decode activations ~350MB/buffer next to the
        # 6.2GB resident DiT.
        encode_tiled=True,
        encode_tile_size=(512, 512),
        encode_tile_overlap=(64, 64),
        decode_tiled=True,
        decode_tile_size=(512, 512),
        decode_tile_overlap=(64, 64),
    )
    dtype = jnp.bfloat16
    dit_params = init_dit(cfg.dit, jax.random.PRNGKey(0), dtype=dtype)
    vae_params = init_vae_params(cfg.vae, jax.random.PRNGKey(1), dtype=dtype)
    rng = np.random.RandomState(0)
    text = (rng.randn(77, cfg.dit.txt_in_dim) * 0.02).astype(np.float32)
    runner = Runner(cfg, dit_params, vae_params, text, debug=Debug(False))

    frames = rng.rand(FRAMES, IN_H, IN_W, 3).astype(np.float32)

    # Warmup (compiles every phase executable).
    out = phases.generate(runner, frames)
    assert out.shape[0] == FRAMES and np.isfinite(out).all()

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = phases.generate(runner, frames)
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = FRAMES / best

    print(
        json.dumps(
            {
                "metric": "e2e_frames_per_sec_3b_720p_to_1080p",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / REF_FPS_ESTIMATE, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
