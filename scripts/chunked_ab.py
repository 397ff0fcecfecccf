#!/usr/bin/env python3
"""A/B: streamed column-chunk fused pipeline vs single-executable fused.

Bench workload exactly (uint8 720p x5 -> 1080p, 3B int8, wavelet, packed
u8 output): phases.generate with cfg.chunked_output "auto" (head + one
executable per decode column tile, chunk fetch overlapping later tiles)
vs "off" (one executable per batch, output fetched after it completes)
vs "off"+decode_tile_batch=2 (both column tiles batched through one
scanned decoder body — amortizes weight streaming at 2x the decode
activation footprint). The chunked win, if any, is host-fetch time hidden
under device compute — the u8 1080p x5 output is ~16MB/chunk at the
tunnel's ~40MB/s.

Each case runs in a FRESH subprocess (a RESOURCE_EXHAUSTED poisons the
process's later HBM allocations — ROADMAP caveats), printing steady e2e
seconds (min of N wall-clock around phases.generate) with sentinels.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = {
    "chunked": dict(chunked_output="auto"),
    "monolithic": dict(chunked_output="off"),
    "mono_tb2": dict(chunked_output="off", decode_tile_batch=2),
    "chunked2": dict(chunked_output="auto"),
    # full-height column ENCODE tiles (VAE-only A/B: 1.136s vs 1.240s for
    # the 1024/128 grid — scripts/tile_grid_ab.py) inside the full chunked
    # pipeline
    "enc_fh": dict(
        chunked_output="auto",
        encode_tile_size=(1088, 1024),
        encode_tile_overlap=(0, 128),
    ),
}


def run_case(label: str) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.ops.quant import synthetic_quantized_dit_params_on_device
    from seedvr2_tpu.pipeline import phases
    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.utils.debug import Debug

    def sentinel():
        a = jnp.asarray(
            np.random.RandomState(7).rand(2048, 2048).astype(np.float32), jnp.bfloat16
        )

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

    over = CASES[label]
    print(f"[{label}] sentinel: {sentinel():.3f}s", flush=True)
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
    base.update(over)
    cfg = PipelineConfig(**base)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(5, 720, 1280, 3)).astype(np.uint8)
    text = (rng.randn(77, cfg.dit.txt_in_dim) * 0.02).astype(np.float32)
    dit_params = synthetic_quantized_dit_params_on_device(cfg.dit)
    vae_params = init_vae_params(cfg.vae, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    runner = Runner(cfg, dit_params, vae_params, text, debug=Debug(False))
    out = phases.generate(runner, frames, packed=True)  # compile
    assert out.dtype == np.uint8 and out.shape[0] == 5, (out.dtype, out.shape)
    used_chunks = (
        runner.supports_chunked(frames.shape, 1088, 1920) is not None
        and not getattr(runner, "_disable_chunked", False)
    )
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        phases.generate(runner, frames, packed=True)
        ts.append(time.perf_counter() - t0)
    print(
        f"[{label}] {over} chunks_active={used_chunks}: best {min(ts):.3f}s  "
        f"all={[round(t, 3) for t in ts]}",
        flush=True,
    )
    print(f"[{label}] sentinel after: {sentinel():.3f}s", flush=True)
    print(json.dumps({"case": label, "best_s": round(min(ts), 3),
                      "chunks_active": used_chunks}), flush=True)
    return 0


def main():
    results = []
    for label in CASES:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--case", label],
            timeout=1800,
        )
        if proc.returncode != 0:
            print(f"[{label}] FAILED rc={proc.returncode}", flush=True)
        results.append(label)
    return 0


if __name__ == "__main__":
    if "--case" in sys.argv:
        sys.exit(run_case(sys.argv[sys.argv.index("--case") + 1]))
    sys.exit(main())
