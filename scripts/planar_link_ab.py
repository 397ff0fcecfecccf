#!/usr/bin/env python3
"""A/B: native yuv420p host link vs packed u8 RGB, full bench workload.

Round-5 bench geometry exactly (3B int8, 720p x5 -> 1080p, wavelet,
full-height column tiles both phases, chunked streaming, packed output):

- rgb:    uint8 RGB frames up (13.8 MB), packed u8 RGB chunks down
          (~31 MB total, last chunk ~15.5 MB exposed)
- planar: yuv420p planes up (6.9 MB), yuv420p plane chunks down
          (~15.5 MB total) — colorspace conversion runs ON DEVICE
          (ops/yuv.py), so the ~40 MB/s dev tunnel carries half the bytes
          each way. Expected ~0.17 s (upload) + ~0.2 s (exposed final
          chunk fetch) off the ~5.2 s e2e.

Fresh subprocess per case (OOM poisoning caveat, ROADMAP), sentinels
around each, min of N wall-clock over phases.generate."""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = ("rgb", "planar", "rgb2", "planar2")


def run_case(label: str) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.ops.quant import synthetic_quantized_dit_params_on_device
    from seedvr2_tpu.ops.yuv import PlanarYUV420, is_planar
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

    planar = label.startswith("planar")
    print(f"[{label}] sentinel: {sentinel():.3f}s", flush=True)
    cfg = PipelineConfig(
        dit=dit_3b(),
        vae=vae_config(),
        resolution=1080,
        batch_size=5,
        color_correction="wavelet",
        compute_dtype="bfloat16",
        output_bits=8,
        encode_tiled=True,
        encode_tile_size=(1088, 1024),
        encode_tile_overlap=(0, 128),
        decode_tiled=True,
        decode_tile_size=(1088, 1024),
        decode_tile_overlap=(0, 128),
        output_pixfmt="yuv420" if planar else "rgb",
    )
    rng = np.random.RandomState(0)
    if planar:
        frames = PlanarYUV420(
            rng.randint(16, 236, size=(5, 720, 1280)).astype(np.uint8),
            rng.randint(16, 241, size=(5, 360, 640)).astype(np.uint8),
            rng.randint(16, 241, size=(5, 360, 640)).astype(np.uint8),
        )
    else:
        frames = rng.randint(0, 256, size=(5, 720, 1280, 3)).astype(np.uint8)
    text = (rng.randn(77, cfg.dit.txt_in_dim) * 0.02).astype(np.float32)
    dit_params = synthetic_quantized_dit_params_on_device(cfg.dit)
    vae_params = init_vae_params(cfg.vae, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    runner = Runner(cfg, dit_params, vae_params, text, debug=Debug(False))
    out = phases.generate(runner, frames, packed=True)  # compile
    if planar:
        assert is_planar(out) and out.y.dtype == np.uint8, type(out)
    else:
        assert out.dtype == np.uint8 and out.shape[-1] == 3
    used_chunks = (
        runner.supports_chunked(frames.shape, 1088, 1920) is not None
        and not getattr(runner, "_disable_chunked", False)
    )
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        phases.generate(runner, frames, packed=True)
        ts.append(time.perf_counter() - t0)
    print(
        f"[{label}] chunks_active={used_chunks} planar_out={is_planar(out)}: "
        f"best {min(ts):.3f}s  all={[round(t, 3) for t in ts]}",
        flush=True,
    )
    print(f"[{label}] sentinel after: {sentinel():.3f}s", flush=True)
    print(json.dumps({"case": label, "best_s": round(min(ts), 3),
                      "chunks_active": used_chunks}), flush=True)
    return 0


def main():
    for label in CASES:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--case", label],
            timeout=1800,
        )
        if proc.returncode != 0:
            print(f"[{label}] FAILED rc={proc.returncode}", flush=True)
    return 0


if __name__ == "__main__":
    if "--case" in sys.argv:
        sys.exit(run_case(sys.argv[sys.argv.index("--case") + 1]))
    sys.exit(main())
