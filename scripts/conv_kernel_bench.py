#!/usr/bin/env python3
"""Raw 3x3x3 conv kernel micro-benchmark at VAE stage shapes.

Compares XLA conv_general_dilated vs the Element-halo Pallas kernel vs the
im2col (tap-folded K) Pallas kernel. Prints TFLOP/s per case.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def force(out):
    return float(np.asarray(jnp.sum(out.astype(jnp.float32))))


def bench(fn, n=3):
    force(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=str, default="")
    args = ap.parse_args()
    from seedvr2_tpu.ops.conv3d_kernel import conv3d_3x3x3, conv3d_3x3x3_im2col

    # (T, H, W, Cin, Cout): decode stage shapes for a 408x440px tile at
    # 1080p (equalized grid) and for a full 1088x1920 frame slab.
    shapes = {
        "tile_c128": (5, 408, 440, 128, 128),
        "tile_c256": (5, 204, 220, 256, 256),
        "tile_c512": (2, 102, 110, 512, 512),
        "frame_c128": (5, 1088, 960, 128, 128),  # half-frame: fits HBM
        "enc_c128": (5, 544, 960, 128, 128),
    }
    run = [c for c in args.cases.split(",") if c] or list(shapes)
    for name in run:
        T, H, W, Cin, Cout = shapes[name]
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(k1, (1, T + 2, H, W, Cin), jnp.bfloat16) * 0.5
        w = jax.random.normal(k2, (3, 3, 3, Cin, Cout), jnp.bfloat16) * 0.05
        b = jax.random.normal(k3, (Cout,), jnp.bfloat16) * 0.1
        flops = 2 * 27 * T * H * W * Cin * Cout

        def xla(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            return y + b

        for impl, fn in [
            ("xla", jax.jit(xla)),
            ("halo", jax.jit(conv3d_3x3x3)),
            ("im2col", jax.jit(conv3d_3x3x3_im2col)),
        ]:
            try:
                t = bench(lambda fn=fn: fn(x, w, b))
                print(f"{name} {impl}: {t*1e3:.1f}ms  {flops/t/1e12:.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"{name} {impl}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
