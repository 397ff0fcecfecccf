#!/usr/bin/env python3
"""Does an input upload overlap with device compute on this platform?

Premise for the split-upload lever (ROADMAP 9f): device_put is async, so
uploading the input in two column slices lets the first encode tile start
at ~half the transfer time while the second slice is still in flight.
This probe measures the primitive directly, without any pipeline surgery:

  A) upload 13.8MB u8 -> dependent compute          (serialized baseline)
  B) upload two halves; compute1 depends only on half 1, compute2 on both

If B < A by ~half the transfer time, the lever is real; if B == A the
platform serializes transfers with compute (or device_put blocks) and 9f
is dead — record the rejection either way (docs/PERFORMANCE.md round 5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


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
    print(f"sentinel: {sentinel():.3f}s", flush=True)
    rng = np.random.RandomState(0)
    # bench-shaped input: 5x720x1280x3 u8 = 13.8MB
    frames = rng.randint(0, 256, size=(5, 720, 1280, 3)).astype(np.uint8)
    half = frames.shape[2] // 2
    w = jnp.asarray(rng.rand(2048, 2048).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def work(x, w):
        # ~0.5s of matmul-bound compute seeded by the input slice (so XLA
        # cannot hoist it ahead of the transfer); fori_loop keeps the
        # program tiny for the remote compile helper
        v = jnp.sum(x.astype(jnp.float32)) * 1e-9
        a = w + v.astype(jnp.bfloat16)
        # ~0.17s at ~130 TFLOP/s (17.2 GFLOP per 2048^2 bf16 matmul) — the
        # same magnitude as the second half-slice's transfer, i.e. the
        # bench head's first-encode-tile compute
        return jax.lax.fori_loop(0, 1300, lambda i, a: a @ w, a)

    @jax.jit
    def join(a, b, y):
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32)) + jnp.sum(y.astype(jnp.float32))

    # warm all executables
    _force(work(jnp.asarray(frames[:, :, :half]), w))
    fa = jnp.asarray(frames[:, :, :half]); fb = jnp.asarray(frames[:, :, half:])
    float(np.asarray(join(fa, fb, work(fa, w))))
    fw = jnp.asarray(frames)
    float(np.asarray(join(fw[:, :, :half], fw[:, :, half:], work(fw[:, :, :half], w))))

    def run_mono():
        t0 = time.perf_counter()
        f = jnp.asarray(frames)  # full upload
        y = work(f[:, :, :half], w)
        r = join(f[:, :, :half], f[:, :, half:], y)
        float(np.asarray(r))
        return time.perf_counter() - t0

    def run_split():
        t0 = time.perf_counter()
        a = jnp.asarray(frames[:, :, :half])   # slice A first on the link
        b = jnp.asarray(frames[:, :, half:])   # B queued behind A
        y = work(a, w)                          # needs only A
        r = join(a, b, y)                       # needs everything
        float(np.asarray(r))
        return time.perf_counter() - t0

    def run_upload_only():
        t0 = time.perf_counter()
        f = jnp.asarray(frames)
        _force(f[0, 0, :8, 0])
        return time.perf_counter() - t0

    up = min(run_upload_only() for _ in range(3))
    mono = min(run_mono() for _ in range(3))
    split = min(run_split() for _ in range(3))
    print(f"upload only (13.8MB): {up:.3f}s", flush=True)
    print(f"mono  (full upload -> compute):      {mono:.3f}s", flush=True)
    print(f"split (half upload -> compute || B): {split:.3f}s", flush=True)
    print(f"sentinel after: {sentinel():.3f}s", flush=True)
    print(f"overlap_gain_s: {mono - split:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
