#!/usr/bin/env python3
"""Isolate where the folded upsample loses time: per-upsample-stage A/B
(naive vs folded) at exact bench tile shapes, plus the folded pieces
(weight fold, phase conv, interleave) timed separately."""

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
    _force(fn())
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
    from seedvr2_tpu.config import vae_tiny, vae_config
    from seedvr2_tpu.models.vae import model as M
    from seedvr2_tpu.models.vae import folded_upsample as F
    from seedvr2_tpu.models.vae.causal_conv import StreamCtx

    print(f"sentinel: {sentinel():.3f}s", flush=True)
    key = jax.random.PRNGKey(0)

    # bench tile decode shapes: up0 in [1,2,136,128,512] tz2; up1 in
    # [1,3,272,256,512] tz2; up2 in [1,5,544,512,256] tz1
    sel = sys.argv[1] if len(sys.argv) > 1 else None
    cases = [
        ("up0", (1, 2, 136, 128, 512), 512, True),
        ("up1", (1, 3, 272, 256, 512), 512, True),
        ("up2", (1, 5, 544, 512, 256), 256, False),
    ]
    cfg = vae_config()
    for name, shape, c, tup in cases:
        if sel and name != sel:
            continue
        ratio = 8 if tup else 4
        ks = jax.random.split(jax.random.PRNGKey(hash(name) % 2**31), 4)
        p = {
            "upscale": {
                "w": jax.random.normal(ks[0], (1, 1, 1, c, c * ratio), jnp.bfloat16) * 0.1,
                "b": jax.random.normal(ks[1], (c * ratio,), jnp.bfloat16) * 0.1,
            },
            "conv": {
                "w": jax.random.normal(ks[2], (3, 3, 3, c, c), jnp.bfloat16) * 0.05,
                "b": jax.random.normal(ks[3], (c,), jnp.bfloat16) * 0.1,
            },
        }
        x = jax.random.normal(key, shape, jnp.bfloat16) * 0.5

        M.set_folded_upsample(False)
        naive = jax.jit(lambda p_, x_: M._upsample(p_, cfg, x_, StreamCtx("disabled"), "u", tup))
        t_n = steady(lambda: naive(p, x))
        M.set_folded_upsample(True)
        fold = jax.jit(lambda p_, x_: F.upsample_folded(p_, cfg, x_, StreamCtx("disabled"), "u", tup))
        t_f = steady(lambda: fold(p, x))
        print(f"[{name}] naive {t_n*1e3:.1f}ms  folded {t_f*1e3:.1f}ms", flush=True)

        # (XLA-form piece timings only meaningful off-TPU; the TPU path
        # is the Pallas kernel and the XLA pieces OOM at up2 shapes)
    print(f"sentinel after: {sentinel():.3f}s", flush=True)


if __name__ == "__main__":
    main()
