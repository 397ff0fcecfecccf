#!/usr/bin/env python3
"""A/B: fused window attention bf16 vs int8 q/k (sageattn tier) at exact
7B 1080p geometry (24 heads, 50 windows of <=405 tokens, 77 txt tokens).

8 kernel invocations chained in one jit (scan over stacked inputs) so the
per-call cost is floor-free, matching the round-3 methodology
(docs/PERFORMANCE.md "7B anomaly"). VERDICT r4 #6: measure the
SageAttention analog at 7B geometry or record a data-backed rejection.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from seedvr2_tpu.ops.fused_window_attention import fused_window_attention


def _force(out):
    return float(np.asarray(jnp.sum(out.astype(jnp.float32))))


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
    B, H, nW, S, D, Lt = 1, 24, 50, 405, 128, 77
    N = 8
    key = jax.random.PRNGKey(0)
    vid = jax.random.normal(key, (N, B, 3, H, nW, S, D), jnp.bfloat16) * 0.3
    txt = jax.random.normal(key, (N, B, 3, H, Lt, D), jnp.bfloat16) * 0.3
    vang = jax.random.normal(key, (nW, S, D), jnp.float32)
    tang = jnp.zeros((Lt, D), jnp.float32)
    valid = jnp.ones((nW, S), bool).at[:, 380:].set(False)
    norms = jnp.ones((4, D), jnp.float32)

    def chain(quant):
        def body(acc, inp):
            v, t = inp
            ov, ot = fused_window_attention(
                v, t, vang, tang, valid, False, norms, True, 1e-5, None, quant
            )
            return acc + jnp.sum(ov.astype(jnp.float32)) + jnp.sum(ot.astype(jnp.float32)), None

        f = jax.jit(lambda v, t: jax.lax.scan(body, jnp.float32(0.0), (v, t))[0])
        _force(f(vid, txt))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            _force(f(vid, txt))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_bf = chain(False)
    print(f"bf16 fused: {t_bf*1e3:.1f}ms / {N} calls = {t_bf/N*1e3:.2f}ms/call", flush=True)
    t_i8 = chain(True)
    print(f"int8 q/k:   {t_i8*1e3:.1f}ms / {N} calls = {t_i8/N*1e3:.2f}ms/call", flush=True)
    print(f"sentinel after: {sentinel():.3f}s", flush=True)

    # numerics at this geometry
    ov_b, _ = fused_window_attention(vid[0], txt[0], vang, tang, valid, False, norms, True, 1e-5, None, False)
    ov_i, _ = fused_window_attention(vid[0], txt[0], vang, tang, valid, False, norms, True, 1e-5, None, True)
    rel = float(jnp.max(jnp.abs(ov_b.astype(jnp.float32) - ov_i.astype(jnp.float32))) /
                (jnp.max(jnp.abs(ov_b.astype(jnp.float32))) + 1e-6))
    print(f"max rel diff vs bf16: {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
