#!/usr/bin/env python3
"""Decompose the 2.25s tiled decode: chain N copies of each candidate op
inside ONE jit so the ~27ms dispatch floor amortizes away (single-op
microbenches on this tunnel cannot resolve ms-level costs — see
docs/PERFORMANCE.md "decode accounting").

Cases, all at full-height-tile decode shapes (1088x1024 px tile, 5 frames):
  conv_c128 / conv_c256 / conv_c512  - halo Pallas conv, 8-chain
  conv_c512_xla                      - XLA lowering at the worst shape
  gn_silu_c128                       - GroupNorm(32, fp32 stats)+SiLU, 8-chain
  upsample_c256                      - nearest 2x spatial upsample, 8-chain
  attn_mid                           - per-frame latent self-attention (mid
                                       block geometry), 8-chain

Prints per-case: chained steady s, per-op ms, TFLOP/s where meaningful.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 8


def steady(fn, *args, n=3):
    out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree.leaves(out)[0][..., :1, :1].astype(jnp.float32))))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.sum(jax.tree.leaves(out)[0][..., :1, :1].astype(jnp.float32))))
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

    s = steady(mm, a)
    print(f"sentinel: {s*1000:.1f}ms ({'calm' if s < 0.12 else 'HOT'})", flush=True)
    return s


def conv_case(name, T, Hs, Ws, C, backend):
    from seedvr2_tpu.ops import conv3d_kernel as ck

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (1, T, Hs, Ws, C), jnp.bfloat16) * 0.5
    w = jax.random.normal(k2, (3, 3, 3, C, C), jnp.bfloat16) * (0.05 / np.sqrt(C))

    def one(x):
        if backend == "pallas":
            y = ck.conv3d_3x3x3(jnp.concatenate([x[:, :1], x[:, :1], x], 1), w, None)
        else:
            y = jax.lax.conv_general_dilated(
                jnp.concatenate([x[:, :1], x[:, :1], x], 1), w, (1, 1, 1),
                [(0, 0), (1, 1), (1, 1)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        return y

    @jax.jit
    def chain(x):
        for _ in range(N):
            x = one(x)
        return x

    s = steady(chain, x)
    flops = N * 2 * 27 * T * Hs * Ws * C * C
    print(f"{name}: {s*1000/N:.1f}ms/op  {flops/s/1e12:.1f} TFLOP/s", flush=True)


def gn_silu_case(name, T, Hs, Ws, C):
    """PER-FRAME GroupNorm stats (reduce H, W, group channels — NOT T),
    mirroring models/vae/model.py:_gn exactly (ADVICE r3: the earlier probe
    reduced over T too, a different reduction structure than the VAE's)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, Hs, Ws, C), jnp.bfloat16)
    g = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)

    def one(x):
        xf = x.astype(jnp.float32).reshape(T, Hs, Ws, 32, C // 32)
        mu = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(1, T, Hs, Ws, C)
        y = y * g + b
        return (y * jax.nn.sigmoid(y)).astype(x.dtype)

    @jax.jit
    def chain(x):
        for _ in range(N):
            x = one(x)
        return x

    s = steady(chain, x)
    # Traffic model: XLA computes two-pass stats + normalize, so the
    # minimum HBM traffic is 3 tensor reads + 1 write (bf16). The printed
    # GB/s uses THIS model — keep docs/PERFORMANCE.md's wording in sync
    # (ADVICE r3: the doc said 3r+1w while the old formula counted 1r+1w).
    gb = N * 4 * T * Hs * Ws * C * 2 / 1e9  # 3 reads + 1 write, bf16
    print(f"{name}: {s*1000/N:.1f}ms/op  ({gb/N:.2f}GB traffic/op at 3r+1w -> "
          f"{gb/s:.0f} GB/s effective)", flush=True)


def upsample_case(name, T, Hs, Ws, C):
    """One REAL 2x2 nearest upsample then a 2x2 mean-pool back to shape.
    The old repeat-then-stride-2-slice chain was algebraically the identity
    (ADVICE r3) and XLA could elide it; mean-pool is not the inverse of
    nearest-repeat composition XLA can cancel, so each step does real
    memory traffic. Reported per-op cost is HALF the step (up + pool are
    both ~the same traffic), i.e. an upper bound on one upsample."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, T, Hs, Ws, C), jnp.bfloat16)

    @jax.jit
    def chain(x):
        y = x
        for _ in range(N):
            u = jnp.repeat(jnp.repeat(y, 2, axis=2), 2, axis=3)
            y = u.reshape(1, T, Hs, 2, Ws, 2, C).mean(axis=(3, 5)).astype(x.dtype)
        return y

    s = steady(chain, x)
    print(f"{name}: {s*1000/(2*N):.1f}ms/op (upper bound: half of up+pool step)",
          flush=True)


def attn_case(name, T, L, C):
    q = jax.random.normal(jax.random.PRNGKey(3), (T, L, C), jnp.bfloat16) * 0.1

    @jax.jit
    def chain(q):
        x = q
        for _ in range(N):
            s = jnp.einsum("tlc,tmc->tlm", x, x).astype(jnp.float32) / np.sqrt(C)
            p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            x = jnp.einsum("tlm,tmc->tlc", p, x)
        return x

    s = steady(chain, q)
    flops = N * T * (2 * L * L * C * 2)
    print(f"{name}: {s*1000/N:.1f}ms/op  {flops/s/1e12:.1f} TFLOP/s", flush=True)


def main():
    sentinel()
    cases = set(sys.argv[1:]) or {"conv", "gn", "up", "attn"}
    # full-height tile: 1088x1024 px -> c128 at 1088x1024, c256 at 544x512,
    # c512 at 272x256 and 136x128 (latent); 5 frames -> T 5/3/2/2.
    if "conv" in cases:
        conv_case("conv_c128 1088x1024 T5", 5, 1088, 1024, 128, "pallas")
        conv_case("conv_c256 544x512 T3", 3, 544, 512, 256, "pallas")
        conv_case("conv_c512 272x256 T2", 2, 272, 256, 512, "pallas")
        conv_case("conv_c512 136x128 T2", 2, 136, 128, 512, "pallas")
        conv_case("conv_c512_xla 272x256 T2", 2, 272, 256, 512, "xla")
    if "gn" in cases:
        gn_silu_case("gn_silu_c128 1088x1024 T5", 5, 1088, 1024, 128)
        gn_silu_case("gn_silu_c256 544x512 T3", 3, 544, 512, 256)
        gn_silu_case("gn_silu_c512 272x256 T2", 2, 272, 256, 512)
    if "up" in cases:
        upsample_case("upsample_c256 544x512 T3", 3, 544, 512, 256)
    if "attn" in cases:
        attn_case("attn_mid 136x128 T2", 2, 136 * 128, 512)
    sentinel()


if __name__ == "__main__":
    main()
