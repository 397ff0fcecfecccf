#!/usr/bin/env python3
"""In-situ decoder-body breakdown on one decode tile.

decode_decompose.py showed the tiled driver's glue is ~0: the whole 2.35s
lives in the per-tile decoder body (1.185s/tile), ~0.65s/tile above what
the standalone conv chains predict. This probe times CUMULATIVE prefixes
of the decoder on the exact tile shape (diffs = per-stage in-situ cost),
then ablates op classes (GroupNorm, SiLU, mid attention) at full depth.
"""

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
    from seedvr2_tpu.config import vae_config
    from seedvr2_tpu.models.vae import model as M
    from seedvr2_tpu.models.vae.causal_conv import StreamCtx, causal_conv3d
    from seedvr2_tpu.models.vae.model import init_vae_params

    print(f"sentinel: {sentinel():.3f}s", flush=True)
    cfg = vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 136, 128, 16), jnp.bfloat16) * 0.5

    def partial_decoder(stages: int):
        """stages: 0=conv_in, 1=+mid, 2..5=+up0..up3, 6=+norm_out/conv_out."""

        def f(p, zz):
            d = p["decoder"]
            ctx = StreamCtx("disabled")
            h = causal_conv3d(d["conv_in"], zz, ctx, "conv_in")
            if stages >= 1:
                h = M._mid(d["mid"], cfg, h, ctx, "mid")
            for i in range(cfg.num_blocks):
                if stages < 2 + i:
                    return h
                blk = d[f"up{i}"]
                for j, rp in enumerate(blk["resnets"]):
                    h = M._resnet(rp, cfg, h, ctx, f"u{i}r{j}")
                if "upsample" in blk:
                    h = M._upsample(
                        blk["upsample"], cfg, h, ctx, f"u{i}up", cfg.decoder_temporal_up(i)
                    )
            if stages >= 6:
                h = M._gn(d["norm_out"], h, cfg.norm_num_groups)
                h = M._silu(h)
                h = causal_conv3d(d["conv_out"], h, ctx, "conv_out")
            return h

        return jax.jit(f)

    names = ["conv_in", "+mid", "+up0", "+up1", "+up2", "+up3", "+out"]
    prev = 0.0
    for s, nm in enumerate(names):
        fn = partial_decoder(s)
        t = steady(lambda: fn(params, z))
        print(f"cum {nm}: {t:.3f}s  (stage {t - prev:+.3f}s)", flush=True)
        prev = t

    # Op-class ablations at full depth (trace-time monkeypatch; numerics
    # change, timing comparison only).
    full = partial_decoder(6)
    t_full = steady(lambda: full(params, z))

    orig_gn, orig_silu, orig_attn = M._gn, M._silu, M._mid_attention
    try:
        # hoist each ablated jit OUTSIDE steady(): a fresh jit per call
        # measures remote-compile time, not runtime (round-4 first run)
        M._gn = lambda p, x, g: x
        fn = partial_decoder(6)
        t = steady(lambda: fn(params, z))
        print(f"full w/o GroupNorm: {t:.3f}s (GN in-situ = {t_full - t:+.3f}s)", flush=True)
        M._silu = lambda x: x
        fn = partial_decoder(6)
        t = steady(lambda: fn(params, z))
        print(f"full w/o GN+SiLU: {t:.3f}s", flush=True)
        M._gn, M._silu = orig_gn, orig_silu
        M._mid_attention = lambda p, c, x: x
        fn = partial_decoder(6)
        t = steady(lambda: fn(params, z))
        print(f"full w/o mid attention: {t:.3f}s (attn in-situ = {t_full - t:+.3f}s)", flush=True)
    finally:
        M._gn, M._silu, M._mid_attention = orig_gn, orig_silu, orig_attn

    # Conv backend A/B at full depth
    from seedvr2_tpu.ops.conv3d_kernel import set_conv_backend

    set_conv_backend("xla")
    fn = partial_decoder(6)
    t = steady(lambda: fn(params, z))
    print(f"full with XLA convs: {t:.3f}s (pallas delta = {t_full - t:+.3f}s)", flush=True)
    set_conv_backend("pallas")

    print(f"sentinel after: {sentinel():.3f}s", flush=True)


if __name__ == "__main__":
    main()
