#!/usr/bin/env python3
"""A/B the halo conv kernel vs the tap-folded im2col kernel at the
decoder/encoder's weakest stage (c128, K=128 contraction — up3 ran at
86 TFLOP/s in-situ vs 134-184 elsewhere; im2col raises the single-matmul
contraction depth to 27*128=3456), plus an encoder-body stage profile.
Chains of 4 DIFFERENT weights (not 8x one weight) to better match in-situ
weight streaming.
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


def conv_chain_case(name, T, H, W, C, impl, n_w=4):
    from seedvr2_tpu.ops import conv3d_kernel as ck

    ks = jax.random.split(jax.random.PRNGKey(0), n_w + 1)
    x = jax.random.normal(ks[0], (1, T + 2, H, W, C), jnp.bfloat16) * 0.3
    ws = [jax.random.normal(k, (3, 3, 3, C, C), jnp.bfloat16) * 0.02 for k in ks[1:]]
    b = jnp.zeros((C,), jnp.bfloat16)
    fn = ck.conv3d_3x3x3 if impl == "halo" else ck.conv3d_3x3x3_im2col

    @jax.jit
    def chain(x, ws):
        y = x
        for w in ws:
            out = fn(y, w, b, interpret=False)  # [1, T, H, W, C]
            # re-extend temporally so every conv sees the same shape
            y = jnp.concatenate([out[:, :1], out[:, :1], out], axis=1)
        return out

    s = steady(lambda: chain(x, ws))
    flops = n_w * 2 * 27 * T * H * W * C * C
    print(f"{name} [{impl}]: {s*1000/n_w:.1f}ms/conv  {flops/s/1e12:.1f} TFLOP/s",
          flush=True)


def encoder_profile():
    from seedvr2_tpu.config import vae_config
    from seedvr2_tpu.models.vae import model as M
    from seedvr2_tpu.models.vae.causal_conv import StreamCtx, causal_conv3d
    from seedvr2_tpu.models.vae.model import init_vae_params

    cfg = vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # encode tile (1024/128 grid on 1088x1920 -> 1088x1024-ish input tiles)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 5, 1088, 1024, 3), jnp.bfloat16) * 2 - 1

    def partial_encoder(stages: int):
        """0=conv_in, 1..4=+down0..down3, 5=+mid, 6=+out."""

        def f(p, xx):
            e = p["encoder"]
            ctx = StreamCtx("disabled")
            h = causal_conv3d(e["conv_in"], xx, ctx, "conv_in")
            for i in range(cfg.num_blocks):
                if stages < 1 + i:
                    return h
                blk = e[f"down{i}"]
                for j, rp in enumerate(blk["resnets"]):
                    h = M._resnet(rp, cfg, h, ctx, f"d{i}r{j}")
                if "downsample" in blk:
                    td = cfg.encoder_temporal_down(i)
                    h = causal_conv3d(
                        blk["downsample"], h, ctx, f"d{i}s",
                        stride=(2 if td else 1, 2, 2),
                        spatial_pad=((0, 1), (0, 1)),
                        temporal_pad=1 if td else 0,
                    )
            if stages >= 5:
                h = M._mid(e["mid"], cfg, h, ctx, "mid")
            if stages >= 6:
                h = M._gn(e["norm_out"], h, cfg.norm_num_groups)
                h = M._silu(h)
                h = causal_conv3d(e["conv_out"], h, ctx, "conv_out")
            return h

        return jax.jit(f)

    names = ["conv_in", "+down0", "+down1", "+down2", "+down3", "+mid", "+out"]
    prev = 0.0
    for s, nm in enumerate(names):
        fn = partial_encoder(s)
        t = steady(lambda: fn(params, x))
        print(f"enc cum {nm}: {t:.3f}s  (stage {t - prev:+.3f}s)", flush=True)
        prev = t


def main():
    print(f"sentinel: {sentinel():.3f}s", flush=True)
    # decoder up3 shape
    conv_chain_case("c128 1088x1024 T5", 5, 1088, 1024, 128, "halo")
    conv_chain_case("c128 1088x1024 T5", 5, 1088, 1024, 128, "im2col")
    # decoder up2 shape
    conv_chain_case("c256 544x512 T5", 5, 544, 512, 256, "halo")
    conv_chain_case("c256 544x512 T5", 5, 544, 512, 256, "im2col")
    print(f"sentinel mid: {sentinel():.3f}s", flush=True)
    encoder_profile()
    print(f"sentinel after: {sentinel():.3f}s", flush=True)


if __name__ == "__main__":
    main()
