#!/usr/bin/env python3
"""Measure the DiT per-layer glue after the round-3 kernel changes
(qk-norm folded into the fused kernel; nW-major grid so angle tables load
once per window).

One process, sequential, scalar-fetch timing, sentinel-verified windows:
  1. sentinel (8-chained 2048^2 bf16 matmuls; calm ~0.027-0.030s)
  2. 3B int8 one-step at 1080p 5-frame geometry (calm-r3 baseline: 0.857s
     with the pre-change kernel)
  3. 7B int8 one-step, scanned (calm-r3 baseline: 1.222s)
  4. standalone window gather + scatter at 7B geometry (sizes the remaining
     glue for the prospective blockified-window design)
  5. fused kernel alone at 7B geometry (baseline: ~6.5ms + dispatch floor)

Writes JSON lines to stdout and /tmp/dit_glue_probe.jsonl.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

LOGF = open("/tmp/dit_glue_probe.jsonl", "a")
REPORT = {}


def log(k, v):
    REPORT[k] = v
    line = json.dumps({k: v})
    print(line, flush=True)
    LOGF.write(line + "\n")
    LOGF.flush()


def sync(x):
    first = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.sum(first.astype(jnp.float32))))


def timeit(fn, *args, n=4, warm=1):
    for _ in range(warm):
        sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), [round(t, 4) for t in ts]


def sentinel():
    a = jnp.asarray(np.random.RandomState(7).rand(2048, 2048).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def mm(a):
        x = a
        for _ in range(8):
            x = x @ a
        return x

    best, ts = timeit(mm, a)
    log("sentinel_s", {"s": round(best, 4), "all": ts})
    return best


def one_step(cfg_fn, tag, latent_shape):
    import dataclasses

    from seedvr2_tpu.config import PipelineConfig, vae_config
    from seedvr2_tpu.models.dit.nadit import stack_blocks
    from seedvr2_tpu.ops.quant import synthetic_quantized_dit_params
    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.utils.debug import Debug

    cfg = cfg_fn()
    p = jax.tree.map(jnp.asarray, synthetic_quantized_dit_params(cfg))
    p = stack_blocks(p, cfg)
    pcfg = PipelineConfig(dit=cfg, vae=vae_config(), resolution=1080, batch_size=5)
    rng = np.random.RandomState(0)
    text = (rng.randn(77, cfg.txt_in_dim) * 0.02).astype(np.float32)
    r = Runner(pcfg, p, None, text, debug=Debug(False))
    latent = jnp.asarray(rng.randn(*latent_shape).astype(np.float32) * 0.5, jnp.bfloat16)
    t0 = time.perf_counter()
    best, ts = timeit(lambda: r.upscale(latent, 42), n=4)
    log(tag, {"s": round(best, 4), "all": ts,
              "compile_s": round(time.perf_counter() - t0 - sum(ts), 1)})
    del p, r
    return best


def components():
    from seedvr2_tpu.config import dit_7b
    from seedvr2_tpu.models.dit.nadit import build_attn_plans
    from seedvr2_tpu.ops.fused_window_attention import fused_window_attention

    cfg = dit_7b()
    H, hd, Lt = 24, 128, 77
    thw = (2, 68, 120)
    L = int(np.prod(thw))
    plans = build_attn_plans(cfg, thw, Lt)
    for shifted, lp in (("plain", plans.plain), ("shifted", plans.shifted)):
        log(f"geom_{shifted}", {"nW": lp.plan.n_win, "mL": lp.plan.max_len,
                                "pad_ratio": round(lp.plan.n_win * lp.plan.max_len / L, 3)})

    lp = plans.plain
    nW, mL = lp.plan.n_win, lp.plan.max_len
    rng = np.random.RandomState(1)

    idx = jnp.asarray(lp.plan.index.reshape(-1))
    inv = jnp.asarray(lp.plan.inverse)
    vqkv_flat = jnp.asarray(rng.rand(1, 3, H, L, hd).astype(np.float32) * 0.1, jnp.bfloat16)

    def gather(v):
        return jnp.take(v, idx, axis=3).reshape(1, 3, H, nW, mL, hd)

    best, ts = timeit(jax.jit(gather), vqkv_flat)
    log("window_gather_hm_s", {"s": round(best, 4), "all": ts})

    # --- prospective layout: gather TOKENS (wide 6KB rows) before the QKV
    # projection, then project per-window. Trades 1.24x padded GEMM FLOPs
    # for 3x fewer gathered bytes in 24x wider rows. Compare
    # (gather_tokens_wide + qkv_windowed) vs (qkv_flat + window_gather_hm).
    D = H * hd
    x_flat = jnp.asarray(rng.rand(1, L, D).astype(np.float32) * 0.1, jnp.bfloat16)
    wq = jnp.asarray(rng.rand(D, 3 * D).astype(np.float32) * 0.02, jnp.bfloat16)

    def gather_tokens(x):
        return jnp.take(x, idx, axis=1)  # [1, nW*mL, D]

    best, ts = timeit(jax.jit(gather_tokens), x_flat)
    log("gather_tokens_wide_s", {"s": round(best, 4), "all": ts})

    x_win = jax.jit(gather_tokens)(x_flat)

    def qkv_windowed(x, w):  # [1, nW*mL, D] -> [1, 3, H, nW, mL, hd]
        y = (x.reshape(-1, D) @ w).reshape(1, nW, mL, 3, H, hd)
        return y.transpose(0, 3, 4, 1, 2, 5)

    best, ts = timeit(jax.jit(qkv_windowed), x_win, wq)
    log("qkv_windowed_s", {"s": round(best, 4), "all": ts})

    def qkv_flat(x, w):  # today's path: project in token order, head-major
        return jnp.einsum("bld,dx->bxl", x, w).reshape(1, 3, H, hd, L).transpose(0, 1, 2, 4, 3)

    best, ts = timeit(jax.jit(qkv_flat), x_flat, wq)
    log("qkv_flat_hm_s", {"s": round(best, 4), "all": ts})

    # scatter side: out-proj per window then scatter wide rows back
    wo = jnp.asarray(rng.rand(D, D).astype(np.float32) * 0.02, jnp.bfloat16)
    o_win = jnp.asarray(rng.rand(1, H, nW * mL, hd).astype(np.float32) * 0.1, jnp.bfloat16)

    def outproj_then_scatter(o, w):
        y = o.transpose(0, 2, 1, 3).reshape(-1, D) @ w  # [nW*mL, D]
        return jnp.take(y.reshape(1, nW * mL, D), inv, axis=1)

    best, ts = timeit(jax.jit(outproj_then_scatter), o_win, wo)
    log("outproj_scatter_wide_s", {"s": round(best, 4), "all": ts})

    def scatter_then_outproj(o, w):  # today's path
        y = jnp.take(o, inv, axis=2)  # [1, H, L, hd]
        return jnp.einsum("bhld,hdD->blD", y, w.reshape(H, hd, D))

    best, ts = timeit(jax.jit(scatter_then_outproj), o_win, wo)
    log("scatter_outproj_hm_s", {"s": round(best, 4), "all": ts})

    ovid = jnp.asarray(rng.rand(1, H, nW * mL, hd).astype(np.float32) * 0.1, jnp.bfloat16)

    def scatter(o):
        return jnp.take(o, inv, axis=2)

    best, ts = timeit(jax.jit(scatter), ovid)
    log("window_scatter_hm_s", {"s": round(best, 4), "all": ts})

    # plain copy of the same bytes as the gather, for the gather-vs-memcpy gap
    def copy(v):
        return v * jnp.bfloat16(1.0000001)

    best, ts = timeit(jax.jit(copy), vqkv_flat)
    log("qkv_copy_s", {"s": round(best, 4), "all": ts})

    vang = jnp.asarray(lp.vid_angles) if lp.vid_angles is not None else jnp.zeros((nW, mL, hd), jnp.float32)
    valid = jnp.asarray(lp.plan.valid)
    tang0 = jnp.zeros((Lt, hd), jnp.float32)
    vqkv = jnp.asarray(rng.rand(1, 3, H, nW, mL, hd).astype(np.float32) * 0.1, jnp.bfloat16)
    tqkv = jnp.asarray(rng.rand(1, 3, H, Lt, hd).astype(np.float32) * 0.1, jnp.bfloat16)
    norms = jnp.ones((4, hd), jnp.float32)

    best, ts = timeit(
        lambda: fused_window_attention(vqkv, tqkv, vang, tang0, valid, False,
                                       norms, True, 1e-5)[0]
    )
    log("fused_kernel_norm_in_s", {"s": round(best, 4), "all": ts})

    best, ts = timeit(
        lambda: fused_window_attention(vqkv, tqkv, vang, tang0, valid, False)[0]
    )
    log("fused_kernel_nonorm_s", {"s": round(best, 4), "all": ts})


def main():
    stages = set(sys.argv[1:]) or {"3b", "7b", "components"}
    log("start", time.strftime("%Y-%m-%d %H:%M:%S"))
    s = sentinel()
    if s > 0.12:
        log("window_hot", True)
    from seedvr2_tpu.config import dit_3b, dit_7b

    if "3b" in stages:
        one_step(dit_3b, "step3b_int8_s", (1, 2, 136, 240, 16))
    if "7b" in stages:
        one_step(dit_7b, "step7b_int8_s", (1, 2, 136, 240, 16))
    if "components" in stages:
        components()
    sentinel()
    with open("/tmp/dit_glue_probe.json", "w") as f:
        json.dump(REPORT, f, indent=1)


if __name__ == "__main__":
    main()
