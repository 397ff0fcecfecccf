#!/usr/bin/env python3
"""Root-cause probe for the 7B DiT step anomaly (VERDICT r2 item #1).

One process, one TPU, sequential experiments with scalar-fetch timing:
  1. sentinel matmul (calm-window check, ~known cost)
  2. dispatch-overhead test: trivial jitted fn over (a) 16-leaf and
     (b) 1200-leaf dummy trees, (c) the real 8GB 7B int8 tree
  3. 7B int8 layer sweep {0, 12, 36} -> fixed intercept + per-layer slope
  4. component timings at exact 7B 1080p geometry (qkv einsum int8/bf16,
     fused kernel H=24 vs H=20, XLA attention, gather/scatter, MLP)
  5. optimized-HLO dump of a 2-layer step (convert/copy materialization)

Writes JSON lines to stdout and the full report to /tmp/dit7b_anatomy.json.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

REPORT = {}


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)) if hasattr(x, "astype") else x)


def timeit(fn, *args, n=4, warm=1):
    for _ in range(warm):
        sync(jax.tree.leaves(fn(*args))[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(jax.tree.leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


LOGF = open("/tmp/dit7b_anatomy.jsonl", "a")


def log(k, v):
    REPORT[k] = v
    line = json.dumps({k: v})
    print(line, flush=True)
    LOGF.write(line + "\n")
    LOGF.flush()


def sentinel():
    a = jnp.asarray(np.random.rand(2048, 2048).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def mm(a):
        x = a
        for _ in range(8):
            x = x @ a
        return x

    best, ts = timeit(mm, a)
    tf = 8 * 2 * 2048**3 / best / 1e12
    log("sentinel_matmul2048x8", {"s": round(best, 4), "tflops": round(tf, 1), "all": [round(t, 3) for t in ts]})
    return tf


def build_7b_int8_host(cfg):
    from seedvr2_tpu.ops.quant import synthetic_quantized_dit_params

    return synthetic_quantized_dit_params(cfg)


def dispatch_test(p7_dev):
    def trivial(tree, x):
        return x + jax.tree.leaves(tree)[0].astype(jnp.float32).sum() * 0

    x = jnp.zeros((8, 128), jnp.float32)

    dummy16 = [jnp.zeros((8, 128), jnp.bfloat16) for _ in range(16)]
    f16 = jax.jit(trivial)
    best, ts = timeit(f16, dummy16, x)
    log("dispatch_16leaf_s", {"s": round(best, 4), "all": [round(t, 4) for t in ts]})

    dummy1200 = [jnp.zeros((8, 128), jnp.bfloat16) for _ in range(1200)]
    best, ts = timeit(jax.jit(trivial), dummy1200, x)
    log("dispatch_1200leaf_s", {"s": round(best, 4), "all": [round(t, 4) for t in ts]})

    best, ts = timeit(jax.jit(trivial), p7_dev, x)
    nl = len(jax.tree.leaves(p7_dev))
    log("dispatch_real7b_tree_s", {"s": round(best, 4), "leaves": nl, "all": [round(t, 4) for t in ts]})


def layer_sweep(cfg7, p7_dev, latent, text):
    import dataclasses

    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.utils.debug import Debug
    from seedvr2_tpu.config import PipelineConfig, vae_config

    from seedvr2_tpu.models.dit.nadit import stack_blocks

    out = {}
    for N in (0, 12, 36):
        for layout in ("unrolled", "scan"):
            if layout == "scan" and N != 12:
                continue  # scan-36 runs in its own phase after the
                          # unrolled tree is freed (stacking copies leaves;
                          # both resident would exceed 16GB HBM)
            dit_n = dataclasses.replace(cfg7, num_layers=N, mm_layers=N)
            pn = {k: v for k, v in p7_dev.items() if k != "blocks"}
            # share the same device weights in both layouts (stack copies)
            pn["blocks"] = [_deepcopy_refs(b) for b in p7_dev["blocks"][:N]]
            if layout == "scan":
                pn = stack_blocks(pn, dit_n)
            pcfg = PipelineConfig(dit=dit_n, vae=vae_config(), resolution=1080, batch_size=5)
            r = Runner(pcfg, pn, None, text, debug=Debug(False))
            t0 = time.perf_counter()
            best, ts = timeit(lambda: r.upscale(latent, 42), n=4)
            rec = {"s": round(best, 3), "all": [round(t, 3) for t in ts],
                   "compile_s": round(time.perf_counter() - t0 - sum(ts), 1)}
            out[f"{N}_{layout}"] = rec
            log(f"step7b_int8_L{N}_{layout}", rec)
            del pn, r
    if "12_unrolled" in out and "36_unrolled" in out:
        slope = (out["36_unrolled"]["s"] - out["12_unrolled"]["s"]) / 24
        log("sweep_summary", {"intercept_L0_s": out["0_unrolled"]["s"],
                              "slope_unrolled": round(slope, 4)})


def _deepcopy_refs(tree):
    """Copy dict structure, share array leaves (stack_blocks consumes dicts)."""
    if isinstance(tree, dict):
        return {k: _deepcopy_refs(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_deepcopy_refs(v) for v in tree]
    return tree


def components(cfg7, p7_dev, latent_shape=(1, 2, 136, 240, 16)):
    from seedvr2_tpu.models.dit.nadit import build_attn_plans
    from seedvr2_tpu.ops.fused_window_attention import fused_window_attention
    from seedvr2_tpu.ops.attention import attention_xla

    D, H, hd, Lt = 3072, 24, 128, 77
    thw = (2, 68, 120)
    L = int(np.prod(thw))
    plans = build_attn_plans(cfg7, thw, Lt)
    lp = plans.plain
    nW, mL = lp.plan.n_win, lp.plan.max_len
    log("geometry", {"L": L, "nW": nW, "mL": mL, "Lt": Lt})

    x = jnp.asarray(np.random.rand(1, L, D).astype(np.float32) * 0.1, jnp.bfloat16)
    blk = p7_dev["blocks"][0]
    pq = blk["attn"]["qkv"]["vid"]

    # qkv head-major einsum, int8
    def qkv_hm_int8(x, wq, ws):
        w = wq.astype(x.dtype).reshape(D, 3, H, hd)
        y = jnp.einsum("bld,dohx->bohlx", x, w)
        return y * ws.astype(x.dtype).reshape(1, 3, H, 1, hd)

    best, _ = timeit(jax.jit(qkv_hm_int8), x, pq["w_q"], pq["w_s"])
    log("qkv_hm_int8_s", round(best, 4))

    wbf = (pq["w_q"].astype(jnp.bfloat16) * 0.01)

    def qkv_hm_bf16(x, w):
        return jnp.einsum("bld,dohx->bohlx", x, w.reshape(D, 3, H, hd))

    best, _ = timeit(jax.jit(qkv_hm_bf16), x, wbf)
    log("qkv_hm_bf16_s", round(best, 4))

    def qkv_blox_int8(x, wq, ws):
        y = jnp.einsum("bld,dox->blox", x, wq.astype(x.dtype).reshape(D, 3, H * hd))
        return y * ws.astype(x.dtype).reshape(1, 1, 3, H * hd)

    best, _ = timeit(jax.jit(qkv_blox_int8), x, pq["w_q"], pq["w_s"])
    log("qkv_blox_int8_s", round(best, 4))

    # fused kernel alone at H=24 vs H=20
    vang = jnp.asarray(lp.vid_angles)
    valid = jnp.asarray(lp.plan.valid)
    tang0 = jnp.zeros((Lt, hd), jnp.float32)
    for Hn in (24, 20):
        vqkv = jnp.asarray(np.random.rand(1, 3, Hn, nW, mL, hd).astype(np.float32) * 0.1, jnp.bfloat16)
        tqkv = jnp.asarray(np.random.rand(1, 3, Hn, Lt, hd).astype(np.float32) * 0.1, jnp.bfloat16)
        best, _ = timeit(
            lambda v=vqkv, t=tqkv: fused_window_attention(v, t, vang, tang0, valid, False)[0]
        )
        log(f"fused_kernel_H{Hn}_s", round(best, 4))

    # fused kernel with mL padded to a sublane multiple (405 -> 408):
    # checks whether Mosaic pays a relayout penalty for the odd sublane dim
    from seedvr2_tpu.models.dit.windows import window_plan

    pl8 = window_plan((2, 68, 120), cfg7.window, False, pad_to_multiple=8)
    from seedvr2_tpu.models.dit.nadit import _rope_angles_for_plan

    va8, _ = _rope_angles_for_plan(cfg7, pl8, Lt)
    vqkv8 = jnp.asarray(np.random.rand(1, 3, 24, pl8.n_win, pl8.max_len, hd).astype(np.float32) * 0.1, jnp.bfloat16)
    tqkv8 = jnp.asarray(np.random.rand(1, 3, 24, Lt, hd).astype(np.float32) * 0.1, jnp.bfloat16)
    best, _ = timeit(
        lambda: fused_window_attention(
            vqkv8, tqkv8, jnp.asarray(va8), tang0, jnp.asarray(pl8.valid), False
        )[0]
    )
    log("fused_kernel_H24_pad8_s", round(best, 4))

    # XLA attention alone at the same shape
    q = jnp.asarray(np.random.rand(nW, mL + Lt, 24, hd).astype(np.float32) * 0.1, jnp.bfloat16)
    kv_valid = jnp.concatenate([valid, jnp.ones((nW, Lt), bool)], axis=1)
    best, _ = timeit(jax.jit(attention_xla), q, q, q, kv_valid)
    log("xla_attn_s", round(best, 4))

    # window gather + scatter (head-major)
    idx = jnp.asarray(lp.plan.index.reshape(-1))
    inv = jnp.asarray(lp.plan.inverse)
    vqkv_flat = jnp.asarray(np.random.rand(1, 3, 24, L, hd).astype(np.float32) * 0.1, jnp.bfloat16)

    def gather(v):
        return jnp.take(v, idx, axis=3).reshape(1, 3, 24, nW, mL, hd)

    best, _ = timeit(jax.jit(gather), vqkv_flat)
    log("window_gather_hm_s", round(best, 4))

    ovid = jnp.asarray(np.random.rand(1, 24, nW * mL, hd).astype(np.float32) * 0.1, jnp.bfloat16)

    def scatter(o):
        return jnp.take(o, inv, axis=2)

    best, _ = timeit(jax.jit(scatter), ovid)
    log("window_scatter_hm_s", round(best, 4))

    # MLP int8 (gelu) at 7B dims
    pm = blk["mlp"]["vid"]

    def mlp_int8(x, p):
        h = x @ p["proj_in"]["w_q"].astype(x.dtype)
        h = h * p["proj_in"]["w_s"].astype(x.dtype) + p["proj_in"]["b"].astype(x.dtype)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
        y = h @ p["proj_out"]["w_q"].astype(x.dtype)
        return y * p["proj_out"]["w_s"].astype(x.dtype) + p["proj_out"]["b"].astype(x.dtype)

    best, _ = timeit(jax.jit(mlp_int8), x, pm)
    log("mlp_int8_s", round(best, 4))

    wbf_in = pm["proj_in"]["w_q"].astype(jnp.bfloat16) * 0.01
    wbf_out = pm["proj_out"]["w_q"].astype(jnp.bfloat16) * 0.01

    def mlp_bf16(x, wi, wo):
        h = x @ wi
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
        return h @ wo

    best, _ = timeit(jax.jit(mlp_bf16), x, wbf_in, wbf_out)
    log("mlp_bf16_s", round(best, 4))


def chained(cfg7, p7_dev):
    """Per-op costs with dispatch overhead cancelled: run K copies of the op
    chained in ONE jitted program; slope between K=2 and K=8 is the true
    per-op device time."""
    from seedvr2_tpu.models.dit.nadit import build_attn_plans
    from seedvr2_tpu.ops.fused_window_attention import fused_window_attention

    D, H, hd, Lt = 3072, 24, 128, 77
    thw = (2, 68, 120)
    L = int(np.prod(thw))
    plans = build_attn_plans(cfg7, thw, Lt)
    lp = plans.plain
    nW, mL = lp.plan.n_win, lp.plan.max_len

    blk = p7_dev["blocks"][0]
    pm = blk["mlp"]["vid"]
    x = jnp.asarray(np.random.rand(1, L, D).astype(np.float32) * 0.1, jnp.bfloat16)

    def mlp_once(x, p):
        h = x @ p["proj_in"]["w_q"].astype(x.dtype)
        h = h * p["proj_in"]["w_s"].astype(x.dtype) + p["proj_in"]["b"].astype(x.dtype)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
        y = h @ p["proj_out"]["w_q"].astype(x.dtype)
        return y * p["proj_out"]["w_s"].astype(x.dtype) + p["proj_out"]["b"].astype(x.dtype)

    res = {}
    for K in (2, 8):
        f = jax.jit(lambda x, p: [x := mlp_once(x, p) for _ in range(K)][-1])
        best, _ = timeit(f, x, pm)
        res[K] = best
    res["per_op_s"] = round((res[8] - res[2]) / 6, 4)
    log("mlp_int8_chained", {str(k): round(v, 4) if isinstance(v, float) else v for k, v in res.items()})

    pq = blk["attn"]["qkv"]["vid"]

    def qkv_once(x, wq, ws):
        w = wq.astype(x.dtype).reshape(D, 3, H, hd)
        y = jnp.einsum("bld,dohx->bohlx", x, w)
        y = y * ws.astype(x.dtype).reshape(1, 3, H, 1, hd)
        # reduce back to [1, L, D] so it chains
        return y[:, 0].transpose(0, 2, 1, 3).reshape(1, L, H * hd)

    res = {}
    for K in (2, 8):
        f = jax.jit(lambda x, wq, ws: [x := qkv_once(x, wq, ws) for _ in range(K)][-1])
        best, _ = timeit(f, x, pq["w_q"], pq["w_s"])
        res[K] = best
    res["per_op_s"] = round((res[8] - res[2]) / 6, 4)
    log("qkv_hm_int8_chained", {str(k): round(v, 4) if isinstance(v, float) else v for k, v in res.items()})

    # fused kernel chained: feed output back as q/k/v
    vang = jnp.asarray(lp.vid_angles)
    valid = jnp.asarray(lp.plan.valid)
    tang0 = jnp.zeros((Lt, hd), jnp.float32)
    vqkv = jnp.asarray(np.random.rand(1, 3, H, nW, mL, hd).astype(np.float32) * 0.1, jnp.bfloat16)
    tqkv = jnp.asarray(np.random.rand(1, 3, H, Lt, hd).astype(np.float32) * 0.1, jnp.bfloat16)

    def attn_once(vq, tq):
        ov, ot = fused_window_attention(vq, tq, vang, tang0, valid, False)
        vq2 = jnp.stack([ov, ov, ov], axis=1)  # [1,3,H,nW,mL,hd]
        tq2 = jnp.stack([ot[:, :, 0], ot[:, :, 0], ot[:, :, 0]], axis=1)
        return vq2, tq2

    res = {}
    for K in (2, 6):
        def f(vq, tq, K=K):
            for _ in range(K):
                vq, tq = attn_once(vq, tq)
            return vq

        best, _ = timeit(jax.jit(f), vqkv, tqkv)
        res[K] = best
    res["per_op_s"] = round((res[6] - res[2]) / 4, 4)
    log("fused_kernel_chained", {str(k): round(v, 4) if isinstance(v, float) else v for k, v in res.items()})


def dispatch_floor():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    best, ts = timeit(f, x, n=6)
    log("dispatch_floor_s", {"s": round(best, 4), "all": [round(t, 4) for t in ts]})


def scan36(cfg7, latent, text):
    """Full 36L scanned step with the unrolled tree freed first."""
    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.utils.debug import Debug
    from seedvr2_tpu.config import PipelineConfig, vae_config
    from seedvr2_tpu.models.dit.nadit import stack_blocks
    from seedvr2_tpu.ops.quant import synthetic_quantized_dit_params

    p = jax.tree.map(jnp.asarray, synthetic_quantized_dit_params(cfg7))
    p = stack_blocks(p, cfg7)
    sync(jax.tree.leaves(p)[0].astype(jnp.float32))
    pcfg = PipelineConfig(dit=cfg7, vae=vae_config(), resolution=1080, batch_size=5)
    r = Runner(pcfg, p, None, text, debug=Debug(False))
    t0 = time.perf_counter()
    best, ts = timeit(lambda: r.upscale(latent, 42), n=4)
    log("step7b_int8_L36_scan", {"s": round(best, 3), "all": [round(t, 3) for t in ts],
                                 "compile_s": round(time.perf_counter() - t0 - sum(ts), 1)})


def hlo_dump(cfg7, p7_dev, latent, text):
    import dataclasses

    from seedvr2_tpu.pipeline.runner import Runner
    from seedvr2_tpu.utils.debug import Debug
    from seedvr2_tpu.config import PipelineConfig, vae_config

    dit2 = dataclasses.replace(cfg7, num_layers=2, mm_layers=2)
    p2 = {k: v for k, v in p7_dev.items() if k != "blocks"}
    p2["blocks"] = p7_dev["blocks"][:2]
    pcfg = PipelineConfig(dit=dit2, vae=vae_config(), resolution=1080, batch_size=5)
    r = Runner(pcfg, p2, None, text, debug=Debug(False))
    step = r._build_step_body((2, 136, 240), 77)
    try:
        comp = jax.jit(step).lower(p2, latent, r.text_pos, jax.random.PRNGKey(0)).compile()
        txt = comp.as_text()
        with open("/tmp/dit7b_2L_opt_hlo.txt", "w") as f:
            f.write(txt)
        import re
        from collections import Counter

        ops = Counter(re.findall(r" = \S+ (\w+)\(", txt))
        conv_big = len(re.findall(r"convert\(s8", txt))
        log("opt_hlo", {"ops_top": ops.most_common(12), "s8_converts": conv_big,
                        "copies": ops.get("copy", 0), "fusions": ops.get("fusion", 0),
                        "len": len(txt)})
        try:
            ca = comp.cost_analysis()
            if ca:
                log("cost_analysis", {k: v for k, v in list(ca.items())[:8]})
        except Exception:
            pass
    except Exception as e:
        log("opt_hlo_error", f"{type(e).__name__}: {e}")


def main():
    from seedvr2_tpu.config import dit_7b

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    sentinel()

    cfg7 = dit_7b()
    t0 = time.perf_counter()
    p7_host = build_7b_int8_host(cfg7)
    log("host_init_s", round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    p7_dev = jax.tree.map(jnp.asarray, p7_host)
    sync(jax.tree.leaves(p7_dev)[0])
    del p7_host
    log("upload_s", round(time.perf_counter() - t0, 1))
    stats = jax.devices()[0].memory_stats() or {}
    log("hbm_gb_after_upload", round(stats.get("bytes_in_use", 0) / 1e9, 2))

    rng = np.random.RandomState(0)
    text = (rng.randn(77, cfg7.txt_in_dim) * 0.02).astype(np.float32)
    latent = jnp.asarray(rng.randn(1, 2, 136, 240, 16).astype(np.float32) * 0.5, jnp.bfloat16)

    dispatch_floor()
    dispatch_test(p7_dev)
    layer_sweep(cfg7, p7_dev, latent, text)
    chained(cfg7, p7_dev)
    components(cfg7, p7_dev)
    hlo_dump(cfg7, p7_dev, latent, text)
    del p7_dev
    scan36(cfg7, latent, text)
    sentinel()

    with open("/tmp/dit7b_anatomy.json", "w") as f:
        json.dump(REPORT, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
