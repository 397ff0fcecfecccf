#!/usr/bin/env python3
"""Where does the 3B e2e second go? Decompose one fused batch into
upload / device compute / device->host fetch / host unpack, plus the
full phases.generate wall time — all in one process with a sentinel
window check (docs/PERFORMANCE.md "Bench noise").

Usage: python scripts/e2e_profile.py [--output-bits 16] [--frames 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sentinel():
    a = jnp.asarray(np.random.rand(2048, 2048).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def mm(a):
        x = a
        for _ in range(8):
            x = x @ a
        return x

    float(np.asarray(jnp.sum(mm(a).astype(jnp.float32))))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(jnp.sum(mm(a).astype(jnp.float32))))
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--output-bits", type=int, default=16)
    args = ap.parse_args()

    from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
    from seedvr2_tpu.models.dit.nadit import init_params as init_dit
    from seedvr2_tpu.models.vae.model import init_vae_params
    from seedvr2_tpu.pipeline import phases
    from seedvr2_tpu.pipeline.runner import Runner, unpack_frames
    from seedvr2_tpu.utils.debug import Debug

    cfg = PipelineConfig(
        dit=dit_3b(), vae=vae_config(), resolution=1080, batch_size=args.frames,
        color_correction="wavelet", compute_dtype="bfloat16",
        encode_tiled=True, encode_tile_size=(1024, 1024), encode_tile_overlap=(128, 128),
        decode_tiled=True, decode_tile_size=(1024, 1024), decode_tile_overlap=(128, 128),
        output_bits=args.output_bits,
    )
    out = {"sentinel_s": sentinel(), "output_bits": args.output_bits}
    print(json.dumps({"sentinel": out["sentinel_s"]}), flush=True)

    dit_params = init_dit(cfg.dit, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    vae_params = init_vae_params(cfg.vae, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    text = (rng.randn(77, cfg.dit.txt_in_dim) * 0.02).astype(np.float32)
    runner = Runner(cfg, dit_params, vae_params, text, debug=Debug(False))
    frames = rng.rand(args.frames, 720, 1280, 3).astype(np.float32)

    # full e2e (compile + 3 steady)
    t0 = time.perf_counter()
    res = phases.generate(runner, frames)
    out["e2e_compile_s"] = round(time.perf_counter() - t0, 2)
    assert np.isfinite(res).all()
    e2e = []
    for _ in range(3):
        t0 = time.perf_counter()
        phases.generate(runner, frames)
        e2e.append(time.perf_counter() - t0)
    out["e2e_s"] = [round(t, 3) for t in e2e]
    print(json.dumps({"e2e_s": out["e2e_s"], "compile_s": out["e2e_compile_s"]}), flush=True)

    # decomposition of one fused batch
    from seedvr2_tpu.pipeline import batching
    from seedvr2_tpu.utils.seed import batch_key

    true_h, true_w = 1080, 1920
    key_noise = batch_key(cfg.seed, "input_noise")
    _, sub = jax.random.split(key_noise)
    video = frames[..., :3].astype(np.float16)

    for name, fn in [
        ("upload_s", lambda: jnp.asarray(video)),
        ("roundtrip_1el_s", lambda: np.asarray(jnp.asarray(video)[0, 0, 0, 0])),
    ]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts), 3)

    fr16 = jnp.asarray(video)
    u16 = runner.fused_batch(fr16, args.frames, true_h, true_w, sub, cfg.seed)
    np.asarray(u16[0, 0, 0, 0])  # warm/compile done in generate already
    comp, fetch, unpack = [], [], []
    for _ in range(3):
        t0 = time.perf_counter()
        u16 = runner.fused_batch(fr16, args.frames, true_h, true_w, sub, cfg.seed)
        float(np.asarray(u16[0, 0, 0, 0]).astype(np.float32))
        t1 = time.perf_counter()
        host = jax.device_get(u16)
        t2 = time.perf_counter()
        unpack_frames(host)
        t3 = time.perf_counter()
        comp.append(t1 - t0)
        fetch.append(t2 - t1)
        unpack.append(t3 - t2)
    out["fused_compute_s"] = round(min(comp), 3)
    out["fetch_s"] = round(min(fetch), 3)
    out["unpack_s"] = round(min(unpack), 3)
    out["sentinel_after_s"] = sentinel()
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
