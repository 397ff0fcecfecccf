#!/usr/bin/env python3
"""Compare memory/perf configurations for the 3B pipeline on one chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
from seedvr2_tpu.models.dit.nadit import init_params as init_dit
from seedvr2_tpu.models.vae.model import init_vae_params
from seedvr2_tpu.ops.quant import quantize_dit_params, tree_bytes
from seedvr2_tpu.pipeline import phases
from seedvr2_tpu.pipeline.runner import Runner
from seedvr2_tpu.utils.debug import Debug


def run_config(name, dit_params, vae_params, text, frames, **cfg_kw):
    cfg = PipelineConfig(dit=dit_3b(), vae=vae_config(), resolution=1080, batch_size=5, **cfg_kw)
    runner = Runner(cfg, dit_params, vae_params, text, debug=Debug(False))
    try:
        t0 = time.perf_counter()
        out = phases.generate(runner, frames)
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = phases.generate(runner, frames)
        steady = time.perf_counter() - t0
        print(f"[{name}] compile+run {compile_t:.1f}s steady {steady:.2f}s "
              f"({len(frames)/steady:.3f} fps)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:120]
        print(f"[{name}] FAILED: {msg}", flush=True)


def main():
    dtype = jnp.bfloat16
    dit_bf16 = init_dit(dit_3b(), jax.random.PRNGKey(0), dtype=dtype)
    vae_params = init_vae_params(vae_config(), jax.random.PRNGKey(1), dtype=dtype)
    rng = np.random.RandomState(0)
    text = (rng.randn(77, 5120) * 0.02).astype(np.float32)
    frames = rng.rand(5, 720, 1280, 3).astype(np.float32)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "int8_untiled"):
        dit_i8 = quantize_dit_params(dit_bf16)
        print(f"int8 dit bytes: {tree_bytes(dit_i8)/1e9:.1f}GB", flush=True)
        run_config("int8 dit + untiled vae", dit_i8, vae_params, text, frames)
    if which in ("all", "int8_tiled768"):
        dit_i8 = quantize_dit_params(dit_bf16)
        run_config(
            "int8 dit + tiled 768/96", dit_i8, vae_params, text, frames,
            encode_tiled=True, encode_tile_size=(768, 768), encode_tile_overlap=(96, 96),
            decode_tiled=True, decode_tile_size=(768, 768), decode_tile_overlap=(96, 96),
        )
    if which in ("all", "bf16_tiled768"):
        run_config(
            "bf16 dit + tiled 768/96", dit_bf16, vae_params, text, frames,
            encode_tiled=True, encode_tile_size=(768, 768), encode_tile_overlap=(96, 96),
            decode_tiled=True, decode_tile_size=(768, 768), decode_tile_overlap=(96, 96),
        )


if __name__ == "__main__":
    main()
