#!/usr/bin/env python3
"""Compare XLA vs Pallas attention for the 3B DiT one-step on TPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
from seedvr2_tpu.models.dit.nadit import init_params as init_dit
from seedvr2_tpu.ops.attention import set_attention_backend
from seedvr2_tpu.pipeline.runner import Runner
from seedvr2_tpu.utils.debug import Debug


def _sync(x):
    # axon's block_until_ready does not actually block; a scalar fetch does.
    return float(jnp.sum(x.astype(jnp.float32)))


def time_step(runner, latent, n=3):
    _sync(runner.upscale(latent, 42))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(runner.upscale(latent, 42))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = PipelineConfig(dit=dit_3b(), vae=vae_config(), resolution=1080, batch_size=5)
    dtype = jnp.bfloat16
    params = init_dit(cfg.dit, jax.random.PRNGKey(0), dtype=dtype)
    rng = np.random.RandomState(0)
    text = (rng.randn(77, cfg.dit.txt_in_dim) * 0.02).astype(np.float32)
    runner = Runner(cfg, params, None, text, debug=Debug(False))
    # 1080p 5-frame latent: (2, 136, 240, 16)
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 136, 240, 16), dtype)

    for backend in ("xla", "fused"):
        set_attention_backend(backend)
        runner._dit_step_cache.clear()
        t = time_step(runner, latent)
        print(f"{backend}: {t*1000:.0f} ms / step", flush=True)


if __name__ == "__main__":
    main()
