"""Orbax native checkpoint cache round-trip."""

import jax
import numpy as np
import pytest

from seedvr2_tpu.config import vae_tiny
from seedvr2_tpu.io import native_ckpt as NC
from seedvr2_tpu.models.vae.model import init_vae_params


def test_save_load_roundtrip(tmp_path):
    params = init_vae_params(vae_tiny(), jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.orbax")
    NC.save_params(path, params)
    restored = NC.load_params(path)
    f0 = jax.tree.leaves(params)
    f1 = jax.tree.leaves(restored)
    assert len(f0) == len(f1)
    for a, b in zip(f0, f1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_or_convert_caches(tmp_path):
    src = tmp_path / "model.safetensors"
    src.write_bytes(b"fake")
    calls = {"n": 0}

    def convert(path):
        calls["n"] += 1
        return {"w": np.arange(4, dtype=np.float32)}

    cache = str(tmp_path / "cache.orbax")
    p1 = NC.load_or_convert(str(src), convert, cache_dir=cache)
    p2 = NC.load_or_convert(str(src), convert, cache_dir=cache)
    assert calls["n"] == 1  # second load from cache
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(p2["w"]))
    # touching the source invalidates the cache
    import os, time

    os.utime(src, (time.time() + 10, time.time() + 10))
    NC.load_or_convert(str(src), convert, cache_dir=cache)
    assert calls["n"] == 2
