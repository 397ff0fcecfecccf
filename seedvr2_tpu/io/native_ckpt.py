"""Native checkpoint cache (orbax).

The reference re-parses torch safetensors on every cold start (reference:
model_loader.py:84-153). Here the converted TPU-layout param tree can be
saved once with orbax and memory-mapped back in subsequent runs — directly
in our layout/dtype and, on multi-chip, restored pre-sharded. This is the
framework's own checkpoint format; the torch files remain the interchange
format (io/weights.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> None:
    """Save a param pytree (host or device arrays) to `path` (directory)."""
    ckptr = _checkpointer()
    host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)
    ckptr.save(os.path.abspath(path), host, force=True)


def load_params(path: str, shardings: Optional[Any] = None) -> Any:
    """Restore a param pytree; leaves restored as numpy (device_put by the
    caller, optionally with NamedShardings)."""
    ckptr = _checkpointer()
    restored = ckptr.restore(os.path.abspath(path))
    if shardings is not None:
        restored = jax.tree.map(lambda x, s: jax.device_put(x, s), restored, shardings)
    return restored


def cache_path(model_dir: str, model_name: str) -> str:
    return os.path.join(model_dir, "tpu_cache", model_name.replace("/", "_") + ".orbax")


def load_or_convert(
    model_path: str,
    convert_fn,
    cache_dir: Optional[str] = None,
) -> Any:
    """Load from the orbax cache if fresh, else convert from the torch file
    and populate the cache. `convert_fn(path) -> pytree`."""
    if cache_dir is None:
        cache_dir = cache_path(os.path.dirname(model_path), os.path.basename(model_path))
    src_mtime = os.path.getmtime(model_path) if os.path.exists(model_path) else 0
    marker = os.path.join(cache_dir, ".src_mtime")
    if os.path.isdir(cache_dir) and os.path.exists(marker):
        try:
            with open(marker) as f:
                if float(f.read().strip()) == src_mtime:
                    return load_params(cache_dir)
        except Exception:
            pass
    params = convert_fn(model_path)
    try:
        save_params(cache_dir, params)
        with open(marker, "w") as f:
            f.write(str(src_mtime))
    except Exception:
        pass  # cache failures are non-fatal
    return params
