"""High-level loader: checkpoint files -> ready Runner.

Single entry point shared by the CLI, the node layer, and library users —
the TPU analog of the reference's configure_runner + materialize_model
lifecycle (reference: src/core/model_configuration.py:732-834,
model_loader.py:468-544) without the meta-device deferral: weights convert
(with an orbax cache), cast to bf16, and optionally quantize/shard.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import PipelineConfig, dit_3b, dit_7b, vae_config
from ..utils.debug import Debug


def dit_param_bytes(dit_cfg, quantize: Optional[str] = None) -> int:
    """Estimated resident bytes of the DiT weights (shape-only eval, no
    allocation) — feeds the workload-aware mesh policy
    (parallel/mesh.py:auto_mesh_shape)."""
    import jax
    import jax.numpy as jnp

    from ..models.dit.nadit import init_params

    tree = jax.eval_shape(
        lambda k: init_params(dit_cfg, k, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))
    return n * (1 if quantize == "int8" else 2)


def auto_quantize(dit_cfg, quantize: Optional[str], hbm_bytes: int) -> Optional[str]:
    """The loader's quantization default: 7B bf16 (~14.5GB) doesn't fit next
    to activations on a 16GB chip, and int8-at-rest measures FASTER than
    bf16 (docs/PERFORMANCE.md) — the TPU analog of the reference defaulting
    the 7B tier to fp8 (reference: model_registry.py:56)."""
    if quantize is None and dit_cfg.variant == "7b" and hbm_bytes < 20 << 30:
        return "int8"
    return quantize


def load_runner(
    dit_model: str,
    vae_model: str = "ema_vae_fp16.safetensors",
    model_dir: str = "./models",
    cfg: Optional[PipelineConfig] = None,
    quantize: Optional[str] = None,  # None | "int8"
    mesh=None,
    shard_dit: bool = False,
    download: bool = True,
    debug: Optional[Debug] = None,
    emb_dir: Optional[str] = None,
):
    """Build a Runner from reference checkpoint files.

    - dit variant picked by "7b" in the name (reference:
      model_configuration.py:718-720)
    - .gguf sources are dequantized and re-quantized int8 at rest
    - with mesh + shard_dit, DiT weights are device_put with Megatron-style
      NamedShardings (parallel/sharding.py)
    """
    import jax
    import jax.numpy as jnp

    from ..io import native_ckpt, registry, weights
    from ..models.dit.nadit import init_params as init_dit
    from ..models.vae.model import init_vae_params
    from .runner import Runner

    debug = debug or Debug()
    inferred = dit_7b() if registry.model_variant(dit_model) == "7b" else dit_3b()
    if cfg is None:
        cfg = PipelineConfig(dit=inferred, vae=vae_config())
    elif cfg.dit.variant in ("3b", "7b") and cfg.dit.variant != inferred.variant:
        # caller passed a default 3b/7b config but the model name says
        # otherwise (reference picks configs_7b iff "7b" in name)
        cfg = cfg.replace(dit=inferred)

    dit_path = os.path.join(model_dir, dit_model)
    vae_path = os.path.join(model_dir, vae_model)
    if download and not os.path.exists(dit_path):
        registry.download_model(dit_model, model_dir)
    if download and not os.path.exists(vae_path):
        registry.download_model(vae_model, model_dir)

    dtype = jnp.dtype(cfg.compute_dtype)
    t_dit = jax.eval_shape(lambda k: init_dit(cfg.dit, k, dtype), jax.random.PRNGKey(0))
    t_vae = jax.eval_shape(lambda k: init_vae_params(cfg.vae, k, dtype), jax.random.PRNGKey(0))

    debug.log(f"Loading DiT weights: {dit_path}", category="dit", force=True)
    dit_params = native_ckpt.load_or_convert(
        dit_path, lambda p: weights.load_dit_params(p, cfg.dit, t_dit, np.float32)
    )
    debug.log(f"Loading VAE weights: {vae_path}", category="vae", force=True)
    vae_params = native_ckpt.load_or_convert(
        vae_path, lambda p: weights.load_vae_params(p, cfg.vae, t_vae, np.float32)
    )

    from .phases import _hbm_bytes

    q = auto_quantize(cfg.dit, quantize, _hbm_bytes())
    if q != quantize:
        debug.log("7B on <20GB HBM: defaulting to int8 weight storage",
                  category="dit", force=True)
    quantize = q
    if quantize == "int8" or dit_model.endswith(".gguf"):
        from ..ops.quant import quantize_dit_params

        dit_params = quantize_dit_params(dit_params)

    def _cast(path, x):
        x = np.asarray(x)
        if x.dtype == np.int8 or (path and getattr(path[-1], "key", None) == "w_s"):
            return jnp.asarray(x)  # int8 payload + fp32 scales stay as-is
        return jnp.asarray(x, dtype)

    from jax.tree_util import tree_map_with_path, DictKey

    dit_params = tree_map_with_path(lambda p, x: _cast(p, x), dit_params)
    vae_params = jax.tree.map(lambda x: jnp.asarray(x, dtype), vae_params)

    # Stack uniform layer runs for the lax.scan execution (one compiled
    # pair body instead of num_layers inlined copies; ~15x smaller DiT
    # programs and a handful of weight leaves — models/dit/nadit.py:
    # layer_exec_plan). Device-side, consuming the per-layer leaves, so
    # peak HBM overhead is one stacked leaf group.
    from ..models.dit.nadit import stack_blocks

    dit_params = stack_blocks(dit_params, cfg.dit)

    if mesh is not None and shard_dit:
        from ..parallel.sharding import dit_param_shardings, shard_params

        dit_params = shard_params(dit_params, dit_param_shardings(dit_params, mesh))

    pos, neg = weights.load_text_embeddings(emb_dir)
    # smoke-test configs use small txt dims; real models match exactly
    if pos.shape[-1] > cfg.dit.txt_in_dim:
        pos = pos[:, : cfg.dit.txt_in_dim]
        neg = neg[:, : cfg.dit.txt_in_dim]
    return Runner(cfg, dit_params, vae_params, pos, neg, debug=debug, mesh=mesh)
