"""GSPMD parameter sharding rules.

Replaces BlockSwap CPU offload and the reference's vestigial FSDP config
(reference: src/optimization/blockswap.py; configs_*/main.yaml fsdp
_HYBRID_SHARD_ZERO2): instead of swapping DiT blocks to host RAM, the big
matrices live sharded across the "tensor" mesh axis and XLA inserts the
collectives (Megatron-style: qkv/mlp-in column-parallel, out/mlp-out
row-parallel, so each block costs one all-reduce per projection pair).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import AXIS_TENSOR


def _dit_leaf_spec(path: str, leaf) -> P:
    """Partition spec for a DiT param leaf, keyed on its flat path.

    Leaves under ``blocks_scan`` carry an extra leading layer axis (stacked
    for the lax.scan execution, models/dit/nadit.py:stack_blocks): the spec
    is computed for the underlying weight shape and the layer axis stays
    unsharded (every chip runs every layer)."""
    stacked = "blocks_scan/" in path
    nd = leaf.ndim - (1 if stacked else 0)

    def wrap(*spec) -> P:
        return P(None, *spec) if stacked else P(*spec)

    if nd < 2:
        return P()  # biases, norms, ada vectors: replicated (any layout)
    # column-parallel (shard output dim): qkv, mlp inputs
    if "attn/qkv" in path:
        # qkv is stored [D, 3, inner] so the head dim shards cleanly
        return wrap(None, None, AXIS_TENSOR) if nd == 3 else wrap(None, AXIS_TENSOR)
    if "attn/out" in path:
        return wrap(AXIS_TENSOR, None)  # row-parallel (shard input dim = heads)
    if "mlp" in path and "proj_out" in path:
        return wrap(AXIS_TENSOR, None)
    if "mlp" in path and ("proj_in" in path or "proj_in_gate" in path):
        return wrap(None, AXIS_TENSOR)
    return P()  # patch in/out, txt_in, emb_in: small, replicated


def dit_param_shardings(params, mesh: jax.sharding.Mesh):
    """Pytree of NamedShardings matching the DiT params tree."""
    from ..io.weights import flatten_tree, unflatten_into

    flat = flatten_tree(params)
    specs = {k: NamedSharding(mesh, _dit_leaf_spec(k, v)) for k, v in flat.items()}
    return unflatten_into(params, specs)


def vae_param_shardings(params, mesh: jax.sharding.Mesh):
    """VAE params are small (~250M); replicate."""
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)


def shard_params(params, shardings):
    """device_put each leaf with its sharding (host -> sharded HBM)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings, is_leaf=lambda x: not isinstance(x, (dict, list))
    )
