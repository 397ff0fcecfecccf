"""Weight-only int8 quantization for DiT linears.

TPU counterpart of the reference's FP8/GGUF storage tiers (reference:
src/optimization/compatibility.py:720-955 CompatibleDiT fp8 storage;
src/optimization/gguf_ops.py dequant-on-use layers): big projection
matrices are stored int8 with a per-output-channel float scale and widened
inside the matmul. Because the scale is per *output* channel,

    y = (x @ W_q) * s  ==  x @ (W_q * s)

so no dequantized copy of W ever exists — the int8->bf16 convert fuses into
the MXU operand load. Cuts 7B DiT weights from 14.3GB to ~7.2GB, fitting a
single 16GB v5e chip with headroom (the reference needs BlockSwap for
that tier).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """w: [..., dout] (contraction dims leading) -> int8 + per-dout scale."""
    wf = np.asarray(w, np.float32)
    absmax = np.max(np.abs(wf), axis=tuple(range(wf.ndim - 1)), keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(wf / np.maximum(scale, 1e-12)), -127, 127).astype(np.int8)
    return {"w_q": jnp.asarray(q), "w_s": jnp.asarray(scale.reshape(-1))}


def is_quantized(p: Dict) -> bool:
    return "w_q" in p


def dequantize_weight(p: Dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (p["w_q"].astype(jnp.float32) * p["w_s"]).astype(dtype)


def linear_apply(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Dense or quantized linear. Quantized: matmul in the input dtype with
    int8 operand widened on the fly, then per-column rescale."""
    if not is_quantized(p):
        y = x @ p["w"].astype(x.dtype)
    else:
        y = x @ p["w_q"].astype(x.dtype)
        y = y * p["w_s"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


_QUANT_MIN_SIZE = 1 << 16  # only quantize matrices; leave vectors dense


def _quantize_tree(tree, min_size=_QUANT_MIN_SIZE):
    if isinstance(tree, dict):
        if "w" in tree and hasattr(tree["w"], "ndim") and tree["w"].ndim >= 2 and tree["w"].size >= min_size:
            out = {k: v for k, v in tree.items() if k != "w"}
            w = tree["w"]
            if w.ndim == 3:  # qkv stored [D, 3, inner]
                q = quantize_weight(w.reshape(w.shape[0], -1))
                out["w_q"] = q["w_q"].reshape(w.shape)
                out["w_s"] = q["w_s"].reshape(w.shape[1:])
            else:
                out.update(quantize_weight(w))
            return out
        return {k: _quantize_tree(v, min_size) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_quantize_tree(v, min_size) for v in tree]
    return tree


def quantize_dit_params(params, min_size: int = None) -> Dict:
    """Quantize every large linear in a DiT param tree (blocks only; patch
    in/out and embeddings stay bf16 — they are <1% of bytes and
    quality-sensitive, mirroring the reference's mixed-precision fp8
    checkpoints that keep block 35 / IO in fp16)."""
    if min_size is None:
        min_size = _QUANT_MIN_SIZE
    out = dict(params)
    out["blocks"] = [_quantize_tree(b, min_size) for b in params["blocks"]]
    return out


def tree_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def synthetic_quantized_dit_params(cfg, seed: int = 0, dense_dtype="bfloat16"):
    """Random param tree with the exact int8-quantized structure, built
    directly with numpy (no full-precision tree ever materializes).

    For benches and dryruns only: weight VALUES don't change the math cost,
    and init+quantize of a real 7B tree costs minutes of host time and 2x
    the RAM. Leaves match quantize_dit_params(init_params(cfg)) exactly in
    shape/dtype (asserted in tests/test_quant.py)."""
    from ..models.dit.nadit import init_params

    dense = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.dtype(dense_dtype)),
        jax.random.PRNGKey(0),
    )
    rng = np.random.RandomState(seed)

    def dense_leaf(s):
        return (rng.rand(*s.shape).astype(np.float32) * 0.02 - 0.01).astype(
            np.dtype(s.dtype)
        )

    def walk(tree, quantize):
        if isinstance(tree, dict):
            w = tree.get("w")
            if quantize and w is not None and hasattr(w, "ndim") and w.ndim >= 2 and int(np.prod(w.shape)) >= _QUANT_MIN_SIZE:
                out = {k: walk(v, quantize) for k, v in tree.items() if k != "w"}
                # dtype=int8 generates natively — the default int64 path
                # materializes 8 B/elem transients (~53 GB for 7B) and
                # dominates bench/dryrun setup time.
                out["w_q"] = rng.randint(-100, 100, w.shape, dtype=np.int8)
                sshape = w.shape[1:] if w.ndim == 3 else (w.shape[-1],)
                out["w_s"] = np.full(sshape, 2e-4, np.float32)
                return out
            return {k: walk(v, quantize) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, quantize) for v in tree]
        return dense_leaf(tree)

    # blocks only, like quantize_dit_params: patch/emb IO stays dense
    out = {k: walk(v, False) for k, v in dense.items() if k != "blocks"}
    out["blocks"] = [walk(b, True) for b in dense["blocks"]]
    return out


def _abstract_synthetic(cfg, dense_dtype="bfloat16"):
    """ShapeDtypeStruct tree with the int8-quantized structure of
    synthetic_quantized_dit_params (same walk, no values)."""
    from ..models.dit.nadit import init_params

    dense = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.dtype(dense_dtype)),
        jax.random.PRNGKey(0),
    )
    SDS = jax.ShapeDtypeStruct

    def walk(tree, quantize):
        if isinstance(tree, dict):
            w = tree.get("w")
            if quantize and w is not None and getattr(w, "ndim", 0) >= 2 and int(np.prod(w.shape)) >= _QUANT_MIN_SIZE:
                out = {k: walk(v, quantize) for k, v in tree.items() if k != "w"}
                out["w_q"] = SDS(w.shape, jnp.int8)
                sshape = w.shape[1:] if w.ndim == 3 else (w.shape[-1],)
                out["w_s"] = SDS(sshape, jnp.float32)
                return out
            return {k: walk(v, quantize) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, quantize) for v in tree]
        return SDS(tree.shape, tree.dtype)

    out = {k: walk(v, False) for k, v in dense.items() if k != "blocks"}
    out["blocks"] = [walk(b, True) for b in dense["blocks"]]
    return out


def synthetic_quantized_dit_params_on_device(
    cfg,
    seed: int = 0,
    dense_dtype="bfloat16",
    stacked: bool = True,
    shardings_fn=None,
    per_leaf: bool = False,
):
    """Device-resident variant of synthetic_quantized_dit_params: the whole
    tree is produced by ONE jitted program on the default device, so no
    multi-GB host materialization and no weight upload happen at all (the
    host-side path costs minutes of numpy time plus a 3.3GB/7.2GB transfer
    at the dev tunnel's ~40MB/s — it dominated bench setup). With
    ``stacked=True`` leaves are generated directly in the scan layout of
    ``stack_blocks`` so the unstacked copy never exists and peak HBM is one
    tree (the 7B int8 tree alone is 7.2GB; tree + stacked copy would not
    leave room for activations on a 16GB chip).

    ``shardings_fn``, if given, maps the abstract (stacked) tree to a pytree
    of NamedShardings used as the generator's out_shardings — leaves land
    directly sharded across the mesh, skipping the unsharded materialization
    and the device_put reshard (used by the multichip dryrun gate).

    ``per_leaf=True`` generates each leaf as its own (blocking) jit call
    instead of one whole-tree program. Values are identical (same fold_in
    sequence). Needed on XLA:CPU under SPMD out_shardings, where buffer
    assignment of the single whole-tree program materialized a 65GB tuple
    and OOM-killed the 125GB gate host; on a real TPU the single program
    fits 16GB HBM fine and amortizes dispatch, so it stays the default."""
    abs_tree = _abstract_synthetic(cfg, dense_dtype)
    if stacked:
        from ..models.dit.nadit import stack_blocks

        abs_tree = jax.eval_shape(lambda t: stack_blocks(t, cfg), abs_tree)
    flat, treedef = jax.tree_util.tree_flatten_with_path(abs_tree)

    def leaf_name(path):
        last = path[-1]
        return str(getattr(last, "key", last))

    def gen_leaf(i, path, sds):
        k = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        name = leaf_name(path)
        if name == "w_q":
            return jax.random.randint(k, sds.shape, -100, 100, jnp.int8)
        if name == "w_s":
            return jnp.full(sds.shape, 2e-4, jnp.float32)
        return (jax.random.uniform(k, sds.shape, jnp.float32) * 0.02 - 0.01).astype(
            sds.dtype
        )

    shardings = shardings_fn(abs_tree) if shardings_fn is not None else None
    if per_leaf:
        sh_flat = (
            jax.tree_util.tree_leaves(
                shardings, is_leaf=lambda x: isinstance(x, jax.sharding.Sharding)
            )
            if shardings is not None
            else [None] * len(flat)
        )
        leaves = []
        for i, ((path, sds), sh) in enumerate(zip(flat, sh_flat)):
            fn = jax.jit(
                lambda i=i, path=path, sds=sds: gen_leaf(i, path, sds),
                **({"out_shardings": sh} if sh is not None else {}),
            )
            leaf = fn()
            jax.block_until_ready(leaf)  # bound peak memory to one leaf
            leaves.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def build():
        return jax.tree_util.tree_unflatten(
            treedef, [gen_leaf(i, path, sds) for i, (path, sds) in enumerate(flat)]
        )

    if shardings is not None:
        return jax.jit(build, out_shardings=shardings)()
    return jax.jit(build)()
