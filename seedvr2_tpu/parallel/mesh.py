"""Device mesh construction.

Replaces the reference's process-group plumbing (reference:
src/common/distributed/basic.py:64-77 NCCL init, advanced.py:129-192 SP and
FSDP groups) with named jax mesh axes:

- "data":   frame-chunk data parallelism (the reference's multi-GPU
            mp.spawn fan-out, inference_cli.py:1127-1288);
- "seq":    sequence parallelism inside one video batch — windows of the
            window-attention layout are sharded across chips (the
            reference's dormant Ulysses path, common/distributed/ops.py);
- "tensor": weight/head sharding of the DiT (replaces BlockSwap/FSDP).

Axes ride ICI within a slice; "data" is the outermost axis so multi-slice
deployments put it on DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_TENSOR = "tensor"


def make_mesh(
    data: int = 1,
    seq: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> jax.sharding.Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * seq * tensor
    if n > len(devices):
        raise ValueError(f"mesh {data}x{seq}x{tensor} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, seq, tensor)
    return jax.sharding.Mesh(arr, (AXIS_DATA, AXIS_SEQ, AXIS_TENSOR))


def auto_mesh_shape(
    n_devices: int,
    n_frames: Optional[int] = None,
    heads: int = 0,
    model_bytes: int = 0,
    hbm_bytes: int = 0,
) -> Tuple[int, int, int]:
    """Workload-aware (data, seq, tensor) factorization of ``n_devices``.

    Policy (pinned by tests/test_parallel.py::TestAutoMeshPolicy), informed
    by this repo's own measurements (docs/ROADMAP.md #7: frame-DP + tile
    parallelism dominate the VAE, which dominates wall clock):

    1. Tensor-shard the DiT only as much as REQUIRED for the weights to fit
       beside activations (weights > ~50% of HBM per chip) — the TPU analog
       of the reference choosing fp8/BlockSwap tiers before multi-GPU.
    2. Frame data-parallelism takes everything that remains when the video
       has >= 2 frames per data shard (the reference's only active
       multi-GPU mode, inference_cli.py:1127-1288).
    3. Images / short clips put the leftover chips on "tensor" for DiT
       latency (bounded by head divisibility); VAE tiles ride the full
       mesh either way (Runner._tile_parallel shards the tile batch over
       every axis).

    Unknown workloads (n_frames=None) behave like long videos: data-first.
    """
    n = n_devices
    if n <= 1:
        return (1, 1, 1)

    def tensor_ok(c: int) -> bool:
        return n % c == 0 and (heads == 0 or heads % c == 0)

    # 1. minimal tensor shard for residency
    tensor = 1
    if model_bytes and hbm_bytes:
        while (
            tensor < n
            and model_bytes / tensor > 0.5 * hbm_bytes
            and tensor_ok(tensor * 2)
        ):
            tensor *= 2
    data = n // tensor
    # 2. long video (or unknown): frame-DP takes the rest
    if n_frames is None or n_frames >= 2 * data:
        return (data, 1, tensor)
    # 3. image / short clip: grow tensor while the data axis would starve
    while (
        tensor < n
        and tensor_ok(tensor * 2)
        and (n_frames < 2 * (n // tensor) or tensor == 1)
    ):
        tensor *= 2
    return (n // tensor, 1, tensor)


def auto_mesh(
    n_devices: Optional[int] = None,
    n_frames: Optional[int] = None,
    heads: int = 0,
    model_bytes: int = 0,
    hbm_bytes: int = 0,
    devices: Optional[Sequence[jax.Device]] = None,
) -> jax.sharding.Mesh:
    """Default inference mesh for the workload — see auto_mesh_shape."""
    n = n_devices or len(devices if devices is not None else jax.devices())
    d, s, t = auto_mesh_shape(n, n_frames, heads, model_bytes, hbm_bytes)
    return make_mesh(d, s, t, devices=devices)


def replicated(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
