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


def auto_mesh(n_devices: Optional[int] = None) -> jax.sharding.Mesh:
    """Default inference mesh: favor tensor-parallel within small counts,
    then sequence, then data."""
    n = n_devices or len(jax.devices())
    if n == 1:
        return make_mesh(1, 1, 1)
    tensor = 1
    for c in (8, 4, 2):
        if n % c == 0:
            tensor = c
            break
    rem = n // tensor
    seq = 1
    for c in (4, 2):
        if rem % c == 0:
            seq = c
            break
    data = rem // seq
    return make_mesh(data, seq, tensor)


def replicated(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
