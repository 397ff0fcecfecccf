"""Multi-host execution over DCN: jax.distributed init + per-host feeding.

The reference's multi-device story is one spawned process per GPU with
frame-range splitting and shared-memory hand-back (reference:
inference_cli.py:1015-1104 worker processes, :1127-1288 fan-out). The
TPU-native equivalent is ONE logical SPMD program over a global mesh that
spans hosts: every process runs the same program, each host feeds only the
frame segments of its own local devices
(jax.make_array_from_process_local_data over the "data" axis), and XLA
routes any cross-host communication over DCN while "seq"/"tensor"
collectives stay on ICI within a host's slice (parallel/mesh.py axis
order).

Validated in CI with a 2-process CPU mesh (tests/test_multihost.py) — the
torch reference has no distributed tests at all (SURVEY §4).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join the multi-host job. Must run before any jax computation; the
    caller sets JAX_PLATFORMS / XLA_FLAGS (device counts) in the
    environment before importing jax."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh(seq: int = 1, tensor: int = 1):
    """Mesh over ALL global devices with everything left after seq/tensor
    on the leading "data" axis — the multi-host frame-DP layout. Device
    order follows jax.devices() (process-major), so contiguous data-axis
    coordinates belong to the same host and segment feeding is local."""
    import jax

    from .mesh import make_mesh

    n = jax.device_count()
    if n % (seq * tensor):
        raise ValueError(f"{n} devices not divisible by seq*tensor={seq * tensor}")
    return make_mesh(n // (seq * tensor), seq, tensor, devices=jax.devices())


def local_data_coords(mesh) -> Tuple[int, int]:
    """[lo, hi) range of "data"-axis coordinates whose devices live on THIS
    process — the segments this host must decode/feed."""
    import jax

    axes = mesh.axis_names
    data_idx = axes.index("data")
    coords = [
        idx[data_idx]
        for idx, d in np.ndenumerate(mesh.devices)
        if d.process_index == jax.process_index()
    ]
    if not coords:
        return (0, 0)
    lo, hi = min(coords), max(coords) + 1
    if set(coords) != set(range(lo, hi)):
        raise ValueError(
            "this host's data-axis coordinates are not contiguous; use the "
            "default process-major device order from global_data_mesh"
        )
    return lo, hi


def feed_host_segments(mesh, local_segments: np.ndarray, spec=None):
    """Assemble the global segment batch from per-host pieces.

    ``local_segments``: [n_local_data, ...] — this host's slice of the
    leading (data-sharded) axis, in data-coordinate order
    (local_data_coords). Returns a global jax.Array sharded over "data"
    whose per-host shards never crossed DCN (the reference ships every
    worker result through host shared memory instead,
    inference_cli.py:1099-1104)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))
    n_data = mesh.shape["data"]
    global_shape = (n_data,) + tuple(local_segments.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_segments), global_shape
    )
