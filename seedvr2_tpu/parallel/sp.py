"""Sequence parallelism: shard the token/window dimension across the "seq"
mesh axis.

The reference carries a complete but dormant Ulysses implementation —
sequence-sharded activations with all-to-all seq<->heads exchanges around
attention (reference: src/common/distributed/ops.py:41-332; model hooks at
mmattn.py:90-101, patch_v1.py:95-118, modulation.py:83-85; never enabled at
inference). Here SP is first-class and simpler: windows are *independent*
in window attention, so sharding the window axis across "seq" IS the
sequence parallelism — GSPMD turns the window gather/scatter into the
all-to-all the reference hand-wrote. Enabled via a context manager that
installs sharding constraints inside nadit_forward.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

from .mesh import AXIS_SEQ, AXIS_TENSOR

_STATE = threading.local()


def current_hints():
    return getattr(_STATE, "hints", None)


class ShardingHints:
    """PartitionSpecs applied at fixed points of the DiT forward."""

    def __init__(self, mesh: jax.sharding.Mesh, seq: bool = True, tensor: bool = True):
        self.mesh = mesh
        self.seq = seq
        self.tensor = tensor
        s = AXIS_SEQ if seq else None
        t = AXIS_TENSOR if tensor else None
        self.tokens = P(None, s, None)  # [B, L, D]
        self.windows = P(None, s, None, None, t, None)  # [B, nW, mL, 3, H, hd]
        self.attn_io = P(s, None, t, None)  # [B*nW, S, H, hd]

    def constrain(self, x, spec: P):
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(self.mesh, spec)
        )


@contextlib.contextmanager
def sharded_dit(mesh: jax.sharding.Mesh, seq: bool = True, tensor: bool = True):
    """Enable sequence/tensor sharding constraints inside nadit_forward."""
    prev = getattr(_STATE, "hints", None)
    _STATE.hints = ShardingHints(mesh, seq, tensor)
    try:
        yield _STATE.hints
    finally:
        _STATE.hints = prev


def constrain_tokens(x):
    h = current_hints()
    return h.constrain(x, h.tokens) if h is not None else x


def constrain_windows(x):
    h = current_hints()
    return h.constrain(x, h.windows) if h is not None else x


def constrain_attn_io(x):
    h = current_hints()
    return h.constrain(x, h.attn_io) if h is not None else x
