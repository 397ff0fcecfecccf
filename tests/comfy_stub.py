"""Stub ComfyUI host modules for executing the V3 node surface in tests.

Provides the minimal ``comfy_api.latest`` / ``comfy.utils`` /
``comfy.model_management`` API that seedvr2_tpu/interfaces.py touches
(reference host API: ComfyUI's comfy_api V3 — see the reference nodes,
/root/reference/src/interfaces/video_upscaler.py:226-580). Install with
``install(monkeypatch)``; every attribute records enough state for tests to
assert the progress/interrupt/IMAGE contracts.
"""

from __future__ import annotations

import sys
import types
from dataclasses import dataclass, field
from typing import Any, List, Optional


# --------------------------------------------------------------------------- #
# comfy_api.latest: io namespace, ComfyExtension, get_executing_context
# --------------------------------------------------------------------------- #


@dataclass
class StubInput:
    name: str
    kind: str
    options: Optional[list] = None
    default: Any = None
    optional: bool = False


@dataclass
class StubOutput:
    kind: str
    display_name: Optional[str] = None


def _scalar_io(kind: str):
    class _K:
        @staticmethod
        def Input(name, default=None, optional=False, options=None, **_kw):
            return StubInput(name, kind, options, default, optional)

        @staticmethod
        def Output(display_name=None, **_kw):
            return StubOutput(kind, display_name)

    _K.__name__ = kind
    return _K


class _Custom:
    def __init__(self, type_name: str):
        self.type_name = type_name

    def Input(self, name, optional=False, **_kw):
        return StubInput(name, f"Custom:{self.type_name}", optional=optional)

    def Output(self, display_name=None, **_kw):
        return StubOutput(self.type_name, display_name)


@dataclass
class StubSchema:
    node_id: str
    display_name: str
    category: str
    inputs: List[StubInput]
    outputs: List[StubOutput]


class StubComfyNode:
    """V3 node base; real ComfyUI adds hidden plumbing we don't need."""


@dataclass
class StubNodeOutput:
    values: tuple

    def __init__(self, *values):
        self.values = values


class StubComfyExtension:
    pass


@dataclass
class _ExecContext:
    node_id: Optional[str] = None


class ComfyState:
    """Mutable host state the tests poke: interrupt flag, progress records,
    the executing-context node id."""

    def __init__(self):
        self.interrupted = False
        self.progress_bars: List["StubProgressBar"] = []
        self.node_id: Optional[str] = None


class InterruptProcessingException(Exception):
    pass


class StubProgressBar:
    def __init__(self, state: ComfyState, total: int):
        self.total = total
        self.updates: List[int] = []
        state.progress_bars.append(self)

    def update_absolute(self, value, total):
        self.updates.append(int(value))


def install(monkeypatch) -> ComfyState:
    """Register the stub modules in sys.modules (monkeypatch-scoped) and
    return the shared mutable state object."""
    state = ComfyState()

    io_mod = types.ModuleType("comfy_api.latest.io")
    for kind in ("Image", "Int", "Float", "Boolean", "Combo", "String"):
        setattr(io_mod, kind, _scalar_io(kind))
    io_mod.Custom = _Custom
    io_mod.Schema = StubSchema
    io_mod.ComfyNode = StubComfyNode
    io_mod.NodeOutput = StubNodeOutput

    latest = types.ModuleType("comfy_api.latest")
    latest.io = io_mod
    latest.ComfyExtension = StubComfyExtension
    latest.get_executing_context = lambda: _ExecContext(state.node_id)

    comfy_api = types.ModuleType("comfy_api")
    comfy_api.latest = latest

    comfy = types.ModuleType("comfy")
    utils = types.ModuleType("comfy.utils")
    utils.ProgressBar = lambda total: StubProgressBar(state, total)
    mm = types.ModuleType("comfy.model_management")
    mm.InterruptProcessingException = InterruptProcessingException

    def throw_exception_if_processing_interrupted():
        if state.interrupted:
            raise InterruptProcessingException()

    mm.throw_exception_if_processing_interrupted = (
        throw_exception_if_processing_interrupted
    )
    comfy.utils = utils
    comfy.model_management = mm

    for name, mod in [
        ("comfy_api", comfy_api),
        ("comfy_api.latest", latest),
        ("comfy_api.latest.io", io_mod),
        ("comfy", comfy),
        ("comfy.utils", utils),
        ("comfy.model_management", mm),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return state
