"""Category logger + nested phase timers + device memory snapshots.

TPU-native analog of the reference Debug subsystem (reference:
src/utils/debug.py:42-799): same user-facing surface (category/emoji logs,
nested timers with child breakdown, per-phase FPS), with CUDA memory probes
replaced by jax device memory_stats and optional jax.profiler traces.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List, Optional

_CATEGORY_ICONS = {
    "setup": "🔧",
    "generation": "🎬",
    "vae": "🧩",
    "dit": "🧠",
    "video": "📼",
    "memory": "📊",
    "precision": "🎯",
    "timing": "⏱️",
    "tip": "💡",
    "error": "❌",
    "alpha": "🎭",
    "sharding": "🕸️",
    "info": "ℹ️",
    "none": "",
}


class Debug:
    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self._timers: Dict[str, float] = {}
        self._stack: List[str] = []
        self._children: Dict[str, List[tuple]] = {}

    def log(
        self,
        msg: str,
        category: str = "info",
        level: str = "INFO",
        force: bool = False,
        indent_level: int = 0,
    ) -> None:
        if not (self.enabled or force):
            return
        icon = _CATEGORY_ICONS.get(category, "")
        indent = "  " * indent_level
        prefix = f"{icon} " if icon else ""
        print(f"{indent}{prefix}{msg}")

    # ------------------------------- timers -------------------------------- #

    def start_timer(self, name: str) -> None:
        self._timers[name] = time.perf_counter()
        self._stack.append(name)
        self._children.setdefault(name, [])

    def end_timer(self, name: str, msg: str = "", show_breakdown: bool = False) -> float:
        t0 = self._timers.pop(name, None)
        if t0 is None:
            return 0.0
        dt = time.perf_counter() - t0
        if self._stack and self._stack[-1] == name:
            self._stack.pop()
        if self._stack:
            self._children.setdefault(self._stack[-1], []).append((name, dt))
        if msg:
            self.log(f"{msg}: {dt:.2f}s", category="timing")
        if show_breakdown and self._children.get(name):
            for child, cdt in self._children[name]:
                self.log(f"{child}: {cdt:.2f}s", category="timing", indent_level=1)
        return dt

    @contextmanager
    def timer(self, name: str, msg: str = ""):
        self.start_timer(name)
        try:
            yield
        finally:
            self.end_timer(name, msg or name)

    # ------------------------------- memory -------------------------------- #

    def log_memory_state(self, label: str, **_kw) -> None:
        if not self.enabled:
            return
        try:
            import jax

            dev = jax.devices()[0]
            stats = dev.memory_stats() or {}
            used = stats.get("bytes_in_use", 0) / 1024**3
            limit = stats.get("bytes_limit", 0) / 1024**3
            self.log(f"{label}: HBM {used:.2f}/{limit:.2f} GiB", category="memory")
        except Exception:
            pass

    @contextmanager
    def profile(self, logdir: str = "/tmp/seedvr2_profile"):
        """jax.profiler trace around a region (TPU analog of the reference's
        homemade timing subsystem; view with tensorboard/xprof)."""
        import jax

        with jax.profiler.trace(logdir):
            yield
        self.log(f"Profiler trace written to {logdir}", category="timing", force=True)

    def environment_report(self) -> None:
        """Reference: debug.py:178-257 env report (OS/GPU/torch/attn libs) —
        TPU analog: platform, jax, device inventory, attention backend."""
        if not self.enabled:
            return
        import platform

        import jax

        self.log(f"OS: {platform.platform()}", category="setup")
        self.log(f"Python: {platform.python_version()}  JAX: {jax.__version__}", category="setup")
        self.log(f"Backend: {jax.default_backend()}  Devices: {[str(d) for d in jax.devices()]}", category="setup")
        try:
            from ..ops.attention import get_attention_backend

            self.log(f"Attention backend: {get_attention_backend()}", category="setup")
        except Exception:
            pass
        try:
            from ..io.frameops import available as native_ok

            self.log(f"Native frameops: {'available' if native_ok() else 'numpy fallback'}", category="setup")
        except Exception:
            pass
