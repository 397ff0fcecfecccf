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
        """One line of current HBM use, with the delta since the previous
        call — the reference prints a per-batch VRAM delta in debug mode
        (reference: debug.py:640-689)."""
        if not self.enabled:
            return
        try:
            import jax

            dev = jax.devices()[0]
            stats = dev.memory_stats() or {}
            used_b = stats.get("bytes_in_use", 0)
            limit = stats.get("bytes_limit", 0) / 1024**3
            prev = getattr(self, "_last_bytes_in_use", None)
            self._last_bytes_in_use = used_b
            delta = "" if prev is None else f" ({(used_b - prev) / 1024**3:+.2f})"
            self.log(
                f"{label}: HBM {used_b / 1024**3:.2f}/{limit:.2f} GiB{delta}",
                category="memory",
            )
        except Exception:
            pass

    def peak_memory_summary(self) -> None:
        """End-of-run peak-memory report (reference: debug.py:640-689
        peak-VRAM summary): device peak_bytes_in_use + host process RSS."""
        if not self.enabled:
            return
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", 0) / 1024**3
            used = stats.get("bytes_in_use", 0) / 1024**3
            limit = stats.get("bytes_limit", 0) / 1024**3
            self.log(
                f"Peak HBM: {peak:.2f} GiB (now {used:.2f}, limit {limit:.2f})",
                category="memory",
            )
        except Exception:
            pass
        try:
            rss_kb = 0
            with open("/proc/self/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS:"):
                        rss_kb = int(line.split()[1])
                        break
            if rss_kb:
                self.log(f"Host RSS: {rss_kb / 1024**2:.2f} GiB", category="memory")
        except Exception:
            pass

    def tensor_census(self, top: int = 10) -> list:
        """gc-walk of live device arrays grouped by (shape, dtype) — the
        TPU analog of the reference's torch tensor census (reference:
        debug.py:389-520). Returns [(bytes, count, shape, dtype)] and logs
        the ``top`` largest groups when debug is enabled."""
        import gc

        try:
            import jax
        except Exception:
            return []
        groups: Dict[tuple, list] = {}
        for obj in gc.get_objects():
            try:
                if isinstance(obj, jax.Array) and not isinstance(
                    obj, jax.core.Tracer
                ):
                    key = (tuple(obj.shape), str(obj.dtype))
                    nbytes = obj.size * obj.dtype.itemsize
                    g = groups.setdefault(key, [0, 0])
                    g[0] += nbytes
                    g[1] += 1
            except Exception:
                continue
        rows = sorted(
            ((b, n, shape, dt) for (shape, dt), (b, n) in groups.items()),
            reverse=True,
        )
        if self.enabled and rows:
            total = sum(r[0] for r in rows)
            self.log(
                f"Live device arrays: {sum(r[1] for r in rows)} "
                f"({total / 1024**3:.2f} GiB)",
                category="memory",
            )
            for b, n, shape, dt in rows[:top]:
                self.log(
                    f"{n}x {dt}{list(shape)}: {b / 1024**3:.3f} GiB",
                    category="memory",
                    indent_level=1,
                )
        return rows

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
