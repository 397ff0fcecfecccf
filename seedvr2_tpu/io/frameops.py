"""ctypes bindings for the native frame-conversion kernels
(native/frameops.cpp), with transparent numpy fallback.

Compiled on first use with g++ -O3 into native/libframeops.so; if the
toolchain is unavailable the numpy implementations are used instead, so the
framework stays pure-Python-functional everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "frameops.cpp")
_SO = os.path.join(_NATIVE_DIR, "libframeops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.u8_to_f32_rgb.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ]
            lib.f32_to_u16.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
            lib.f32_to_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
            lib.denorm_clamp.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _build() is not None


def u8_to_f32_rgb(frame_u8: np.ndarray, swap_rb: bool = True) -> np.ndarray:
    """[H, W, 3|4] uint8 (BGR(A) when swap_rb) -> float32 RGB(A) in [0,1]."""
    lib = _build()
    frame_u8 = np.ascontiguousarray(frame_u8)
    nch = frame_u8.shape[-1]
    if lib is None:
        out = frame_u8.astype(np.float32) / 255.0
        if swap_rb:
            out[..., [0, 2]] = out[..., [2, 0]] if nch == 3 else out[..., [2, 0]]
        return out
    out = np.empty(frame_u8.shape, np.float32)
    lib.u8_to_f32_rgb(
        frame_u8.ctypes.data, out.ctypes.data, frame_u8.size // nch, nch, int(swap_rb)
    )
    return out


def f32_to_u16(frames01: np.ndarray) -> np.ndarray:
    lib = _build()
    frames01 = np.ascontiguousarray(frames01, np.float32)
    if lib is None:
        return (np.clip(frames01, 0, 1) * 65535.0 + 0.5).astype("<u2")
    out = np.empty(frames01.shape, "<u2")
    lib.f32_to_u16(frames01.ctypes.data, out.ctypes.data, frames01.size)
    return out


def f32_to_u8(frames01: np.ndarray) -> np.ndarray:
    lib = _build()
    frames01 = np.ascontiguousarray(frames01, np.float32)
    if lib is None:
        return (np.clip(frames01, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    out = np.empty(frames01.shape, np.uint8)
    lib.f32_to_u8(frames01.ctypes.data, out.ctypes.data, frames01.size)
    return out


def to_u16(frames: np.ndarray) -> np.ndarray:
    """Any pipeline output dtype -> uint16 pixels.

    Accepts float32 in [0,1] (legacy unpacked path), uint8, or uint16 —
    the packed outputs of phases.generate(packed=True) pass through with
    no float round-trip (the whole point of packed output)."""
    if frames.dtype == np.uint16:
        return frames
    if frames.dtype == np.uint8:
        return frames.astype(np.uint16) * np.uint16(257)  # 255*257 == 65535
    return f32_to_u16(frames)


def to_u8(frames: np.ndarray) -> np.ndarray:
    """Any pipeline output dtype -> uint8 pixels (see to_u16)."""
    if frames.dtype == np.uint8:
        return frames
    if frames.dtype == np.uint16:
        # round(v / 257): 257 = 65535/255, +128 rounds half-up
        return ((frames.astype(np.uint32) + 128) // 257).astype(np.uint8)
    return f32_to_u8(frames)


def denorm_clamp_(x: np.ndarray) -> np.ndarray:
    """In-place [-1,1] -> [0,1] + clamp."""
    lib = _build()
    if lib is None or not (x.flags.c_contiguous and x.dtype == np.float32):
        return np.clip(x * 0.5 + 0.5, 0.0, 1.0).astype(np.float32)
    lib.denorm_clamp(x.ctypes.data, x.size)
    return x
