"""Native frame-conversion kernels vs numpy reference."""

import numpy as np
import pytest

from seedvr2_tpu.io import frameops as F


def test_native_builds():
    assert F.available(), "g++ build of native/frameops.cpp failed"


def test_u8_to_f32():
    rng = np.random.RandomState(0)
    bgr = rng.randint(0, 256, (16, 16, 3), np.uint8)
    out = F.u8_to_f32_rgb(bgr, swap_rb=True)
    exp = bgr[..., ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(out, exp, atol=1e-7)
    rgba = rng.randint(0, 256, (8, 8, 4), np.uint8)
    out = F.u8_to_f32_rgb(rgba, swap_rb=False)
    np.testing.assert_allclose(out, rgba.astype(np.float32) / 255.0, atol=1e-7)


def test_f32_to_u16_u8():
    rng = np.random.RandomState(1)
    x = (rng.rand(32, 32, 3).astype(np.float32) * 1.2 - 0.1)  # incl. out-of-range
    u16 = F.f32_to_u16(x)
    exp16 = (np.clip(x, 0, 1) * 65535.0 + 0.5).astype(np.uint32).clip(0, 65535).astype("<u2")
    np.testing.assert_array_equal(u16, exp16)
    u8 = F.f32_to_u8(x)
    exp8 = (np.clip(x, 0, 1) * 255.0 + 0.5).astype(np.uint32).clip(0, 255).astype(np.uint8)
    np.testing.assert_array_equal(u8, exp8)


def test_denorm_clamp():
    x = np.array([-1.5, -1.0, 0.0, 1.0, 2.0], np.float32)
    out = F.denorm_clamp_(x.copy())
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-7)


def test_to_u16_to_u8_dispatch():
    """Packed passthrough + exact integer rescale between bit depths."""
    import numpy as np

    from seedvr2_tpu.io import frameops as fo

    u16 = np.array([[0, 257, 65535, 32896]], np.uint16)
    u8 = np.array([[0, 1, 255, 128]], np.uint8)
    f32 = u16.astype(np.float32) / 65535.0

    assert fo.to_u16(u16) is u16
    assert fo.to_u8(u8) is u8
    np.testing.assert_array_equal(fo.to_u16(u8), u8.astype(np.uint16) * 257)
    np.testing.assert_array_equal(fo.to_u8(u16), u8)  # round(v/257)
    np.testing.assert_array_equal(fo.to_u16(f32), u16)
    # u16 -> u8 rounding: 385 = 1.498*257 -> 1; 386 -> 2
    np.testing.assert_array_equal(
        fo.to_u8(np.array([385, 386], np.uint16)), np.array([1, 2], np.uint8)
    )
