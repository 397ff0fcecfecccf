"""PSNR/SSIM sanity: identity, known noise levels, monotonicity."""

import numpy as np

from seedvr2_tpu.utils.metrics import psnr, ssim, video_psnr_ssim


def test_psnr_identity_and_known():
    a = np.random.RandomState(0).rand(32, 32, 3)
    assert psnr(a, a) == float("inf")
    # uniform(-d, d) noise: mse = d^2/3 -> psnr = 10 log10(3/d^2)
    d = 0.1
    noise = np.random.RandomState(1).uniform(-d, d, a.shape)
    expected = 10 * np.log10(3.0 / d**2)
    assert abs(psnr(a, np.clip(a + noise, 0, 2)) - expected) < 0.5


def test_ssim_bounds_and_monotonic():
    rng = np.random.RandomState(2)
    a = rng.rand(48, 48, 3)
    assert ssim(a, a) > 0.9999
    small = ssim(a, np.clip(a + rng.randn(48, 48, 3) * 0.02, 0, 1))
    big = ssim(a, np.clip(a + rng.randn(48, 48, 3) * 0.2, 0, 1))
    assert 1 > small > big > 0


def test_video_metrics():
    rng = np.random.RandomState(3)
    a = rng.rand(3, 32, 32, 3)
    p, s = video_psnr_ssim(a, a)
    assert p == float("inf") and s > 0.9999
