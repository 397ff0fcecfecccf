"""Color-correction math vs independent torch re-derivations of the
reference formulas (color spaces, histogram matching, wavelet pyramid)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from seedvr2_tpu.ops import color as C


def _rand_img(shape=(2, 3, 16, 16), seed=0, lo=-1, hi=1):
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape) * (hi - lo) + lo).astype(np.float32)


def test_lab_roundtrip():
    rgb = jnp.asarray(np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32))
    lab = C.rgb_to_lab(rgb)
    back = C.lab_to_rgb(lab)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-3)


def test_lab_known_values():
    # white -> L=100, a=b=0; black -> L=0
    rgb = jnp.asarray(np.array([[[[1.0]], [[1.0]], [[1.0]]]], np.float32))
    lab = np.asarray(C.rgb_to_lab(rgb))
    np.testing.assert_allclose(lab[0, 0, 0, 0], 100.0, atol=0.1)
    np.testing.assert_allclose(lab[0, 1:, 0, 0], 0.0, atol=0.1)
    black = np.asarray(C.rgb_to_lab(jnp.zeros((1, 3, 1, 1))))
    np.testing.assert_allclose(black[0, 0], 0.0, atol=1e-3)


def test_hsv_roundtrip():
    rgb = jnp.asarray(np.random.RandomState(1).rand(1, 3, 8, 8).astype(np.float32))
    hsv = C.rgb_to_hsv(rgb)
    back = C.hsv_to_rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_histogram_match_exact_when_equal_sizes():
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(100).astype(np.float32))
    ref = jnp.asarray(rng.randn(100).astype(np.float32))
    out = np.asarray(C.histogram_match(src, ref))
    # matched output is a permutation of reference values
    np.testing.assert_allclose(np.sort(out), np.sort(np.asarray(ref)), atol=1e-6)
    # and preserves source ordering (ranks)
    assert np.array_equal(np.argsort(out), np.argsort(np.asarray(src)))


def test_masked_histogram_match_equals_ragged():
    """Fixed-shape masked matcher == the reference's ragged per-bin matcher."""
    rng = np.random.RandomState(3)
    src = rng.rand(500).astype(np.float32)
    ref = rng.rand(400).astype(np.float32)
    src_mask = rng.rand(500) > 0.3
    ref_mask = rng.rand(400) > 0.4

    ours = np.asarray(
        C.masked_histogram_match(
            jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(ref), jnp.asarray(ref_mask)
        )
    )

    # torch re-derivation of reference _histogram_match_1d on the ragged sets
    s = torch.from_numpy(src[src_mask])
    r = torch.from_numpy(ref[ref_mask])
    ss, si = torch.sort(s)
    rs, _ = torch.sort(r)
    n, m = len(ss), len(rs)
    q = torch.linspace(0, 1, n)
    # note: our masked matcher uses round() on quantile indices; the
    # reference uses trunc (.long()). For continuous data they differ by at
    # most one reference rank — compare values with a tolerance instead.
    idx = (q * (m - 1)).long().clamp(0, m - 1)
    matched_sorted = rs[idx]
    inv = torch.argsort(si)
    expected = matched_sorted[inv].numpy()

    got = ours[src_mask]
    assert np.abs(got - expected).max() < np.sort(np.asarray(r))[1:].max() * 0.05
    # unmasked positions untouched
    np.testing.assert_array_equal(ours[~src_mask], src[~src_mask])


def test_wavelet_blur_matches_torch():
    img = _rand_img((1, 3, 32, 32), seed=4, lo=0, hi=1)
    ours = np.asarray(C.wavelet_blur(jnp.asarray(img), radius=2))
    kernel = torch.tensor(
        [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]]
    )
    k = kernel[None, None].repeat(3, 1, 1, 1)
    x = F.pad(torch.from_numpy(img), (2, 2, 2, 2), mode="replicate")
    theirs = F.conv2d(x, k, groups=3, dilation=2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_wavelet_reconstruction_transfers_low_freq():
    content = jnp.asarray(_rand_img(seed=5))
    # style = content + constant color cast: output should follow the cast
    style = jnp.clip(content + 0.3, -1, 1)
    out = np.asarray(C.wavelet_reconstruction(content, style))
    assert np.abs(out.mean() - np.asarray(style).mean()) < 0.05


def test_adain_stats_transfer():
    content = jnp.asarray(_rand_img(seed=6))
    style = jnp.asarray(_rand_img(seed=7) * 0.5 + 0.2)
    out = np.asarray(C.adaptive_instance_normalization(content, style))
    s = np.asarray(style)
    np.testing.assert_allclose(
        out.reshape(2, 3, -1).mean(-1), s.reshape(2, 3, -1).mean(-1), atol=1e-3
    )
    np.testing.assert_allclose(
        out.reshape(2, 3, -1).std(-1), s.reshape(2, 3, -1).std(-1), atol=1e-2
    )


def test_all_methods_run_and_bounded():
    content = jnp.asarray(_rand_img(seed=8))
    style = jnp.asarray(_rand_img(seed=9))
    for method in ("wavelet", "lab", "hsv", "wavelet_adaptive", "adain", "none"):
        out = np.asarray(C.apply_color_correction(method, content, style))
        assert out.shape == content.shape
        assert np.isfinite(out).all()
        if method != "adain":  # adain can exceed range slightly (as in ref)
            assert out.min() >= -1.001 and out.max() <= 1.001
