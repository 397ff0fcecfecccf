"""Color-fidelity post-processing, fully on-device (jit-compatible).

The five correction methods of the reference (reference:
src/utils/color_fix.py): wavelet, lab, hsv, wavelet_adaptive, adain.
All math runs in float32 ("fp32 island"), inputs/outputs are [-1, 1]
channels-first [B, C, H, W] video batches like the reference.

TPU notes: the reference's per-hue-bin histogram matching extracts ragged
pixel sets with boolean indexing; here each bin is matched with a fixed-size
masked sort (invalid lanes pushed to +inf) so the whole postprocess phase is
one compiled program instead of a CPU round-trip.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ----------------------------- wavelet ------------------------------------- #

_WAVELET_KERNEL = np.array(
    [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]], np.float32
)


def wavelet_blur(image: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Dilated 3x3 Gaussian-ish depthwise blur with replicate padding
    (reference: color_fix.py:122-157). image: [B, C, H, W] float32."""
    B, C, H, W = image.shape
    max_safe = max(1, min(H, W) // 8)
    radius = min(radius, max_safe)
    x = jnp.pad(image, ((0, 0), (0, 0), (radius, radius), (radius, radius)), mode="edge")
    k = jnp.asarray(_WAVELET_KERNEL).reshape(3, 3, 1, 1)
    k = jnp.tile(k, (1, 1, 1, C))  # HWIO with feature groups
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=C,
    )


def wavelet_decomposition(image: jnp.ndarray, levels: int = 5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    high = jnp.zeros_like(image)
    for i in range(levels):
        low = wavelet_blur(image, 2**i)
        high = high + image - low
        image = low
    return high, image


def wavelet_reconstruction(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """Content high-freq + style low-freq, clamped to [-1, 1]
    (reference: color_fix.py:187-246)."""
    c32 = content.astype(jnp.float32)
    s32 = style.astype(jnp.float32)
    c_high, _ = wavelet_decomposition(c32)
    _, s_low = wavelet_decomposition(s32)
    return jnp.clip(c_high + s_low, -1.0, 1.0).astype(content.dtype)


# ------------------------------- adain ------------------------------------- #


def adaptive_instance_normalization(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """Channel mean/std transfer (reference: color_fix.py:72-119). Note the
    reference computes std with Bessel correction (torch var default)."""
    c = content.astype(jnp.float32)
    s = style.astype(jnp.float32)
    B, C = c.shape[:2]
    eps = 1e-5

    def stats(x):
        v = x.reshape(B, C, -1)
        n = v.shape[-1]
        mean = jnp.mean(v, axis=-1)
        var = jnp.var(v, axis=-1) * (n / max(n - 1, 1)) + eps
        return mean[:, :, None, None], jnp.sqrt(var)[:, :, None, None]

    cm, cs = stats(c)
    sm, ss = stats(s)
    out = (c - cm) / cs * ss + sm
    return out.astype(content.dtype)


# --------------------------- color space math ------------------------------ #

_RGB2XYZ = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    np.float32,
)
_XYZ2RGB = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    np.float32,
)
_EPS_LAB = 6.0 / 29.0
_KAPPA = (29.0 / 3.0) ** 3


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] in [0,1] -> LAB (reference: color_fix.py:368-413)."""
    linear = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    xyz = jnp.einsum("ij,bjhw->bihw", jnp.asarray(_RGB2XYZ), linear)
    xyz = xyz / jnp.asarray([0.95047, 1.0, 1.08883], np.float32)[None, :, None, None]
    f = jnp.where(xyz > _EPS_LAB**3, jnp.cbrt(xyz), (xyz * _KAPPA + 16.0) / 116.0)
    L = f[:, 1] * 116.0 - 16.0
    a = (f[:, 0] - f[:, 1]) * 500.0
    b = (f[:, 1] - f[:, 2]) * 200.0
    return jnp.stack([L, a, b], axis=1)


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """Reference: color_fix.py:416-474."""
    L, a, b = lab[:, 0], lab[:, 1], lab[:, 2]
    fy = (L + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = fy - b / 200.0

    def finv(f):
        return jnp.where(f > _EPS_LAB, f**3, (f * 116.0 - 16.0) / _KAPPA)

    xyz = jnp.stack([finv(fx), finv(fy), finv(fz)], axis=1)
    xyz = xyz * jnp.asarray([0.95047, 1.0, 1.08883], np.float32)[None, :, None, None]
    lin = jnp.einsum("ij,bjhw->bihw", jnp.asarray(_XYZ2RGB), xyz)
    rgb = jnp.where(
        lin > 0.0031308,
        jnp.clip(lin, 0.0) ** (1.0 / 2.4) * 1.055 - 0.055,
        lin * 12.92,
    )
    return jnp.clip(rgb, 0.0, 1.0)


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] in [0,1] -> HSV, hue in [0,1)
    (reference: color_fix.py:614-649)."""
    r, g, b = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    maxc = jnp.max(rgb, axis=1)
    minc = jnp.min(rgb, axis=1)
    rng = maxc - minc
    safe = jnp.where(rng > 1e-10, rng, 1.0)
    h = jnp.zeros_like(maxc)
    h = jnp.where((maxc == r) & (rng > 1e-10), ((g - b) / safe) % 6.0, h)
    h = jnp.where((maxc == g) & (rng > 1e-10), (b - r) / safe + 2.0, h)
    h = jnp.where((maxc == b) & (rng > 1e-10), (r - g) / safe + 4.0, h)
    h = h / 6.0
    s = jnp.where(maxc > 1e-10, rng / jnp.clip(maxc, 1e-10), 0.0)
    return jnp.stack([h, s, maxc], axis=1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Reference: color_fix.py:652-695."""
    h = hsv[:, 0] * 6.0
    s = hsv[:, 1]
    v = hsv[:, 2]
    i = jnp.floor(h).astype(jnp.int32) % 6
    f = h - jnp.floor(h)
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=1)


# --------------------------- histogram matching ---------------------------- #


def histogram_match(source: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """CDF-match flattened source to reference (any shapes)
    (reference: color_fix.py:477-521). Returns source's shape."""
    shape = source.shape
    src = source.reshape(-1)
    ref = jnp.sort(reference.reshape(-1))
    n, m = src.shape[0], ref.shape[0]
    order = jnp.argsort(src)
    if n == m:
        matched_sorted = ref
    else:
        q = jnp.linspace(0.0, 1.0, n)
        idx = jnp.clip((q * (m - 1)).astype(jnp.int32), 0, m - 1)
        matched_sorted = ref[idx]
    out = jnp.zeros_like(src).at[order].set(matched_sorted)
    return out.reshape(shape)


def masked_histogram_match(
    source: jnp.ndarray,  # [N]
    src_mask: jnp.ndarray,  # [N] bool
    reference: jnp.ndarray,  # [M]
    ref_mask: jnp.ndarray,  # [M] bool
    min_pixels: int = 100,
    base: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fixed-shape masked CDF matching. Valid source values are ranked among
    themselves and mapped to the reference's masked quantiles; invalid lanes
    keep ``base`` (default: the source value). Matches the reference's ragged
    per-bin matching (color_fix.py:698-769) without dynamic shapes: quantile
    index = trunc(rank / (n-1) * (m-1)) like torch .long()."""
    if base is None:
        base = source
    n = jnp.sum(src_mask)
    m = jnp.sum(ref_mask)
    big = jnp.asarray(jnp.inf, source.dtype)

    src_sorted_vals = jnp.sort(jnp.where(src_mask, source, big))
    order = jnp.argsort(jnp.where(src_mask, source, big))
    ref_sorted = jnp.sort(jnp.where(ref_mask, reference, big))

    N = source.shape[0]
    ranks = jnp.arange(N)
    q = ranks / jnp.maximum(n - 1, 1)
    ref_idx = jnp.clip((q * (m - 1)).astype(jnp.int32), 0, jnp.maximum(m - 1, 0))
    matched_sorted = ref_sorted[ref_idx]
    # invalid ranks (>= n) keep their (inf) source value; they are never
    # scattered into valid positions below.
    matched_sorted = jnp.where(ranks < n, matched_sorted, src_sorted_vals)

    scattered = jnp.zeros_like(source).at[order].set(matched_sorted)
    enough = (n > min_pixels) & (m > min_pixels)
    return jnp.where(src_mask & enough, scattered, base)


# --------------------------- composite methods ----------------------------- #


def lab_color_transfer(
    content: jnp.ndarray, style: jnp.ndarray, luminance_weight: float = 0.8
) -> jnp.ndarray:
    """Wavelet base + LAB a*/b* histogram matching + weighted-L blend
    (reference: color_fix.py:249-365). [-1,1] in/out, [B,3,H,W]."""
    base = wavelet_reconstruction(content, style).astype(jnp.float32)
    c01 = jnp.clip((base + 1.0) * 0.5, 0.0, 1.0)
    s01 = jnp.clip((style.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    clab = rgb_to_lab(c01)
    slab = rgb_to_lab(s01)
    a = histogram_match(clab[:, 1], slab[:, 1])
    b = histogram_match(clab[:, 2], slab[:, 2])
    if luminance_weight < 1.0:
        Lm = histogram_match(clab[:, 0], slab[:, 0])
        L = clab[:, 0] * luminance_weight + Lm * (1.0 - luminance_weight)
    else:
        L = clab[:, 0]
    rgb = lab_to_rgb(jnp.stack([L, a, b], axis=1))
    return (rgb * 2.0 - 1.0).astype(content.dtype)


def hsv_saturation_match(content: jnp.ndarray, style: jnp.ndarray, num_bins: int = 12) -> jnp.ndarray:
    """Hue-conditional saturation matching (reference: color_fix.py:524-741)."""
    c01 = jnp.clip((content.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    s01 = jnp.clip((style.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    chsv = rgb_to_hsv(c01)
    shsv = rgb_to_hsv(s01)
    ch, cs, cv = chsv[:, 0].reshape(-1), chsv[:, 1].reshape(-1), chsv[:, 2]
    sh, ss = shsv[:, 0].reshape(-1), shsv[:, 1].reshape(-1)

    matched = cs
    bw = 1.0 / num_bins
    for b in range(num_bins):
        lo, hi = b * bw, (b + 1) * bw
        if b == 0:
            cm = ((ch >= 0) & (ch < hi)) | (ch >= 1.0 - bw)
            sm = ((sh >= 0) & (sh < hi)) | (sh >= 1.0 - bw)
        else:
            cm = (ch >= lo) & (ch < hi)
            sm = (sh >= lo) & (sh < hi)
        # each bin matches from the ORIGINAL saturation (the reference
        # re-extracts content_s per bin, color_fix.py:730-737 — bin 0's
        # wrap-around pixels get overwritten again by bin 11)
        matched = masked_histogram_match(cs, cm, ss, sm, base=matched)
    matched_s = matched.reshape(chsv[:, 1].shape)
    rgb = hsv_to_rgb(jnp.stack([chsv[:, 0], matched_s, cv], axis=1))
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return (rgb * 2.0 - 1.0).astype(content.dtype)


def _saturation_map(x: jnp.ndarray) -> jnp.ndarray:
    rgb = jnp.clip((x.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    maxc = jnp.max(rgb, axis=1, keepdims=True)
    minc = jnp.min(rgb, axis=1, keepdims=True)
    return jnp.where(maxc > 1e-10, (maxc - minc) / jnp.clip(maxc, 1e-10), 0.0)


def wavelet_adaptive_color_correction(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """Wavelet base + sigmoid-gated HSV correction in oversaturated regions
    (reference: color_fix.py:772-855)."""
    c32 = content.astype(jnp.float32)
    s32 = style.astype(jnp.float32)
    wav = wavelet_reconstruction(c32, s32).astype(jnp.float32)
    hsv = hsv_saturation_match(c32, s32).astype(jnp.float32)
    c_sat = _saturation_map(c32)
    s_sat = _saturation_map(s32)
    w_sat = _saturation_map(wav)
    thresh, sharp = 0.15, 5.0
    blend = jax.nn.sigmoid(sharp * (c_sat - s_sat - thresh))
    blend = blend * ((w_sat - s_sat) > (thresh * 0.5)).astype(jnp.float32)
    blend = jnp.clip(blend, 0.0, 1.0)
    out = wav * (1.0 - blend) + hsv * blend
    return out.astype(content.dtype)


def apply_color_correction(method: str, content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """Dispatch (reference: generation_phases.py:1299-1319)."""
    if method == "wavelet":
        return wavelet_reconstruction(content, style)
    if method == "lab":
        return lab_color_transfer(content, style)
    if method == "hsv":
        return hsv_saturation_match(content, style)
    if method == "wavelet_adaptive":
        return wavelet_adaptive_color_correction(content, style)
    if method == "adain":
        return adaptive_instance_normalization(content, style)
    if method == "none":
        return content
    raise ValueError(f"Unknown color correction: {method}")
