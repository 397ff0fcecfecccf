"""VAE correctness: shapes, causal streaming equivalence (the reference's
MemoryState machine — SURVEY.md §7 hard part 1), tiling blend behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.config import vae_tiny
from seedvr2_tpu.models.vae.causal_conv import StreamCtx, causal_conv3d
from seedvr2_tpu.models.vae.model import (
    decoder_forward,
    encoder_forward,
    init_vae_params,
    posterior_mode,
)
from seedvr2_tpu.models.vae import tiling

CFG = vae_tiny()


@pytest.fixture(scope="module")
def params():
    return init_vae_params(CFG, jax.random.PRNGKey(0))


def test_encoder_shapes(params):
    x = jnp.zeros((1, 13, 32, 32, 3))
    m = encoder_forward(params, CFG, x)
    # 13 = 4*3+1 -> 4 latent frames; 32/8 = 4 spatial
    assert m.shape == (1, 4, 4, 4, 2 * CFG.latent_channels)


def test_single_frame(params):
    x = jnp.zeros((1, 1, 32, 32, 3))
    m = encoder_forward(params, CFG, x)
    assert m.shape == (1, 1, 4, 4, 2 * CFG.latent_channels)
    y = decoder_forward(params, CFG, posterior_mode(m))
    assert y.shape == (1, 1, 32, 32, 3)


def test_decoder_shapes(params):
    z = jnp.zeros((1, 4, 4, 4, CFG.latent_channels))
    y = decoder_forward(params, CFG, z)
    assert y.shape == (1, 13, 32, 32, 3)


def test_causal_conv_streaming_matches_full():
    """Streaming a stride-1 causal conv slice-by-slice == one-shot."""
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (3, 3, 3, 4, 8)) * 0.1
    p = {"w": w, "b": jnp.zeros((8,))}
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 8, 8, 4))

    full = causal_conv3d(p, x, StreamCtx("disabled"), "c")

    ctx1 = StreamCtx("init")
    y1 = causal_conv3d(p, x[:, :5], ctx1, "c")
    ctx2 = StreamCtx("active", ctx1.out_state)
    y2 = causal_conv3d(p, x[:, 5:], ctx2, "c")
    np.testing.assert_allclose(np.concatenate([y1, y2], axis=1), full, atol=1e-5)


def test_causal_conv_strided_streaming():
    """Temporal stride-2 downsampling conv streams identically (the
    reference's 4n+1 slice algebra)."""
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 1, 1, 2, 2)) * 0.3
    p = {"w": w, "b": jnp.zeros((2,))}
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 13, 2, 2, 2))
    kw = dict(stride=(2, 1, 1), spatial_pad=((0, 0), (0, 0)), temporal_pad=1)

    full = causal_conv3d(p, x, StreamCtx("disabled"), "c", **kw)
    outs = []
    state = {}
    for i, (s, e) in enumerate([(0, 5), (5, 9), (9, 13)]):
        ctx = StreamCtx("init" if i == 0 else "active", state)
        outs.append(causal_conv3d(p, x[:, s:e], ctx, "c", **kw))
        state = ctx.out_state
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full, atol=1e-5)


def test_encode_slicing_matches_full(params):
    """slicing_encode (1+4,4,4) == single full pass — exact streaming parity
    (reference: attn_video_vae.py:1254-1276). Both sides jitted so the only
    difference is the streaming state machine."""
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 13, 16, 16, 3))
    full = tiling._encode_slice(params, CFG, x, {}, "disabled")[0]
    sliced = tiling.slicing_encode(params, CFG, x)
    np.testing.assert_allclose(sliced, full, atol=2e-5)


def test_decode_slicing_matches_full(params):
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 4, 4, CFG.latent_channels))
    full = tiling._decode_slice(params, CFG, z, {}, "disabled")[0]
    sliced = tiling.slicing_decode(params, CFG, z)
    np.testing.assert_allclose(sliced, full, atol=2e-5)


def test_tiled_decode_shape_and_blend(params):
    """Tiled decode: correct shape, finite, and no hard seam (neighbouring
    pixels across a tile boundary stay continuous thanks to the cosine-ramp
    blending). Exact equality with untiled decode is NOT expected — tiles
    lack cross-tile receptive field, same as the reference."""
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 8, 8, CFG.latent_channels)) * 0.5
    full = tiling.vae_decode(params, CFG, z)
    tiled = tiling.vae_decode(
        params, CFG, z, tiled=True, tile_size=(32, 32), tile_overlap=(8, 8)
    )
    assert tiled.shape == full.shape
    t = np.asarray(tiled)
    assert np.isfinite(t).all()
    # seam at pixel 32 (tile boundary): jump across the seam should be of
    # the same order as typical neighbour jumps, not an outlier
    seam_jump = np.abs(t[:, :, 32, :] - t[:, :, 31, :]).mean()
    typical_jump = np.abs(np.diff(t, axis=2)).mean()
    assert seam_jump < 10 * typical_jump + 1e-3


def test_zero_overlap_outgrown_axis_gets_blended(params):
    """A zero-overlap axis that still needs >1 tile must fall back to a
    blended overlap instead of leaving a hard seam — the 1080p full-height
    column config (tile 1088 rows, row overlap 0) applied to a 4K-tall clip
    put two tile-rows edge-to-edge with no ramp (round-4 regression fix).
    With the fallback, the row seam blends exactly like the column seams."""
    z = jax.random.normal(jax.random.PRNGKey(13), (1, 2, 8, 8, CFG.latent_channels)) * 0.5
    # tile covers full width (64px >= 64) but only half the height, with
    # zero row overlap: before the fix this produced an unblended seam at
    # pixel row 32
    tiled = tiling.vae_decode(
        params, CFG, z, tiled=True, tile_size=(32, 64), tile_overlap=(0, 16)
    )
    t = np.asarray(tiled)
    assert np.isfinite(t).all()
    seam_jump = np.abs(t[:, :, 32, :] - t[:, :, 31, :]).mean()
    typical_jump = np.abs(np.diff(t, axis=2)).mean()
    assert seam_jump < 10 * typical_jump + 1e-3
    # and the blended grid must match the explicitly-blended config exactly
    # (the fallback restores the default 128px overlap; at this tiny scale
    # that clamps to the same grid as any >=tile-size overlap request)
    explicit = tiling.vae_decode(
        params, CFG, z, tiled=True, tile_size=(32, 64), tile_overlap=(128, 16)
    )
    np.testing.assert_allclose(t, np.asarray(explicit), atol=2e-5)
    # encode path: same rule
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 5, 64, 32, 3))
    lat0 = tiling.vae_encode(
        params, CFG, x, tiled=True, tile_size=(32, 32), tile_overlap=(0, 8)
    )
    lat1 = tiling.vae_encode(
        params, CFG, x, tiled=True, tile_size=(32, 32), tile_overlap=(128, 8)
    )
    np.testing.assert_allclose(np.asarray(lat0), np.asarray(lat1), atol=2e-5)


def test_staged_decode_matches_device_tiled(params):
    """Host-staged tile accumulation (the decode OOM ladder's last rung,
    tiling.tiled_decode_staged) must reproduce the device-side tiled decode:
    same grid, same ramps, accumulation in host fp32 instead of HBM."""
    z = jax.random.normal(jax.random.PRNGKey(11), (1, 2, 8, 8, CFG.latent_channels)) * 0.5
    dev = tiling.tiled_decode(params, CFG, z, tile_size=(32, 32), tile_overlap=(8, 8))
    host = tiling.tiled_decode_staged(params, CFG, z, tile_size=(32, 32), tile_overlap=(8, 8))
    assert host.dtype == np.float32
    np.testing.assert_allclose(host, np.asarray(dev, np.float32), atol=2e-5, rtol=1e-5)


def test_tiled_encode_shape(params):
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 5, 64, 64, 3))
    lat = tiling.vae_encode(params, CFG, x, tiled=True, tile_size=(32, 32), tile_overlap=(8, 8))
    assert lat.shape == (1, 2, 8, 8, CFG.latent_channels)


def test_tiled_batched_samples_match_per_sample(params):
    """B>1 rides inside each scan step (so a data-sharded segment batch
    keeps all chips busy on the same tile group); numerics must equal the
    per-sample run."""
    z = jax.random.normal(jax.random.PRNGKey(17), (2, 2, 16, 16, CFG.latent_channels))
    both = tiling.vae_decode(params, CFG, z, tiled=True, tile_size=(64, 64), tile_overlap=(16, 16))
    for i in range(2):
        one = tiling.vae_decode(
            params, CFG, z[i : i + 1], tiled=True, tile_size=(64, 64), tile_overlap=(16, 16)
        )
        np.testing.assert_allclose(np.asarray(both[i]), np.asarray(one[0]), atol=1e-5)
    x = jax.random.normal(jax.random.PRNGKey(19), (2, 5, 64, 64, 3))
    enc_both = tiling.vae_encode(params, CFG, x, tiled=True, tile_size=(32, 32), tile_overlap=(8, 8))
    for i in range(2):
        enc_one = tiling.vae_encode(
            params, CFG, x[i : i + 1], tiled=True, tile_size=(32, 32), tile_overlap=(8, 8)
        )
        np.testing.assert_allclose(np.asarray(enc_both[i]), np.asarray(enc_one[0]), atol=1e-5)


def test_tiled_encode_non_divisible_input(params):
    """Public-API call with H/W not multiples of the spatial factor: tiles
    are edge-padded to the latent grid extent instead of going ragged."""
    x = jax.random.normal(jax.random.PRNGKey(18), (1, 5, 61, 51, 3))
    lat = tiling.vae_encode(params, CFG, x, tiled=True, tile_size=(32, 32), tile_overlap=(8, 8))
    sf = CFG.spatial_downsample_factor
    assert lat.shape == (1, 2, -(-61 // sf), -(-51 // sf), CFG.latent_channels)
    assert np.isfinite(np.asarray(lat)).all()


def test_vae_scaling(params):
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 1, 32, 32, 3))
    m = encoder_forward(params, CFG, x)
    lat = tiling.vae_encode(params, CFG, x)
    np.testing.assert_allclose(
        lat, (posterior_mode(m) - CFG.shifting_factor) * CFG.scaling_factor, atol=1e-6
    )


def test_axis_weights_never_vanish():
    """Seam columns must keep strictly positive total blend weight even when
    _axis_grid's independent rounding gives one seam overlap-1 actual overlap
    (ADVICE r2: endpoint-zero ramps could leave a ~0-weight column -> dark
    seam line after acc/max(cnt, eps)). The fix clamps the ramp LENGTH to the
    smallest actual seam overlap (_seam_ramp) while keeping the reference's
    exact 0..1 cosine endpoints (parity: test_vae_tiled_encode_parity)."""
    from seedvr2_tpu.models.vae.tiling import _axis_grid, _edge_weights, _seam_ramp

    for total, tile_max, ov in [
        (136, 64, 2),   # user 16px overlap at sf=8 -> latent overlap 2
        (135, 64, 2),
        (240, 128, 16),
        (97, 33, 1),
        (301, 100, 4),
        (240, 128, 2),
    ]:
        tile, starts = _axis_grid(total, tile_max, ov)
        ramp = _seam_ramp(tile, starts, ov)
        acc = np.zeros(total, np.float64)
        for s in starts:
            w = _edge_weights(tile, ramp, s == 0, s == starts[-1])
            acc[s : s + tile] += w
        # wherever a ramp reaches zero the neighbouring tile must be at 1
        assert acc.min() >= 1.0 - 1e-6, (total, tile_max, ov, float(acc.min()))
        # aligned seams must still form a partition of unity away from ramps
        interior = acc[(acc > 0.99) & (acc < 1.01)]
        assert interior.size > total // 2


def test_tiled_decode_psnr_reported(params):
    """Exercise the PSNR/SSIM harness (utils/metrics.py — the tools
    BASELINE.json's quality contract is measured with) on the tiled-vs-full
    decode delta. With RANDOM weights tiles genuinely diverge (no trained
    spatial decay), so this asserts only harness sanity here; the
    pipeline-level quality gate lives in
    tests/test_pipeline.py::test_streamed_vs_phased_quality_gate."""
    from seedvr2_tpu.utils.metrics import video_psnr_ssim

    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.randn(1, 2, 12, 16, CFG.latent_channels).astype(np.float32) * 0.4)
    full = np.asarray(tiling.vae_decode(params, CFG, z, tiled=False))
    tiled = np.asarray(
        tiling.vae_decode(params, CFG, z, tiled=True, tile_size=(64, 64), tile_overlap=(16, 16))
    )
    a = np.clip(full * 0.5 + 0.5, 0, 1)
    b = np.clip(tiled * 0.5 + 0.5, 0, 1)
    p, s = video_psnr_ssim(a[0], b[0])
    assert np.isfinite(p) and p > 5.0, p
    assert -1.0 <= s <= 1.0, s
