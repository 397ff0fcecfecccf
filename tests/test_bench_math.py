"""The bench's derived-baseline math: exact VAE FLOP counter sanity.

The round-3 heuristic counter credited the whole VAE with 150 TFLOP; the
architecture-walk counter gives ~455 TFLOP for the reference's own ragged
512/64 tiling of the bench workload — validated against measured in-situ
stage times (per-tile decode 138 TFLOP ran in 1.185s = 116 TFLOP/s on one
v5e, docs/PERFORMANCE.md round-4)."""

import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench


def test_decode_body_flops_spot():
    # one decode tile at the bench grid: latent [2, 136, 128] -> 1088x1024 px
    d = bench._decode_body_flops(2, 136, 128)
    assert 1.25e14 < d < 1.5e14, d  # ~138 TFLOP (hand-derived per stage)


def test_encode_body_flops_spot():
    e = bench._encode_body_flops(5, 1088, 1024)
    assert 4.5e13 < e < 6.5e13, e  # ~55 TFLOP


def test_ref_vae_flops_structure():
    enc, dec = bench.ref_vae_flops(5, 1088, 1920)
    assert dec > 2 * enc  # decoder dominates (3 resnets/up + upsample convs)
    # ragged 512/64 tiling redundancy keeps totals above the untiled body
    assert dec > bench._decode_body_flops(2, 136, 240)
    # scaling: 4x the pixels ~= 4x the FLOPs (within tiling granularity)
    enc2, dec2 = bench.ref_vae_flops(5, 2176, 3840)
    assert 3.0 < dec2 / dec < 5.0
    assert 3.0 < enc2 / enc < 5.0


def test_ref_fps_sane():
    f4090, fh100, deriv = bench.ref_fps_estimate(
        None, 5, 1088, 1920, 2 * (1088 // 16) * (1920 // 16)
    )
    assert 0.3 < f4090 < 1.2, f4090
    assert fh100 > f4090  # H100 is the stricter denominator
    assert deriv["vae_flops"] > 3e14
