"""The tile-debug overlay must draw the grid tiling.py actually runs
(reference: generation_utils.py:666-772 draws its real tile rects too)."""

import numpy as np

from seedvr2_tpu.config import vae_config
from seedvr2_tpu.models.vae.tiling import _axis_grid
from seedvr2_tpu.utils.tile_debug import draw_for_config, tile_boundaries


def test_boundaries_match_equalized_grid():
    # 1080p decode at the 1024/128 defaults: 2x2 equalized grid.
    H, W, sf = 1088, 1920, 8
    bounds = tile_boundaries(H, W, (1024, 1024), (128, 128), sf)
    lt_h, rows = _axis_grid(H // sf, 1024 // sf, 128 // sf)
    lt_w, cols = _axis_grid(W // sf, 1024 // sf, 128 // sf)
    expect = [
        (y * sf, x * sf, lt_h * sf, lt_w * sf) for y in rows for x in cols
    ]
    got = [(b["y"], b["x"], b["h"], b["w"]) for b in bounds]
    assert got == expect
    # tiles must cover the full frame
    assert max(b["y"] + b["h"] for b in bounds) == H
    assert max(b["x"] + b["w"] for b in bounds) == W


def test_boundaries_empty_when_untiled():
    assert tile_boundaries(512, 512, (1024, 1024), (128, 128), 8) == []


def test_draw_for_config_annotates():
    import dataclasses

    from seedvr2_tpu.config import PipelineConfig

    cfg = PipelineConfig(
        vae=vae_config(),
        decode_tiled=True,
        decode_tile_size=(1024, 1024),
        decode_tile_overlap=(128, 128),
    )
    frames = np.zeros((2, 1088, 1920, 3), np.float32)
    out = draw_for_config(frames, cfg, "decode")
    assert out.shape == frames.shape
    assert out.max() > 0  # rectangles were drawn
    # encode not tiled -> untouched
    out2 = draw_for_config(frames, cfg, "encode")
    assert out2 is frames
