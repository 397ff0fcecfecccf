"""Tile-boundary visualization (reference: generation_utils.py:666-772,
--tile_debug). Draws each VAE tile's rectangle + index on the output frames
so users can tune tile size/overlap. Pure numpy/cv2, host-side."""

from __future__ import annotations

import colorsys
import math
from typing import List, Tuple

import numpy as np


def tile_boundaries(
    height: int,
    width: int,
    tile_size: Tuple[int, int],
    tile_overlap: Tuple[int, int],
    spatial_downsample: int = 8,
) -> List[dict]:
    """Pixel-space rectangles of the uniform latent tile grid used by
    models/vae/tiling.py."""
    sf = spatial_downsample
    H_lat, W_lat = math.ceil(height / sf), math.ceil(width / sf)
    lt_h, lt_w = max(1, tile_size[0] // sf), max(1, tile_size[1] // sf)
    lo_h = max(0, min(tile_overlap[0] // sf, lt_h - 1))
    lo_w = max(0, min(tile_overlap[1] // sf, lt_w - 1))
    if H_lat <= lt_h and W_lat <= lt_w:
        return []
    sh, sw = max(1, lt_h - lo_h), max(1, lt_w - lo_w)
    rows = [r * sh for r in range(max(1, math.ceil((H_lat - lo_h) / sh)))]
    cols = [c * sw for c in range(max(1, math.ceil((W_lat - lo_w) / sw)))]
    out = []
    tid = 0
    for y in rows:
        for x in cols:
            tid += 1
            out.append(
                {
                    "id": tid,
                    "x": x * sf,
                    "y": y * sf,
                    "w": min(lt_w * sf, width - x * sf),
                    "h": min(lt_h * sf, height - y * sf),
                }
            )
    return out


def draw_tile_boundaries(frames01: np.ndarray, boundaries: List[dict]) -> np.ndarray:
    """frames01: [T, H, W, C] in [0,1]. Returns annotated copy."""
    if not boundaries:
        return frames01
    import cv2

    T, H, W, C = frames01.shape
    scale = max(0.0, min(1.0, (W - 512) / (1920 - 512)))
    thickness = int(2 + scale * 4)
    font_scale = 0.8 + scale * 1.7

    colors = []
    n = len(boundaries)
    for i in range(n):
        hue = (i * 360 / n) % 360
        r, g, b = colorsys.hsv_to_rgb(hue / 360, 0.9, 0.9)
        colors.append((int(r * 255), int(g * 255), int(b * 255)))

    out = []
    for t in range(T):
        img = np.ascontiguousarray((frames01[t, :, :, :3] * 255).astype(np.uint8))
        for i, bd in enumerate(boundaries):
            x, y, w, h = bd["x"], bd["y"], bd["w"], bd["h"]
            cv2.rectangle(img, (x, y), (x + w - 1, y + h - 1), colors[i], thickness)
            cv2.putText(
                img, str(bd["id"]), (x + 8, y + 24 + int(10 * scale)),
                cv2.FONT_HERSHEY_SIMPLEX, font_scale, colors[i], 2, cv2.LINE_AA,
            )
        frame = img.astype(np.float32) / 255.0
        if C == 4:
            frame = np.concatenate([frame, frames01[t, :, :, 3:]], axis=-1)
        out.append(frame)
    return np.stack(out)
