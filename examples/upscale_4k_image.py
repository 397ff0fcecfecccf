#!/usr/bin/env python3
"""4K image upscale — equivalent of the reference's
example_workflows/SeedVR2_4K_image_upscale.json (7B sharp fp16,
resolution 4096, batch 1, lab color fix, tiled VAE 1024/128)."""

import sys

import numpy as np

from seedvr2_tpu.config import pipeline_7b
from seedvr2_tpu.io import video as vio
from seedvr2_tpu.pipeline import phases
from seedvr2_tpu.pipeline.loader import load_runner

cfg = pipeline_7b(
    resolution=4096,
    batch_size=1,
    color_correction="lab",
    encode_tiled=True,
    encode_tile_size=(1024, 1024),
    encode_tile_overlap=(128, 128),
    decode_tiled=True,
    decode_tile_size=(1024, 1024),
    decode_tile_overlap=(128, 128),
)
runner = load_runner(
    dit_model="seedvr2_ema_7b_sharp_fp16.safetensors",
    model_dir="./models",
    cfg=cfg,
    quantize="int8",  # fits one 16GB chip; drop on v5p/multi-chip
)
img = vio.read_image(sys.argv[1])
out = phases.generate(runner, img[None])
vio.write_image(sys.argv[1].rsplit(".", 1)[0] + "_4k.png", out[0])
