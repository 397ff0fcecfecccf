#!/usr/bin/env python3
"""HD video upscale — equivalent of the reference's HD video example
workflow (3B, 720p->1080p, batch 5, wavelet color fix)."""

import sys

from seedvr2_tpu.config import pipeline_3b
from seedvr2_tpu.io import video as vio
from seedvr2_tpu.pipeline import phases
from seedvr2_tpu.pipeline.loader import load_runner

cfg = pipeline_3b(resolution=1080, batch_size=5, color_correction="wavelet",
                  encode_tiled=True, decode_tiled=True)
runner = load_runner("seedvr2_ema_3b_fp16.safetensors", model_dir="./models", cfg=cfg)

reader = vio.VideoReader(sys.argv[1])
out_path = sys.argv[1].rsplit(".", 1)[0] + "_upscaled.mp4"
writer = None
for chunk in reader.chunks(125):
    out = phases.generate(runner, chunk)
    if writer is None:
        writer = vio.make_video_writer(out_path, out.shape[2], out.shape[1], reader.fps)
    writer.write(out[..., :3])
writer.close()
reader.close()
print("saved", out_path)
