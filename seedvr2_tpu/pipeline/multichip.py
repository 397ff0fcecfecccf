"""Frame-parallel multi-chip generation over the "data" mesh axis.

TPU replacement for the reference's multi-GPU path — one spawned process
per GPU with CUDA_VISIBLE_DEVICES, shared-memory hand-back, and Hann
blending of segment seams (reference: inference_cli.py:1127-1288). Here all
chips live in ONE process/mesh: the video is split into per-chip frame
segments (with overlap on interior seams), segments are stacked on a
leading axis sharded over "data", and every phase executes as a single
SPMD program. Seam blending is identical math (ops/blending.py).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..ops import color as color_ops
from ..ops.blending import blend_overlapping_frames
from ..ops.resize import pipeline_transform, true_target_dims
from ..utils.debug import Debug
from . import batching
from .runner import Runner


def generate_multichip(
    runner: Runner,
    images: np.ndarray,  # [T, H, W, 3]
    mesh: jax.sharding.Mesh,
    seam_overlap: int = 4,
    debug: Optional[Debug] = None,
) -> np.ndarray:
    """Upscale `images` using all devices on the mesh's "data" axis.

    Segments are padded to a common 4n+1 length so every chip runs the same
    program; padding frames are reversed-frame extensions (the reference's
    pad_video_temporal) and trimmed before seam blending.
    """
    cfg = runner.cfg
    debug = debug or Debug()
    n = mesh.shape["data"]
    total = len(images)
    if n == 1 or total < 2 * n:
        from . import phases

        return phases.generate(runner, images, cfg, debug)

    shard = NamedSharding(mesh, P("data"))
    ranges = batching.split_frame_ranges(total, n, seam_overlap)
    seg_frames = [images[s:e] for s, e in ranges]
    seg_lens = [len(f) for f in seg_frames]
    # Common segment length (4n+1) so all chips share one executable.
    target_len = batching.frames_to_4n1(max(seg_lens))
    segs = np.stack(
        [batching.pad_temporal_reversed(f, target_len - len(f)) for f in seg_frames]
    )  # [n, target_len, H, W, 3]

    # Per-segment batching (identical spec across segments by construction).
    specs = batching.compute_batches(target_len, cfg.batch_size, 0, uniform_batch_size=True)
    true_h, true_w = true_target_dims(images.shape[1], images.shape[2], cfg.resolution, cfg.max_resolution)

    out_segs = np.zeros((n, target_len, true_h, true_w, 3), np.float32)
    write_idx = 0
    for spec in specs:
        batch = np.stack([batching.prepare_batch(segs[i], spec) for i in range(n)])
        # [n, T', H, W, 3] -> transform on device, sharded over data.
        tv = jax.device_put(jnp.asarray(batch), shard)
        tv = jax.vmap(lambda v: pipeline_transform(v, cfg.resolution, cfg.max_resolution))(tv)
        tv = tv.astype(jnp.dtype(cfg.compute_dtype))

        latent = runner.vae_encode(tv)  # [n, t, h, w, C]
        up = runner.upscale(latent, cfg.seed)
        dec = runner.vae_decode(up)  # [n, T', H', W', 3]
        dec = np.asarray(jax.device_get(dec), np.float32)

        t_real = spec.ori_length
        out_segs[:, write_idx : write_idx + t_real] = dec[:, :t_real, :true_h, :true_w]
        write_idx += t_real
    assert write_idx >= target_len - (cfg.batch_size - 1)

    # Color correction per segment against its own resized input.
    if cfg.color_correction != "none":
        for i in range(n):
            ref = pipeline_transform(jnp.asarray(segs[i]), cfg.resolution, cfg.max_resolution)
            ref = np.asarray(ref, np.float32)[:, :true_h, :true_w]
            content = jnp.asarray(out_segs[i].transpose(0, 3, 1, 2))
            style = jnp.asarray(ref.transpose(0, 3, 1, 2))
            fixed = color_ops.apply_color_correction(cfg.color_correction, content, style)
            out_segs[i] = np.asarray(jax.device_get(fixed)).transpose(0, 2, 3, 1)

    # Assemble segments, blending the seam overlaps
    # (reference: inference_cli.py:1242-1277).
    final = np.zeros((total, true_h, true_w, 3), np.float32)
    pos = 0
    for i, (s, e) in enumerate(ranges):
        seg = out_segs[i, : seg_lens[i]]
        if i == 0:
            final[s:e] = seg
            pos = e
        else:
            ov = pos - s
            if ov > 0:
                blended = blend_overlapping_frames(
                    jnp.asarray(final[s : s + ov]), jnp.asarray(seg[:ov]), ov
                )
                final[s : s + ov] = np.asarray(blended)
                final[s + ov : e] = seg[ov:]
            else:
                final[s:e] = seg
            pos = e
    return np.clip(final / 2.0 + 0.5, 0.0, 1.0)
