"""Frame-parallel multi-chip generation over the "data" mesh axis.

TPU replacement for the reference's multi-GPU path — one spawned process
per GPU with CUDA_VISIBLE_DEVICES, shared-memory hand-back, and Hann
blending of segment seams (reference: inference_cli.py:1127-1288). Here all
chips live in ONE process/mesh: the video is split into per-chip frame
segments (with overlap on interior seams), segments are stacked on a
leading axis sharded over "data", and every phase executes as a single
SPMD program. Seam blending is identical math (ops/blending.py).

Feature parity with the single-chip phases: prepend_frames, RGBA alpha
re-attachment, input/latent noise, color correction — color runs inside
the sharded per-batch program (content vs resized-input reference,
reference: generation_phases.py:1299-1319) so only final frames cross the
host link.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..ops.blending import blend_overlapping_frames
from ..ops.resize import true_target_dims
from ..utils.debug import Debug
from ..utils.seed import batch_key
from . import batching
from .runner import Runner


def generate_multichip(
    runner: Runner,
    images: np.ndarray,  # [T, H, W, 3|4] float in [0, 1]
    mesh: jax.sharding.Mesh,
    seam_overlap: int = 4,
    debug: Optional[Debug] = None,
    progress_callback=None,
    interrupt_fn=None,
) -> np.ndarray:
    """Upscale `images` using all devices on the mesh's "data" axis.

    Segments are padded to a common 4n+1 length so every chip runs the same
    program; padding frames are reversed-frame extensions (the reference's
    pad_video_temporal) and trimmed before seam blending.

    ``interrupt_fn`` is checked before every per-spec SPMD dispatch;
    ``progress_callback`` receives the same weighted-phase protocol as the
    fused streaming path (phases 1-2 reported complete up front, 3 advances
    per spec — one program covers all phases)."""
    cfg = runner.cfg
    debug = debug or Debug()
    n = mesh.shape["data"]
    total0 = len(images)
    if n == 1 or total0 < 2 * n:
        from . import phases

        if n > 1:
            debug.log(
                f"multichip: {total0} frames < 2 per chip on data={n}; "
                "falling back to the single-program pipeline (tile-parallel "
                "VAE still uses the mesh)",
                category="generation", force=True,
            )
        return phases.generate(
            runner, images, cfg, debug,
            progress_callback=progress_callback, interrupt_fn=interrupt_fn,
        )

    if cfg.prepend_frames > 0:
        images = batching.pad_temporal_reversed(images, cfg.prepend_frames, prepend=True)
    total = len(images)
    is_rgba = images.shape[-1] == 4
    alpha_in = images[..., 3:] if is_rgba else None
    rgb_in = images[..., :3]

    shard = NamedSharding(mesh, P("data"))
    ranges = batching.split_frame_ranges(total, n, seam_overlap)
    seg_frames = [rgb_in[s:e] for s, e in ranges]
    seg_lens = [len(f) for f in seg_frames]
    # Common segment length (4n+1) so all chips share one executable.
    target_len = batching.frames_to_4n1(max(seg_lens))
    segs = np.stack(
        [batching.pad_temporal_reversed(f, target_len - len(f)) for f in seg_frames]
    )  # [n, target_len, H, W, 3]

    # Per-segment batching (identical spec across segments by construction).
    specs = batching.compute_batches(target_len, cfg.batch_size, 0, uniform_batch_size=True)
    true_h, true_w = true_target_dims(images.shape[1], images.shape[2], cfg.resolution, cfg.max_resolution)

    key_noise = batch_key(cfg.seed, "input_noise")
    out_segs = np.zeros((n, target_len, true_h, true_w, 3), np.float32)
    write_idx = 0
    if progress_callback:
        # One SPMD program covers all four phases per spec; report like the
        # fused streaming path so weighted consumers stay monotonic.
        progress_callback(1, 1, 0, "Phase 1: Encoding")
        progress_callback(1, 1, 0, "Phase 2: Upscaling")
    for si, spec in enumerate(specs):
        if interrupt_fn is not None:
            interrupt_fn()
        batch = np.stack([batching.prepare_batch(segs[i], spec) for i in range(n)])
        # [n, T', H, W, 3] u8/f16 sharded over data -> whole per-spec chain
        # as ONE SPMD program (transform/noise/encode/DiT/decode/color/u16 —
        # Runner.fused_segments); only uint16 frames come back.
        from .phases import _upload_frames

        fr16 = jax.device_put(_upload_frames(batch), shard)
        key_noise, sub = jax.random.split(key_noise)
        t_real = spec.ori_length
        u16 = runner.fused_segments(fr16, t_real, true_h, true_w, sub, cfg.seed)
        from .runner import unpack_frames

        out_segs[:, write_idx : write_idx + t_real] = unpack_frames(
            jax.device_get(u16)
        )[:, :t_real]
        write_idx += t_real
        if progress_callback:
            progress_callback(si + 1, len(specs), t_real * n, "Phase 3: Decoding")
    if write_idx < target_len - (cfg.batch_size - 1):
        raise RuntimeError(
            f"multichip batching drift: wrote {write_idx} of {target_len} frames "
            f"(batch_size={cfg.batch_size}, specs={len(specs)}); this is a bug in "
            "compute_batches/uniform padding, please report"
        )

    # Assemble segments, blending the seam overlaps
    # (reference: inference_cli.py:1242-1277). Segments arrive in [0,1]
    # (u16-packed on device); Hann blending is affine-invariant so blending
    # here is identical to blending [-1,1] and renormalizing after.
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

    if is_rgba:
        from .alpha import upscale_alpha_batch

        out_alpha = np.zeros((total, true_h, true_w, 1), np.float32)
        for s0 in range(0, total, cfg.batch_size):
            e0 = min(s0 + cfg.batch_size, total)
            out_alpha[s0:e0, :, :, 0] = upscale_alpha_batch(
                alpha_in[s0:e0], final[s0:e0]
            )
        final = np.concatenate([final, out_alpha], axis=-1)

    if cfg.prepend_frames > 0:
        final = final[cfg.prepend_frames :]
    if progress_callback:
        progress_callback(1, 1, 0, "Phase 4: Post-processing")
    return final
