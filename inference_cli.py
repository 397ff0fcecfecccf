#!/usr/bin/env python3
"""SeedVR2-TPU command-line upscaler.

Argv-compatible with the reference CLI (reference: inference_cli.py:
1295-1487) where the flag has a TPU meaning; CUDA-only flags (BlockSwap,
torch.compile knobs, offload devices) are accepted and ignored with a note,
so existing reference invocations keep working:

    python inference_cli.py video.mp4 --resolution 1080 --batch_size 5

Multi-chip: instead of the reference's one-process-per-GPU fan-out
(inference_cli.py:1127-1288), all local TPU chips form one mesh and batches
are sharded over the "data" axis; temporal-overlap blending is unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional

import numpy as np


def parse_arguments(argv: Optional[List[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="SeedVR2 TPU video/image upscaler")
    p.add_argument("input", type=str, help="video file, image file, or directory")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--output_format", type=str, default="video", choices=["video", "png"])
    p.add_argument("--resolution", type=int, default=1080)
    p.add_argument("--max_resolution", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=5)
    p.add_argument("--uniform_batch_size", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model_dir", type=str, default="./models")
    p.add_argument("--dit_model", type=str, default=None)
    p.add_argument("--vae_model", type=str, default="ema_vae_fp16.safetensors")
    p.add_argument("--chunk_size", type=int, default=0, help="streaming chunk frames (0 = whole video)")
    p.add_argument("--temporal_overlap", type=int, default=0)
    p.add_argument("--prepend_frames", type=int, default=0)
    p.add_argument("--skip_first_frames", type=int, default=0)
    p.add_argument("--load_cap", type=int, default=0)
    p.add_argument(
        "--color_correction",
        type=str,
        default="wavelet",
        choices=["wavelet", "lab", "hsv", "wavelet_adaptive", "adain", "none"],
    )
    p.add_argument("--input_noise_scale", type=float, default=0.0)
    p.add_argument("--latent_noise_scale", type=float, default=0.0)
    # Tile flags accept one int (square, reference-compatible:
    # inference_cli.py:1433-1441, defaults 1024/128) or two ints (h w).
    p.add_argument("--vae_encode_tiled", action="store_true")
    p.add_argument("--vae_encode_tile_size", type=int, nargs="+", default=[1024])
    p.add_argument("--vae_encode_tile_overlap", type=int, nargs="+", default=[128])
    p.add_argument("--vae_decode_tiled", action="store_true")
    p.add_argument("--vae_decode_tile_size", type=int, nargs="+", default=[1024])
    p.add_argument("--vae_decode_tile_overlap", type=int, nargs="+", default=[128])
    p.add_argument("--vae_conv_backend", type=str, default="pallas", choices=["xla", "pallas"],
                   help="Pallas 3x3x3 conv kernel for VAE convs (faster at every "
                        "measured shape; per-shape XLA fallback on compile failure)")
    p.add_argument("--attention_mode", type=str, default="fused",
                   choices=["fused", "pallas", "xla", "sdpa", "flash_attn_2", "flash_attn_3", "sageattn_2", "sageattn_3"])
    p.add_argument(
        "--output_bits", type=str, default="auto", choices=["auto", "8", "16"],
        help="device->host frame packing: 16 feeds the 10-bit x265/PNG16 "
             "pipeline losslessly; 8 halves the output transfer for 8-bit "
             "sinks; auto picks 16 for the 10-bit/PNG16 sinks and 8 for the "
             "cv2 8-bit fallback (TPU extension; the reference transfers "
             "fp32 and quantizes every sink to uint8 on host — "
             "inference_cli.py:183,590,763,809)",
    )
    p.add_argument("--debug", action="store_true")
    p.add_argument("--resume", action="store_true", help="resume an interrupted chunked run")
    p.add_argument(
        "--quantize",
        type=str,
        default="none",
        choices=["none", "int8"],
        help="int8 weight-only DiT storage (TPU analog of the fp8/GGUF VRAM tiers)",
    )
    p.add_argument("--fps", type=float, default=0.0, help="override output fps")
    p.add_argument(
        "--10bit", dest="use_10bit", action="store_true",
        help="10-bit x265 output (reference flag, inference_cli.py:1356). "
             "The ffmpeg writer here is already 10-bit x265 by default; "
             "this forces the 16-bit device->host transfer under "
             "--output_bits auto, warns when ffmpeg is unavailable (8-bit "
             "cv2 fallback), and warns if contradicted by an explicit "
             "--output_bits 8",
    )
    # mesh layout
    p.add_argument("--mesh", type=str, default="auto", help="auto or 'data,seq,tensor' e.g. 2,2,2")
    # Reference CUDA-only flags: accepted, ignored (BlockSwap/compile/offload
    # are replaced by GSPMD sharding + jax.jit on TPU).
    p.add_argument("--tile_debug", type=str, default="false",
                   choices=["false", "encode", "decode"],
                   help="draw VAE tile boundaries on the output")
    p.add_argument(
        "--tensor_offload_device", type=str, default=None,
        help="reference flag; 'cpu' forces host offload of intermediates, "
             "'none' keeps them on device (default: auto by HBM pressure)",
    )
    p.add_argument(
        "--fused_pipeline", type=str, default="auto", choices=["auto", "off"],
        help="'auto' runs each batch as one fused executable when batches "
             "are independent; 'off' forces the 4-phase pipeline "
             "(per-phase progress + OOM tiling ladder)",
    )
    p.add_argument(
        "--video_backend", type=str, default="auto",
        choices=["auto", "opencv", "ffmpeg"],
        help="video decode/encode backend (reference flag, "
             "inference_cli.py:1354). 'ffmpeg' also reads >8-bit sources "
             "losslessly (uint16 frames feed the 16-bit device path); "
             "'auto' picks ffmpeg exactly when the source is >8-bit "
             "or the native-planar path is live (see --pixfmt)",
    )
    p.add_argument(
        "--pixfmt", type=str, default="auto",
        choices=["auto", "rgb", "yuv420"],
        help="pixel format on the host<->device link (TPU extension). "
             "'yuv420' feeds the decoder's native yuv420p planes to the "
             "device and fetches the mp4 sink's native planes back "
             "(1.5 B/px instead of 3 each way; colorspace conversion runs "
             "on-device, ops/yuv.py). 'auto' = yuv420 exactly when both "
             "ends are yuv420 video through ffmpeg; 'rgb' forces the "
             "classic path",
    )
    for flag in [
        "--blocks_to_swap", "--swap_io_components", "--cuda_device",
        "--dit_offload_device", "--vae_offload_device",
        "--compile_dit", "--compile_vae", "--compile_mode", "--compile_backend",
        "--compile_fullgraph", "--compile_dynamic", "--compile_dynamo_cache_size_limit",
        "--compile_dynamo_recompile_limit", "--cache_dit", "--cache_vae",
    ]:
        p.add_argument(flag, nargs="?", default=None, help=argparse.SUPPRESS)
    return p.parse_args(argv)


def _pair(v):
    v = list(v)
    return (v[0], v[0]) if len(v) == 1 else (v[0], v[1])


def _resolve_output_bits(args) -> int:
    """'auto': transfer 16-bit pixels only when the sink can use them —
    PNG16 or the 10-bit x265 ffmpeg writer; the cv2 fallback writes 8-bit
    mp4, so a 16-bit transfer would be wasted bytes on the host link."""
    if args.output_bits != "auto":
        bits = int(args.output_bits)
        if args.use_10bit and bits == 8:
            print("⚠️ --10bit ignored: explicit --output_bits 8 forces the 8-bit transfer")
        return bits
    if args.output_format == "png":
        return 16
    from seedvr2_tpu.io import video as vio

    if vio.have_ffmpeg():
        return 16
    if args.use_10bit:
        print("⚠️ --10bit requested but ffmpeg is unavailable; falling back to 8-bit cv2 mp4")
        return 16  # honor the flag: lossless transfer even to the 8-bit sink
    return 8


def _resolve_pixfmt(args) -> str:
    """'auto' -> 'yuv420' exactly when the sink is yuv420 video written by
    ffmpeg (the fused paths then pack the sink's native planes on device);
    anything else stays 'rgb'. The reader side is gated separately in
    _process_video (the source must be yuv420 too)."""
    if args.pixfmt == "rgb":
        return "rgb"
    from seedvr2_tpu.io import video as vio

    ffmpeg_sink = (
        args.output_format == "video"
        and args.video_backend != "opencv"
        and vio.have_ffmpeg()
    )
    if args.pixfmt == "yuv420":
        if not ffmpeg_sink:
            print("⚠️ --pixfmt yuv420 needs an ffmpeg video sink; using rgb")
            return "rgb"
        return "yuv420"
    return "yuv420" if ffmpeg_sink else "rgb"


def build_runner(args, mesh=None):
    from seedvr2_tpu.config import PipelineConfig, dit_3b, vae_config
    from seedvr2_tpu.io.registry import DEFAULT_DIT
    from seedvr2_tpu.ops.attention import set_attention_backend
    from seedvr2_tpu.pipeline.loader import load_runner
    from seedvr2_tpu.utils.debug import Debug

    debug = Debug(enabled=args.debug)
    debug.environment_report()
    set_attention_backend(args.attention_mode)
    from seedvr2_tpu.ops.conv3d_kernel import set_conv_backend

    set_conv_backend(args.vae_conv_backend)

    dit_name = args.dit_model or DEFAULT_DIT
    from seedvr2_tpu.io.registry import model_variant

    if model_variant(dit_name) == "tiny":
        # smoke-test configuration (CI-sized models)
        import dataclasses

        from seedvr2_tpu.config import dit_tiny, vae_tiny

        vae_cfg = vae_tiny()
        dit_cfg = dataclasses.replace(
            dit_tiny(),
            vid_in_channels=2 * vae_cfg.latent_channels + 1,
            vid_out_channels=vae_cfg.latent_channels,
        )
    else:
        dit_cfg, vae_cfg = dit_3b(), vae_config()  # variant fixed by load_runner

    offload = "auto"
    if args.tensor_offload_device is not None:
        v = args.tensor_offload_device.lower()
        if v in ("none", "cuda", "gpu", "tpu"):
            offload = "never"
        elif v in ("auto", ""):
            offload = "auto"  # HBM-pressure heuristic (the documented default)
        else:  # "cpu" or any explicit host device string
            offload = "always"
    cfg = PipelineConfig(
        dit=dit_cfg,
        vae=vae_cfg,
        tensor_offload=offload,
        fused_pipeline=args.fused_pipeline,
        resolution=args.resolution,
        max_resolution=args.max_resolution,
        batch_size=args.batch_size,
        uniform_batch_size=args.uniform_batch_size,
        temporal_overlap=args.temporal_overlap,
        prepend_frames=args.prepend_frames,
        seed=args.seed,
        input_noise_scale=args.input_noise_scale,
        latent_noise_scale=args.latent_noise_scale,
        color_correction=args.color_correction,
        encode_tiled=args.vae_encode_tiled,
        encode_tile_size=_pair(args.vae_encode_tile_size),
        encode_tile_overlap=_pair(args.vae_encode_tile_overlap),
        decode_tiled=args.vae_decode_tiled,
        decode_tile_size=_pair(args.vae_decode_tile_size),
        decode_tile_overlap=_pair(args.vae_decode_tile_overlap),
        output_bits=_resolve_output_bits(args),
        output_pixfmt=_resolve_pixfmt(args),
    )
    shard_dit = mesh is not None and mesh.shape.get("tensor", 1) > 1
    runner = load_runner(
        dit_model=dit_name,
        vae_model=args.vae_model,
        model_dir=args.model_dir,
        cfg=cfg,
        quantize=None if args.quantize == "none" else args.quantize,
        mesh=mesh,
        shard_dit=shard_dit,
        debug=debug,
        emb_dir=os.path.dirname(os.path.abspath(__file__)),
    )
    if mesh is not None:
        debug.log(
            f"mesh: data={mesh.shape.get('data', 1)} "
            f"seq={mesh.shape.get('seq', 1)} tensor={mesh.shape.get('tensor', 1)}"
            + (" (DiT tensor-sharded)" if shard_dit else ""),
            category="setup", force=True,
        )
    return runner, runner.cfg, debug


def _to_rgb_if_planar(out):
    """Image sinks need RGB: convert a planar-yuv result back on host
    (only reachable when a video-oriented cfg processes a still image)."""
    from seedvr2_tpu.ops.yuv import is_planar, yuv420_to_rgb01_np

    return yuv420_to_rgb01_np(out.to_numpy()) if is_planar(out) else out


def process_frames(runner, cfg, frames: np.ndarray, debug, mesh=None, tile_debug="false"):
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from seedvr2_tpu.pipeline.multichip import generate_multichip

        out = generate_multichip(runner, frames, mesh, debug=debug)
    else:
        from seedvr2_tpu.pipeline import phases

        # The CLI's sinks are all integer (PNG, x265, cv2 mp4), so accept
        # packed pixels and skip the host fp32 unpack; the tile-debug
        # overlay draws in float space, so keep f32 there. generate() may
        # still return f32 on host-postprocess paths — writers dispatch on
        # dtype (io/video.py).
        packed = tile_debug not in ("encode", "decode")
        out = phases.generate(runner, frames, cfg, debug, packed=packed)
    if tile_debug in ("encode", "decode"):
        from seedvr2_tpu.utils.tile_debug import draw_for_config

        out = draw_for_config(np.asarray(out), cfg, tile_debug)
    return out


def _estimate_dit(args):
    """(heads, estimated resident DiT bytes) for the mesh policy, mirroring
    the loader's quantization default (pipeline/loader.py:auto_quantize)."""
    from seedvr2_tpu.config import dit_3b, dit_7b, dit_tiny
    from seedvr2_tpu.io.registry import DEFAULT_DIT, model_variant
    from seedvr2_tpu.pipeline.loader import auto_quantize, dit_param_bytes
    from seedvr2_tpu.pipeline.phases import _hbm_bytes

    name = args.dit_model or DEFAULT_DIT
    cfg = {"7b": dit_7b, "tiny": dit_tiny}.get(model_variant(name), dit_3b)()
    quant = auto_quantize(cfg, None if args.quantize == "none" else args.quantize,
                          _hbm_bytes())
    if name.endswith(".gguf"):
        quant = "int8"
    return cfg.heads, dit_param_bytes(cfg, quant)


def build_mesh(args, n_frames: Optional[int] = None):
    """Device mesh for this invocation. ``--mesh auto`` is workload-aware
    (parallel/mesh.py:auto_mesh_shape): frame data-parallelism first for
    videos with >= 2 frames/chip, tensor-sharded DiT for images and for
    models that don't fit one chip — the TPU analog of the reference's
    one-flag multi-GPU UX (reference: inference_cli.py:1127-1288)."""
    import jax

    from seedvr2_tpu.parallel.mesh import auto_mesh, make_mesh
    from seedvr2_tpu.pipeline.phases import _hbm_bytes

    if len(jax.devices()) == 1:
        return None
    if args.mesh != "auto":
        d, s, t = (int(x) for x in args.mesh.split(","))
        return make_mesh(d, s, t)
    heads, dit_bytes = _estimate_dit(args)
    return auto_mesh(
        n_frames=n_frames, heads=heads, model_bytes=dit_bytes,
        hbm_bytes=_hbm_bytes(),
    )


def _probe_frames(args, kind: str) -> Optional[int]:
    """Frame count of one processing call, for the mesh policy: images are
    1, videos are bounded by chunking/caps; directories are mixed (None ->
    the data-first default)."""
    if kind == "image":
        return 1
    if kind != "video":
        return None
    from seedvr2_tpu.io import video as vio

    try:
        reader = vio.make_video_reader(args.input, backend=args.video_backend)
        total = reader.total_frames - args.skip_first_frames
        reader.close()
    except Exception:
        return None
    if args.load_cap:
        total = min(total, args.load_cap)
    if args.chunk_size:
        total = min(total, args.chunk_size)
    return max(int(total), 1)


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_arguments(argv)
    from seedvr2_tpu.io import video as vio

    kind = vio.input_type(args.input)
    mesh = build_mesh(args, _probe_frames(args, kind))
    runner, cfg, debug = build_runner(args, mesh)
    t0 = time.time()
    n_frames = 0

    if kind == "image":
        img = vio.read_image(args.input)
        out = _to_rgb_if_planar(process_frames(runner, cfg, img[None], debug, mesh))
        out_path = args.output or _default_out(args.input, "png")
        vio.write_image(out_path, out[0])
        n_frames = 1
        print(f"Saved {out_path}")
    elif kind == "video":
        out_path = args.output or _default_out(args.input, "mp4")
        n_frames = _process_video(args, runner, cfg, debug, mesh, args.input, out_path)
    else:  # directory: videos AND images, like the reference's batch mode
        # (reference: inference_cli.py:280-296 VIDEO_EXTENSIONS | IMAGE_EXTENSIONS)
        files = sorted(
            f for f in os.listdir(args.input)
            if os.path.splitext(f)[1].lower() in (vio.IMAGE_EXTS | vio.VIDEO_EXTS)
        )
        out_dir = args.output or (args.input.rstrip("/") + "_upscaled")
        os.makedirs(out_dir, exist_ok=True)
        n_files = 0
        for f in files:
            src = os.path.join(args.input, f)
            base, ext = os.path.splitext(f)
            if ext.lower() in vio.IMAGE_EXTS:
                img = vio.read_image(src)
                out = _to_rgb_if_planar(
                    process_frames(runner, cfg, img[None], debug, mesh)
                )
                vio.write_image(os.path.join(out_dir, f), out[0])
                n_frames += 1
            else:
                # original filename, .mp4 container (reference:
                # generate_output_path from_directory=True, :395-419)
                n_frames += _process_video(
                    args, runner, cfg, debug, mesh, src, os.path.join(out_dir, base + ".mp4")
                )
            n_files += 1
        print(f"Saved {n_files} files to {out_dir}")

    dt = time.time() - t0
    if n_frames:
        print(f"Processed {n_frames} frames in {dt:.1f}s ({n_frames / dt:.2f} fps)")
    return 0


def _process_video(args, runner, cfg, debug, mesh, in_path: str, out_path: str) -> int:
    """Chunked/streaming upscale of one video file; returns frames written.

    uint8 ingestion: raw decoder bytes go straight to the device and are
    scaled in-program (ops/resize.py:to_f01) — 1 B/px uplink and no host
    float conversion (the reference converts to fp32 on host, reference
    inference_cli.py:151-157)."""
    from seedvr2_tpu.io import video as vio

    n_frames = 0
    # Native-planar ingestion: worthwhile only when the fused device paths
    # will actually see the planes (mesh-off, no temporal overlap/prepend);
    # otherwise the host would just convert them back.
    want_planar = (
        _resolve_pixfmt(args) == "yuv420"
        and mesh is None
        and args.temporal_overlap == 0
        and args.prepend_frames == 0
        and args.fused_pipeline != "off"
        and args.tile_debug == "false"
    )
    reader = vio.make_video_reader(
        in_path, dtype=np.uint8, backend=args.video_backend, planar=want_planar
    )
    if getattr(reader, "planar", False):
        print("ffmpeg reader: native yuv420p planes feed the device "
              "(colorspace conversion runs on-TPU)")
    if reader.dtype == np.uint16 and not getattr(reader, "planar", False):
        print(f"ffmpeg reader: >8-bit source decodes to uint16 (16-bit device path)")
    if args.skip_first_frames:
        reader.seek(args.skip_first_frames)
    fps = args.fps or reader.fps
    chunk = args.chunk_size or (args.load_cap or reader.total_frames)

    manifest = None
    start_chunk = 0
    if args.chunk_size and args.output_format == "video" and args.temporal_overlap == 0:
        from seedvr2_tpu.io.resume import ResumeManifest

        total = reader.total_frames - args.skip_first_frames
        if args.resume:
            manifest = ResumeManifest.load_if_matching(out_path, in_path, total, chunk)
            if manifest:
                start_chunk = manifest.chunks_done
                reader.seek(args.skip_first_frames + start_chunk * chunk)
                n_frames = start_chunk * chunk
                print(f"Resuming from chunk {start_chunk} ({n_frames} frames done)")
        if manifest is None:
            manifest = ResumeManifest(out_path, in_path, total, chunk)

    writer = None
    ci = start_chunk
    ov = args.temporal_overlap if args.chunk_size else 0
    pending_tail = None  # last `ov` output frames, held back for seam blending

    def emit(arr):
        nonlocal writer, n_frames
        from seedvr2_tpu.ops.yuv import is_planar

        if len(arr) == 0:
            return
        planar = is_planar(arr)
        wkw = dict(planar_in=True, bit10=arr.depth == 10) if planar else {}
        if args.output_format == "png":
            vio.write_png_sequence(os.path.splitext(out_path)[0], arr, start_index=n_frames)
        elif manifest is not None:
            seg = manifest.segment_path(ci)
            w = vio.make_video_writer(
                seg, arr.shape[2], arr.shape[1], fps, backend=args.video_backend,
                **wkw,
            )
            w.write(arr if planar else arr[..., :3])
            w.close()
            manifest.mark_done(ci, seg)
        else:
            if writer is None:
                writer = vio.make_video_writer(
                    out_path, arr.shape[2], arr.shape[1], fps,
                    backend=args.video_backend, audio_source=in_path,
                    **wkw,
                )
            writer.write(arr if planar else arr[..., :3])
        n_frames += len(arr)

    for frames in reader.chunks(chunk, ov):
        if args.load_cap and n_frames >= args.load_cap:
            break
        out = process_frames(runner, cfg, frames, debug, mesh, args.tile_debug)
        from seedvr2_tpu.ops.yuv import is_planar as _is_planar

        if not _is_planar(out):
            out = np.asarray(out)
        if pending_tail is not None:
            # Chunk seam: the first `ov` outputs re-render the previous
            # chunk's held-back tail frames — Hann-blend, emit once
            # (reference: inference_cli.py:678-709, 1242-1277).
            from seedvr2_tpu.ops.blending import overlap_weights

            k = min(ov, len(out), len(pending_tail))
            w_prev = overlap_weights(k).reshape(k, 1, 1, 1).astype(np.float32)
            blend = (
                pending_tail[-k:].astype(np.float32) * w_prev
                + out[:k].astype(np.float32) * (1.0 - w_prev)
            )
            if out.dtype != np.float32:  # packed pixels: round back
                blend = (blend + 0.5).astype(out.dtype)
            out = np.concatenate([blend.astype(out.dtype), out[k:]], axis=0)
        if ov > 0 and len(frames) == chunk:
            # More chunks may follow: hold back the tail for blending.
            pending_tail, out = out[-ov:], out[:-ov]
        else:
            pending_tail = None
        emit(out)
        ci += 1
        if not args.chunk_size:
            break
    if pending_tail is not None:
        emit(pending_tail)
    if writer is not None:
        writer.close()
    if manifest is not None:
        out_path = manifest.finalize()
    reader.close()
    print(f"Saved {out_path}")
    return n_frames


def _default_out(path: str, ext: str) -> str:
    base, _ = os.path.splitext(path)
    return f"{base}_upscaled.{ext}"


if __name__ == "__main__":
    sys.exit(main())
