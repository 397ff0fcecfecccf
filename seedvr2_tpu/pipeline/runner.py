"""Inference runner: owns model params + per-shape compiled step functions.

TPU analog of the reference's VideoDiffusionInfer (reference:
src/core/infer.py:36-395) with the model-lifecycle machinery
(meta-device lazy load, BlockSwap, CompatibleDiT, torch.compile strategies,
model_configuration.py) collapsed into: load weights -> device_put with a
NamedSharding -> jit per (latent-shape, txt-len) bucket. DivisiblePad(16)
already quantizes pixel shapes, so one pipeline run compiles exactly one
DiT executable and a handful of VAE slice executables.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..models.dit.nadit import AttnPlans, build_attn_plans, nadit_forward
from ..models.vae import tiling as vae_tiling
from ..pipeline import diffusion as dm
from ..utils.debug import Debug
from ..utils.seed import batch_key


def _pack_frames(out01: jnp.ndarray, bits: int) -> jnp.ndarray:
    """[0,1] float -> uint16 (10-bit x265/PNG16 sinks, lossless) or uint8
    (8-bit sinks; halves the device->host output transfer, ROADMAP #8)."""
    if bits == 8:
        return (out01 * 255.0 + 0.5).astype(jnp.uint8)
    return (out01 * 65535.0 + 0.5).astype(jnp.uint16)


def _probe_first(out) -> None:
    """Fetch one scalar of an async result so a RESOURCE_EXHAUSTED surfaces
    here (block_until_ready does not block on the axon platform)."""
    from ..ops.yuv import is_planar

    arr = out.y if is_planar(out) else out
    np.asarray(arr[(0,) * arr.ndim])


def unpack_frames(arr) -> "np.ndarray":
    """Host-side inverse of _pack_frames: uint8/uint16 -> fp32 [0, 1]."""
    a = np.asarray(arr)
    scale = 255.0 if a.dtype == np.uint8 else 65535.0
    return np.asarray(a, np.float32) / scale


class Runner:
    def __init__(
        self,
        cfg: PipelineConfig,
        dit_params,
        vae_params,
        text_pos: np.ndarray,  # [Lt, txt_in_dim]
        text_neg: Optional[np.ndarray] = None,
        debug: Optional[Debug] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.cfg = cfg
        self.dit_params = dit_params
        self.vae_params = vae_params
        self._dit_host = None  # host copy when cfg.phased_weights
        self.text_pos = jnp.asarray(text_pos)[None]  # [1, Lt, C]
        self.text_neg = jnp.asarray(text_neg)[None] if text_neg is not None else None
        self.debug = debug or Debug()
        self.mesh = mesh
        self._dit_step_cache: Dict[Tuple, callable] = {}
        self._finalize_cache: Dict[Tuple, callable] = {}
        self._vae_cache: Dict[Tuple, callable] = {}
        self._fused_cache: Dict[Tuple, callable] = {}
        self._plan_args_cache: Dict[Tuple, Dict] = {}
        self._oom_validated: set = set()

    def _cfg_key(self) -> str:
        """Digest of the traced-in cfg, mixed into every jit-cache key: a
        cfg swap on a cached Runner (node layer, interfaces.py) can then
        never execute a closure traced against the old cfg, even if the
        caller forgets invalidate_compiled (VERDICT r3 weak #6). cfg is a
        nested dataclass of scalars/tuples/strings, so repr is a complete,
        deterministic serialization."""
        import hashlib

        return hashlib.sha1(repr(self.cfg).encode()).hexdigest()[:12]

    def _plan_args(self, thw: Tuple[int, int, int], txt_len: int):
        """Device copies of the window-plan constants for a latent-shape
        bucket, passed INTO the jitted step as arguments so index/angle
        tables (22MB at 1080p, ~90MB at 4K) never embed in program text
        (models/dit/nadit.py:plan_device_args)."""
        from ..models.dit.nadit import plan_device_args

        key = (self._cfg_key(), thw, txt_len)
        pa = self._plan_args_cache.get(key)
        if pa is None:
            cfg = self.cfg
            pt, ph, pw = cfg.dit.patch_size
            patched = (thw[0] // pt, thw[1] // ph, thw[2] // pw)
            pa = plan_device_args(build_attn_plans(cfg.dit, patched, txt_len))
            self._plan_args_cache[key] = pa
        return pa

    # ------------------------------ condition ------------------------------ #

    @staticmethod
    def get_condition(
        noise: jnp.ndarray, latent_blur: jnp.ndarray, task: str = "sr"
    ) -> jnp.ndarray:
        """Conditioning channels [cond latent | mask]
        (reference: src/core/infer.py:54-78). Tasks: 'sr' (all frames
        conditioned on latent_blur), 'i2v' (first frame), 'v2v' (first two
        frames), 't2v' (none). For i2v/v2v pass the *clean* latent as
        `latent_blur` (the reference conditions those on latent[:n]). Only
        'sr' is exercised by the upscaler pipeline, as in the reference."""
        B, t = noise.shape[0], noise.shape[1]
        zeros = jnp.zeros_like(noise)
        mask0 = jnp.zeros(noise.shape[:-1] + (1,), noise.dtype)
        if task == "sr":
            return jnp.concatenate([latent_blur, mask0 + 1.0], axis=-1)
        if task == "t2v":
            return jnp.concatenate([zeros, mask0], axis=-1)
        if task in ("i2v", "v2v"):
            n = 1 if task == "i2v" else 2
            frame_idx = jnp.arange(t).reshape(1, t, 1, 1, 1)
            keep = (frame_idx < n).astype(noise.dtype)
            cond = latent_blur * keep
            return jnp.concatenate([cond, mask0 + keep], axis=-1)
        raise NotImplementedError(task)

    # ------------------------------- VAE ----------------------------------- #

    def _tile_parallel(self, batch_dim: int):
        """Tile-parallel VAE across ALL mesh axes for single-segment inputs:
        tiles are data-parallel work, so the tile batch shards over the
        flattened ("data","seq","tensor") axes — on a tensor-sharded-DiT
        mesh (images, 7B-on-small-HBM) the VAE still uses every chip. This
        is the short-clip replacement for the reference's (stubbed) temporal
        context-parallel ring (context_parallel_lib.py:26-67) — see
        docs/PERFORMANCE.md "Cross-device VAE" for the measured trade-off
        vs a temporal wavefront pipeline. Long clips use frame-DP instead
        (pipeline/multichip.py), where batch_dim > 1 already fills the axis."""
        if self.mesh is None or batch_dim != 1:
            return 0, None
        axes = tuple(a for a in ("data", "seq", "tensor") if self.mesh.shape.get(a, 1) > 1)
        n = int(np.prod([self.mesh.shape[a] for a in axes])) if axes else 1
        if n <= 1:
            return 0, None
        return n, jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec(axes))

    def _vae_fn(self, kind: str, tiled, ts, to, tb, arr_shape, arr_dtype):
        """One compiled executable for the WHOLE tiled encode/decode: the
        tile grid is static Python, so jitting the driver folds dozens of
        per-tile dispatches (slice, decode, scatter-add) into one program —
        on a high-latency link each eager dispatch costs an RPC round-trip
        (docs/PERFORMANCE.md), and XLA can overlap tile work it couldn't
        see before."""
        c = self.cfg
        key = (self._cfg_key(), kind, tiled, ts, to, tb, arr_shape, str(arr_dtype))
        fn = self._vae_cache.get(key)
        if fn is None:
            if kind == "encode":
                def f(p, a):
                    return vae_tiling.vae_encode(
                        p, c.vae, a, tiled=tiled, tile_size=ts, tile_overlap=to,
                        tile_batch=tb,
                    )
            else:
                def f(p, a):
                    return vae_tiling.vae_decode(
                        p, c.vae, a, tiled=tiled, tile_size=ts, tile_overlap=to,
                        tile_batch=tb,
                    )
            fn = jax.jit(f)
            self._vae_cache[key] = fn
        return fn

    def vae_encode(self, video: jnp.ndarray) -> jnp.ndarray:
        """video: [B, T, H, W, 3] in [-1, 1] -> scaled latent."""
        c = self.cfg
        tp_n, tp_shard = self._tile_parallel(video.shape[0])

        def run(tiled, ts, to):
            tb = max(c.encode_tile_batch, tp_n) if tiled else c.encode_tile_batch
            if tp_shard is not None:
                # mesh path: device_put sharding happens inside the tiling
                # driver, which cannot live under jit
                return vae_tiling.vae_encode(
                    self.vae_params, c.vae, video, tiled=tiled, tile_size=ts,
                    tile_overlap=to, tile_batch=tb, tile_sharding=tp_shard,
                )
            fn = self._vae_fn("encode", tiled, ts, to, tb, video.shape, video.dtype)
            return fn(self.vae_params, video)

        return self._with_oom_fallback(
            "encode", run, c.encode_tiled, c.encode_tile_size, c.encode_tile_overlap
        )

    def vae_decode(self, latent: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        tp_n, tp_shard = self._tile_parallel(latent.shape[0])

        def run(tiled, ts, to):
            tb = max(c.decode_tile_batch, tp_n) if tiled else c.decode_tile_batch
            if tp_shard is not None:
                return vae_tiling.vae_decode(
                    self.vae_params, c.vae, latent, tiled=tiled, tile_size=ts,
                    tile_overlap=to, tile_batch=tb, tile_sharding=tp_shard,
                )
            fn = self._vae_fn("decode", tiled, ts, to, tb, latent.shape, latent.dtype)
            return fn(self.vae_params, latent)

        def staged(ts, to):
            # Last rung: host-staged accumulation — the device holds one
            # tile's activations; blending runs in host RAM (the reference's
            # offload-device accumulation, attn_video_vae.py:1612-1625).
            z = latent / c.vae.scaling_factor + c.vae.shifting_factor
            return vae_tiling.tiled_decode_staged(self.vae_params, c.vae, z, ts, to)

        return self._with_oom_fallback(
            "decode", run, c.decode_tiled, c.decode_tile_size, c.decode_tile_overlap,
            staged_fn=staged,
        )

    def _with_oom_fallback(self, tag, fn, tiled, tile_size, tile_overlap, staged_fn=None):
        """TPU analog of the reference's retry_on_oom (reference:
        memory_manager.py:361-401): on RESOURCE_EXHAUSTED, enable tiling,
        then keep halving the tile (floor 256px) and retry; decode gets a
        final host-staged rung (``staged_fn``) that bounds device memory to
        one tile. A backend compile failure of a program embedding the
        pallas conv kernel instead disables that kernel and retries once
        via the XLA lowering (ops/conv3d_kernel.py:compile_fallback)."""
        while True:
            try:
                out = fn(tiled, tile_size, tile_overlap)
                # Force completion so async RESOURCE_EXHAUSTED surfaces
                # inside the retry. block_until_ready alone is not reliable
                # on tunneled platforms (it can return before execution
                # finishes there) — fetch one element, which cannot complete
                # without the whole program having run. During DECODE, HBM
                # pressure only shrinks batch over batch (upscaled latents
                # are consumed), so once a (shape, tiling) has completed the
                # sync is skipped and later batches stay fully async,
                # overlapping with host transfers. Encode keeps the per-call
                # sync: resident latents and the color-ref stash GROW per
                # batch, so a later identical-shape call can be the first to
                # OOM.
                key = (tag, tiled, tile_size, jax.tree.leaves(out)[0].shape)
                if tag != "decode" or key not in self._oom_validated:
                    first = jax.tree.leaves(out)[0]
                    np.asarray(first[(0,) * first.ndim])
                    self._oom_validated.add(key)
                return out
            except Exception as e:  # jaxlib errors don't share one type
                if "RESOURCE_EXHAUSTED" not in str(e):
                    from ..ops.conv3d_kernel import compile_fallback

                    if compile_fallback(e):
                        self._vae_cache.clear()
                        self._fused_cache.clear()
                        self.debug.log(
                            "pallas conv compile failed in the enclosing jit; "
                            "retrying with the XLA conv lowering",
                            category="memory",
                            force=True,
                        )
                        continue
                    raise
                if not tiled:
                    tiled, tile_size, tile_overlap = True, (1024, 1024), (128, 128)
                elif tile_size[0] > 256:
                    tile_size = (tile_size[0] // 2, tile_size[1] // 2)
                    tile_overlap = (max(32, tile_overlap[0] // 2),) * 2
                elif staged_fn is not None:
                    self.debug.log(
                        f"HBM exhausted during VAE {tag} at the tile floor; "
                        "falling back to host-staged tile accumulation",
                        category="memory",
                        force=True,
                    )
                    return staged_fn(tile_size, tile_overlap)
                else:
                    raise
                self.debug.log(
                    f"HBM exhausted during VAE {tag}; retrying with tiles {tile_size}",
                    category="memory",
                    force=True,
                )

    # ------------------------------- DiT ----------------------------------- #

    def _dit_sharding_ctx(self):
        """Context-manager factory activating the seq/tensor GSPMD hints
        inside nadit_forward when this runner's mesh shards either axis
        (parallel/sp.py). The hints are read at TRACE time, so the context
        wraps the nadit_forward call inside the traced step body. Identity
        on single-chip / pure frame-DP meshes."""
        import contextlib

        if self.mesh is None:
            return contextlib.nullcontext
        t = self.mesh.shape.get("tensor", 1) > 1
        s = self.mesh.shape.get("seq", 1) > 1
        if not (t or s):
            return contextlib.nullcontext
        from ..parallel.sp import sharded_dit

        mesh = self.mesh
        return lambda: sharded_dit(mesh, seq=s, tensor=t)

    def _dit_step(self, thw: Tuple[int, int, int], txt_len: int):
        """Compiled one-step upscale for a latent shape bucket: noise gen +
        condition assembly + DiT forward + Euler endpoint, one executable."""
        key = (self._cfg_key(), thw, txt_len)
        if key in self._dit_step_cache:
            return self._dit_step_cache[key]
        fn = jax.jit(self._build_step_body(thw, txt_len))
        self._dit_step_cache[key] = fn
        return fn

    def _build_step_body(self, thw: Tuple[int, int, int], txt_len: int):
        """The traceable upscale-step body; jitted standalone by _dit_step
        and inlined into the fused per-batch program (fused_batch)."""
        cfg = self.cfg
        pt, ph, pw = cfg.dit.patch_size
        patched = (thw[0] // pt, thw[1] // ph, thw[2] // pw)
        plans = build_attn_plans(cfg.dit, patched, txt_len)
        plans_neg = None
        if cfg.diffusion.cfg_scale != 1.0:
            if self.text_neg is None:
                raise ValueError("cfg_scale != 1 requires negative text embeddings")
            plans_neg = build_attn_plans(cfg.dit, patched, int(self.text_neg.shape[1]))
        T = cfg.diffusion.schedule_T
        timesteps = dm.uniform_trailing_timesteps(cfg.diffusion.sampling_steps, T)
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        dit_ctx = self._dit_sharding_ctx()

        def step(dit_params, latent, txt_pos, rng, plan_args=None):
            # latent: [B, t, h, w, C] scaled; returns upscaled latent.
            # plan_args: device window-plan tables (self._plan_args); None
            # falls back to embedding them as program constants (only the
            # CFG!=1 negative branch, which has its own plan shapes).
            k1, k2 = jax.random.split(rng)
            # ONE per-batch noise draw, broadcast across the batch/segment
            # axis: the reference's frame-DP workers all reset to the same
            # per-batch seed and draw identical noise (reference:
            # generation_phases.py:661-664 replayed per worker,
            # inference_cli.py:1015-1104), so segment b of a multichip run
            # must see the same noise as that batch run single-chip. For
            # B=1 this is bit-identical to drawing at latent.shape
            # (threefry counts elements row-major), so single-chip
            # numerics are unchanged; it is what makes fused_segments
            # per-segment comparable to fused_batch
            # (tests/test_multichip.py::test_multichip_matches_single).
            per = latent.shape[1:]
            base_noise = jnp.broadcast_to(
                jax.random.normal(k1, per, compute_dtype)[None], latent.shape
            )
            aug_noise = base_noise * 0.1 + jnp.broadcast_to(
                jax.random.normal(k2, per, compute_dtype)[None], latent.shape
            ) * 0.05
            latent = latent.astype(compute_dtype)

            if cfg.latent_noise_scale > 0:
                t0 = jnp.full((latent.shape[0],), T * cfg.latent_noise_scale, jnp.float32)
                shapes = jnp.tile(jnp.asarray([list(thw)]), (latent.shape[0], 1))
                if cfg.diffusion.timestep_transform:
                    t0 = dm.timestep_transform(
                        t0, shapes, T, cfg.vae.temporal_downsample_factor, cfg.vae.spatial_downsample_factor
                    )
                latent_blur = dm.schedule_forward(latent, aug_noise, t0, T)
            else:
                latent_blur = latent
            cond = self.get_condition(base_noise, latent_blur)

            def f(x_t, t_arr, i):
                vid = jnp.concatenate([x_t, cond], axis=-1)

                def pos():
                    with dit_ctx():
                        return nadit_forward(
                            dit_params, cfg.dit, vid, txt_pos.astype(compute_dtype), t_arr,
                            plans, plan_args,
                        )

                def neg():
                    with dit_ctx():
                        return nadit_forward(
                            dit_params, cfg.dit, vid, self.text_neg.astype(compute_dtype), t_arr, plans_neg
                        )

                # CFG with lazy negative-branch skip at scale 1 (reference:
                # diffusion/utils.py:66-84 — the deployed one-step model
                # always runs scale 1, generation_phases.py:599).
                return dm.cfg_dispatch(
                    pos, neg, cfg.diffusion.cfg_scale, cfg.diffusion.cfg_rescale
                )

            # Euler step math runs fp32 (t arrays promote); the latent
            # crosses phases in the compute dtype — decoding fp32 latents
            # doubles VAE activation memory for no quality gain (the
            # reference hands bf16/fp16 latents between phases too).
            out = dm.euler_sample(
                base_noise, f, list(timesteps), T, cfg.diffusion.prediction_type
            )
            return out.astype(compute_dtype)

        return step

    # ----------------------- fused per-batch pipeline ----------------------- #

    # Methods whose statistics span frames (histograms / instance stats):
    # temporal padding frames would bias them, so the fused program must
    # trim BEFORE color (like finalize_batch / the reference's phase 4).
    # "wavelet" is per-pixel and "none" skips color — no trim needed there.
    _CROSS_FRAME_COLOR = ("lab", "hsv", "wavelet_adaptive", "adain")

    def _trim_ori(self, ori: int, T: int):
        """Static in-program trim length, or None when host-side trimming is
        exact (per-pixel color): None keeps ONE executable per batch shape;
        a static trim recompiles for the (at most one) short trailing
        batch of a cross-frame-color run."""
        if ori != T and self.cfg.color_correction in self._CROSS_FRAME_COLOR:
            return ori
        return None

    def _make_fused_fn(self, frames_shape, batched: bool, true_h, true_w, trim_ori):
        """Trace body shared by fused_batch (single clip) and fused_segments
        (multichip, leading "data"-sharded segment axis)."""
        c = self.cfg
        from ..ops import color as color_ops
        from ..ops.resize import pipeline_transform

        compute = jnp.dtype(c.compute_dtype)
        per = frames_shape[1:] if batched else frames_shape
        tshape = jax.eval_shape(
            lambda v: pipeline_transform(v, c.resolution, c.max_resolution),
            jax.ShapeDtypeStruct(tuple(per), jnp.float32),
        ).shape
        td, sf = c.vae.temporal_downsample_factor, c.vae.spatial_downsample_factor
        thw = ((per[0] - 1) // td + 1, tshape[1] // sf, tshape[2] // sf)
        step = self._build_step_body(thw, int(self.text_pos.shape[1]))
        method = c.color_correction

        def f(dit_params, vae_params, fr16, txt, nkey, rng, plan_args):
            from ..ops.resize import to_f01

            transform = lambda v: pipeline_transform(
                to_f01(v), c.resolution, c.max_resolution
            )
            tv = jax.vmap(transform)(fr16) if batched else transform(fr16)
            video = tv
            if c.input_noise_scale > 0:
                # reference: generation_phases.py:415-431; drawn per-clip and
                # broadcast across segments (same rationale as the DiT noise
                # in _build_step_body: reference frame-DP workers draw
                # identical per-batch noise), so streaming matches the
                # phase-wise path AND multichip segments match single-chip.
                per_clip = tv.shape[1:] if batched else tv.shape
                noise = jax.random.normal(nkey, per_clip, tv.dtype) * 0.05
                if batched:
                    noise = jnp.broadcast_to(noise[None], tv.shape)
                blend = c.input_noise_scale * 0.5
                video = tv * (1 - blend) + (tv + noise) * blend
            vb = video if batched else video[None]
            tvb = tv if batched else tv[None]
            latent = vae_tiling.vae_encode(
                vae_params, c.vae, vb.astype(compute),
                tiled=c.encode_tiled, tile_size=c.encode_tile_size,
                tile_overlap=c.encode_tile_overlap, tile_batch=c.encode_tile_batch,
            )
            up = step(dit_params, latent, txt, rng, plan_args)
            dec = vae_tiling.vae_decode(
                vae_params, c.vae, up, tiled=c.decode_tiled,
                tile_size=c.decode_tile_size, tile_overlap=c.decode_tile_overlap,
                tile_batch=c.decode_tile_batch,
            )
            if trim_ori is not None:
                dec = dec[:, :trim_ori]
                tvb = tvb[:, :trim_ori]
            x = dec[:, :, :true_h, :true_w].astype(jnp.float32)
            if method != "none":
                style = tvb[:, :, :true_h, :true_w]  # clean (pre-noise) ref

                def one(cc, ss):
                    return color_ops.apply_color_correction(
                        method, cc.transpose(0, 3, 1, 2), ss.transpose(0, 3, 1, 2)
                    ).transpose(0, 2, 3, 1)

                x = jax.vmap(one)(x, style)
            out01 = jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
            if (
                not batched
                and c.output_pixfmt == "yuv420"
                and true_h % 2 == 0
                and true_w % 2 == 0
            ):
                # pack the mp4 sink's native planes (1.5 B/px vs RGB's 3)
                from ..ops.yuv import rgb01_to_yuv420

                return rgb01_to_yuv420(out01[0], 8 if c.output_bits == 8 else 10)
            u16 = _pack_frames(out01, c.output_bits)
            return u16 if batched else u16[0]

        return f

    def _fused_thw(self, frames_shape, batched: bool):
        from ..ops.resize import pipeline_transform

        c = self.cfg
        per = frames_shape[1:] if batched else frames_shape
        tshape = jax.eval_shape(
            lambda v: pipeline_transform(v, c.resolution, c.max_resolution),
            jax.ShapeDtypeStruct(tuple(per), jnp.float32),
        ).shape
        td, sf = c.vae.temporal_downsample_factor, c.vae.spatial_downsample_factor
        return ((per[0] - 1) // td + 1, tshape[1] // sf, tshape[2] // sf)

    def _run_fused(self, key, batched, frames16, true_h, true_w, noise_key, seed, trim_ori):
        fn = self._fused_cache.get(key)
        if fn is None:
            fn = jax.jit(
                self._make_fused_fn(frames16.shape, batched, true_h, true_w, trim_ori)
            )
            self._fused_cache[key] = fn
        self.ensure_dit_resident()
        pa = self._plan_args(
            self._fused_thw(frames16.shape, batched), int(self.text_pos.shape[1])
        )
        out = fn(
            self.dit_params, self.vae_params, frames16, self.text_pos,
            noise_key, batch_key(seed, "dit"), pa,
        )
        if key not in self._oom_validated:
            _probe_first(out)  # surface OOM before committing
            self._oom_validated.add(key)
        return out

    def fused_batch(
        self,
        frames16: jnp.ndarray,  # [T', h_in, w_in, 3] float16 in [0, 1]
        ori: int,
        true_h: int,
        true_w: int,
        noise_key,
        seed: int,
    ) -> jnp.ndarray:
        """The WHOLE per-batch pipeline as one executable: transform ->
        (input noise) -> VAE encode -> one-step DiT -> VAE decode -> trim /
        color fix / uint16 pack. With temporal_overlap=0 batches are fully
        independent, so nothing forces the reference's 4-phase structure
        (generation_phases.py phases exist for VRAM staging); fusing them
        removes every inter-phase dispatch and the latent round-trips, and
        the color reference is simply ``tv`` inside the program. Returns
        [T' or ori, true_h, true_w, 3] uint16 — temporal padding is trimmed
        in-program only when the color method's statistics span frames
        (see _trim_ori), otherwise on the host so a short trailing batch
        reuses the same executable. Raises on OOM (no retry ladder — the
        caller falls back to the phase-wise pipeline)."""
        trim = self._trim_ori(ori, frames16.shape[0])
        key = ("fused", self._cfg_key(), frames16.shape, true_h, true_w, trim)
        return self._run_fused(
            key, False, frames16, true_h, true_w, noise_key, seed, trim
        )

    def fused_segments(
        self,
        frames16: jnp.ndarray,  # [n, T', h_in, w_in, 3] f16, sharded over "data"
        ori: int,
        true_h: int,
        true_w: int,
        noise_key,
        seed: int,
    ) -> jnp.ndarray:
        """Multichip sibling of fused_batch: the per-spec chain as one SPMD
        program over a "data"-sharded segment batch; only 2 bytes/px cross
        the host link. Returns [n, T' or ori, true_h, true_w, 3] uint16 in
        [0, 65535] ([0,1] domain — seam blending is affine, so blending the
        [0,1] values on host is identical to blending [-1,1] and
        renormalizing)."""
        trim = self._trim_ori(ori, frames16.shape[1])
        key = ("fused_seg", self._cfg_key(), frames16.shape, true_h, true_w, trim)
        return self._run_fused(
            key, True, frames16, true_h, true_w, noise_key, seed, trim
        )

    # ------------------- streamed column-chunk pipeline --------------------- #

    def supports_chunked(self, frames_shape, true_h: int, true_w: int):
        """ColumnChunkPlan for this batch shape, or None when the streamed
        column-chunk path (fused_batch_chunks) wouldn't be bit-compatible
        with fused_batch: it requires a single-row multi-column decode
        grid, tile_batch 1, a spatially-local (or absent) color method,
        and no mesh (multichip segments stream whole segments instead)."""
        c = self.cfg
        if (
            getattr(c, "chunked_output", "auto") == "off"
            or getattr(self, "_disable_chunked", False)  # set by generate()
            # after a chunked-path RESOURCE_EXHAUSTED: retry monolithic
            or not c.decode_tiled
            or c.decode_tile_batch != 1
            or self.mesh is not None
            or c.color_correction not in ("none", "wavelet")
        ):
            return None
        thw = self._fused_thw(frames_shape, False)
        halo = 32 if c.color_correction == "wavelet" else 0
        return vae_tiling.column_chunk_plan(
            c.vae, thw[1], thw[2], c.decode_tile_size, c.decode_tile_overlap,
            true_h, true_w, halo,
        )

    def _make_head_fn(self, frames_shape, true_h, true_w):
        """transform -> (input noise) -> tiled encode -> one-step DiT: the
        front half of _make_fused_fn, emitting the upscaled latent and the
        clean transformed frames (the color-correction style source) for
        the streamed column-chunk decode."""
        c = self.cfg
        from ..ops.resize import pipeline_transform, to_f01

        compute = jnp.dtype(c.compute_dtype)
        thw = self._fused_thw(frames_shape, False)
        step = self._build_step_body(thw, int(self.text_pos.shape[1]))

        def f(dit_params, vae_params, fr16, txt, nkey, rng, plan_args):
            tv = pipeline_transform(to_f01(fr16), c.resolution, c.max_resolution)
            video = tv
            if c.input_noise_scale > 0:
                noise = jax.random.normal(nkey, tv.shape, tv.dtype) * 0.05
                blend = c.input_noise_scale * 0.5
                video = tv * (1 - blend) + (tv + noise) * blend
            latent = vae_tiling.vae_encode(
                vae_params, c.vae, video[None].astype(compute),
                tiled=c.encode_tiled, tile_size=c.encode_tile_size,
                tile_overlap=c.encode_tile_overlap, tile_batch=c.encode_tile_batch,
            )
            up = step(dit_params, latent, txt, rng, plan_args)
            return up, tv

        return f

    def _make_chunk_fn(self, plan, i: int, true_h: int, true_w: int):
        """Decode column tile ``i``, blend it with the carry strip from tile
        i-1, color-fix + pack the columns that are now final, and emit the
        (acc, cnt) strip tile i+1 still needs. Replicates tiled_decode's
        blend math exactly (f32 weighted accumulate -> /cnt -> compute
        dtype) and _make_fused_fn's finalize chain, so chunks concatenate
        to the fused program's output bit-for-bit away from fp reassociation."""
        c = self.cfg
        from ..ops import color as color_ops

        compute = jnp.dtype(c.compute_dtype)
        method = c.color_correction
        n = len(plan.cols)
        last = i == n - 1
        p_i = plan.cols[i] * plan.sf
        strip_lo = 0 if i == 0 else plan.emit[i - 1] - plan.halo
        strip_hi = p_i + plan.tw
        emit_lo = 0 if i == 0 else plan.emit[i - 1]
        emit_hi = plan.emit[i]
        cin_lo = max(0, emit_lo - (plan.halo if i else 0))
        cin_hi = min(true_w, emit_hi + (0 if last else plan.halo))
        ww = vae_tiling._edge_weights(plan.tw, plan.ramp, i == 0, last)

        def f(vae_params, up, tv, carry_acc=None, carry_cnt=None):
            z = up / c.vae.scaling_factor + c.vae.shifting_factor
            zt = z[:, :, :, plan.cols[i] : plan.cols[i] + plan.lt_w]
            dec = vae_tiling.slicing_decode(vae_params, c.vae, zt)
            w = jnp.asarray(ww, jnp.float32)[None, None, None, :, None]
            contrib = dec.astype(jnp.float32) * w
            width = strip_hi - strip_lo
            T2 = dec.shape[1]
            acc = jnp.zeros((1, T2, plan.th, width, dec.shape[-1]), jnp.float32)
            cnt = jnp.zeros((1, 1, plan.th, width, 1), jnp.float32)
            if carry_acc is not None:
                acc = acc.at[:, :, :, : carry_acc.shape[3]].set(carry_acc)
                cnt = cnt.at[:, :, :, : carry_cnt.shape[3]].set(carry_cnt)
            off = p_i - strip_lo
            acc = acc.at[:, :, :, off : off + plan.tw].add(contrib)
            cnt = cnt.at[:, :, :, off : off + plan.tw].add(
                jnp.broadcast_to(w[:, :1], (1, 1, plan.th, plan.tw, 1))
            )
            blended = (acc / jnp.clip(cnt, 1e-6)).astype(compute)
            a, b = cin_lo - strip_lo, cin_hi - strip_lo
            x = blended[:, :, :true_h, a:b].astype(jnp.float32)
            if method != "none":
                style = tv[None][:, :, :true_h, cin_lo:cin_hi]

                def one(cc, ss):
                    return color_ops.apply_color_correction(
                        method, cc.transpose(0, 3, 1, 2), ss.transpose(0, 3, 1, 2)
                    ).transpose(0, 2, 3, 1)

                x = jax.vmap(one)(x, style)
            out01 = jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
            if self._yuv_chunks_ok(plan, true_h):
                # each chunk covers absolute columns [emit_lo, emit_hi) —
                # even boundaries (gated) keep the 2x2 chroma blocks of
                # neighbouring chunks disjoint, so per-chunk packing equals
                # whole-frame packing bit-for-bit
                from ..ops.yuv import rgb01_to_yuv420

                seg = out01[0, :, :, emit_lo - cin_lo : emit_hi - cin_lo]
                chunk = rgb01_to_yuv420(seg, 8 if c.output_bits == 8 else 10)
            else:
                chunk = _pack_frames(out01, c.output_bits)[
                    0, :, :, emit_lo - cin_lo : emit_hi - cin_lo
                ]
            if last:
                return chunk
            klo = (plan.emit[i] - plan.halo) - strip_lo
            return chunk, acc[:, :, :, klo:], cnt[:, :, :, klo:]

        return f

    def _yuv_chunks_ok(self, plan, true_h: int) -> bool:
        """yuv420 chunk packing needs every emitted column range 2-aligned
        (chroma is 2x2-subsampled) and an even frame height; otherwise the
        chunks silently stay RGB and the writer converts on host."""
        return (
            self.cfg.output_pixfmt == "yuv420"
            and true_h % 2 == 0
            and all(int(e) % 2 == 0 for e in plan.emit)
        )

    def fused_batch_chunks(
        self,
        frames16: jnp.ndarray,  # [T', h_in, w_in, 3] uint8/f16 in [0, 1]
        true_h: int,
        true_w: int,
        noise_key,
        seed: int,
        plan,
    ):
        """Streamed sibling of fused_batch: one head executable
        (transform -> encode -> DiT) then one executable per decode column
        tile, each returning a finalized packed chunk plus the blend carry
        for its right neighbour. All programs dispatch asynchronously, so
        the host can fetch chunk i while tile i+1 (or the next batch's
        head) still computes — on a thin host link the output transfer
        hides under compute instead of serializing after it (the
        reference's CUDA equivalent is stream-overlapped D2H; here it is
        dispatch-queue overlap). Numerics match fused_batch: same blend,
        finalize, and pack chain per column (tests/test_pipeline.py).
        Returns [(col_lo, col_hi, device_chunk [T', true_h, w, 3])...]."""
        ck = self._cfg_key()
        key_head = ("chunk_head", ck, frames16.shape, true_h, true_w)
        head = self._fused_cache.get(key_head)
        if head is None:
            head = jax.jit(self._make_head_fn(frames16.shape, true_h, true_w))
            self._fused_cache[key_head] = head
        self.ensure_dit_resident()
        pa = self._plan_args(
            self._fused_thw(frames16.shape, False), int(self.text_pos.shape[1])
        )
        up, tv = head(
            self.dit_params, self.vae_params, frames16, self.text_pos,
            noise_key, batch_key(seed, "dit"), pa,
        )
        chunks = []
        carry = ()
        for i in range(len(plan.cols)):
            key = ("chunk", ck, frames16.shape, true_h, true_w, i)
            fn = self._fused_cache.get(key)
            if fn is None:
                fn = jax.jit(self._make_chunk_fn(plan, i, true_h, true_w))
                self._fused_cache[key] = fn
            out = fn(self.vae_params, up, tv, *carry)
            if i < len(plan.cols) - 1:
                chunk, acc, cnt = out
                carry = (acc, cnt)
            else:
                chunk = out
            chunks.append((0 if i == 0 else plan.emit[i - 1], plan.emit[i], chunk))
        okey = ("chunk_run", ck, frames16.shape, true_h, true_w)
        if okey not in self._oom_validated:
            _probe_first(chunks[-1][2])  # surface OOM before committing
            self._oom_validated.add(okey)
        return chunks

    # --------------------------- fused finalize ---------------------------- #

    def finalize_batch(
        self,
        decoded: jnp.ndarray,  # [1, T, H, W, 3] in [-1, 1] (device)
        ref_half,  # [T', h, w, 3] float16 in [0, 1], or pre-transformed
        ori: int,  # target-res frames when ref_transformed (phase-1 stash)
        true_h: int,
        true_w: int,
        ref_transformed: bool = False,
    ) -> jnp.ndarray:
        """Trim + color-fix + normalize + uint16 pack in ONE executable so
        only 2 bytes/px ever cross the host link (the dev-tunnel equivalent
        of minimizing PCIe traffic). Returns [ori, true_h, true_w, 3] u16."""
        method = self.cfg.color_correction
        key = (self._cfg_key(), method, decoded.shape,
               None if ref_half is None else ref_half.shape,
               ori, true_h, true_w, ref_transformed)
        fn = self._finalize_cache.get(key)
        if fn is None:
            cfg = self.cfg
            from ..ops import color as color_ops
            from ..ops.resize import pipeline_transform, to_f01

            def _fn(dec, ref):
                x = dec[0, :ori, :true_h, :true_w].astype(jnp.float32)
                if ref is not None and method != "none":
                    if ref_transformed:
                        style = ref.astype(jnp.float32)[:ori, :true_h, :true_w]
                    else:
                        style = pipeline_transform(
                            to_f01(ref), cfg.resolution, cfg.max_resolution
                        )[:ori, :true_h, :true_w]
                    content = x.transpose(0, 3, 1, 2)
                    style = style.transpose(0, 3, 1, 2)
                    x = color_ops.apply_color_correction(method, content, style)
                    x = x.transpose(0, 2, 3, 1)
                out01 = jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
                return _pack_frames(out01, cfg.output_bits)

            fn = jax.jit(_fn)
            self._finalize_cache[key] = fn
        return fn(decoded, ref_half)

    def upscale(self, latent: jnp.ndarray, seed: int) -> jnp.ndarray:
        """One-step diffusion upscale of a latent batch [B, t, h, w, C]
        (reference: generation_phases.py:654-758 per-batch loop body)."""
        self.ensure_dit_resident()
        thw = tuple(int(d) for d in latent.shape[1:4])
        txt_len = int(self.text_pos.shape[1])
        step = self._dit_step(thw, txt_len)
        rng = batch_key(seed, "dit")
        return step(
            self.dit_params, latent, self.text_pos, rng, self._plan_args(thw, txt_len)
        )

    def weight_bytes(self) -> int:
        """Resident bytes of DiT+VAE weights — feeds the run budget's free
        pool (pipeline/phases.py:_run_budget): a 7B whose int8 weights hold
        ~7.3GB of a 16GB chip changes the offload/stash answer."""
        total = 0
        for leaf in jax.tree.leaves((self.dit_params, self.vae_params)):
            nbytes = getattr(leaf, "nbytes", None)
            if nbytes is None and hasattr(leaf, "size"):
                nbytes = leaf.size * np.dtype(leaf.dtype).itemsize
            total += int(nbytes or 0)
        return total

    def discard_weights(self) -> None:
        """Free all HBM held by this runner WITHOUT a host copy — for cache
        eviction, where the runner is being thrown away (release_dit would
        device_get multi-GB of weights first; see phased residency below)."""
        self.dit_params = None
        self.vae_params = None
        self._dit_host = None
        self.invalidate_compiled()

    def invalidate_compiled(self) -> None:
        """Drop every per-shape compiled closure. Needed when ``cfg`` is
        replaced on a cached Runner (node layer cache hit with changed
        settings): the closures captured the old cfg at trace time."""
        self._dit_step_cache.clear()
        self._finalize_cache.clear()
        self._vae_cache.clear()
        self._fused_cache.clear()
        self._plan_args_cache.clear()
        self._oom_validated.clear()

    # ------------------------- phased weight residency ---------------------- #

    def ensure_dit_resident(self) -> None:
        if self.dit_params is None and self._dit_host is not None:
            self.dit_params = jax.tree.map(jnp.asarray, self._dit_host)
        if self.dit_params is None:
            raise RuntimeError(
                "Runner weights were discarded (cache eviction via "
                "discard_weights); reload the model through the loader "
                "instead of reusing the evicted runner"
            )

    def release_dit(self) -> None:
        """Drop DiT weights from HBM between phase 2 runs (the reference's
        phase-wise offload, memory_manager.py:1011-1097). No-op unless
        cfg.phased_weights."""
        if not self.cfg.phased_weights:
            return
        if self._dit_host is None and self.dit_params is not None:
            self._dit_host = jax.device_get(self.dit_params)
        self.dit_params = None
        self._dit_step_cache.clear()
