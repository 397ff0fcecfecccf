"""ComfyUI-compatible node layer.

Parity with the reference's four V3 nodes (reference: src/interfaces/
__init__.py:14-29, dit_model_loader.py, vae_model_loader.py,
torch_compile_settings.py, video_upscaler.py). The nodes are plain classes
with the same parameter names and the same dict-passing contract
(SEEDVR2_DIT / SEEDVR2_VAE config dicts into the upscaler node); when
ComfyUI is importable they register as real nodes, otherwise they work
standalone (e.g. for scripted pipelines).

CUDA-era knobs (blocks_to_swap, torch.compile settings) are accepted for
drop-in workflow compatibility and ignored — their TPU replacements
(GSPMD sharding, jax.jit) are always on.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .config import PipelineConfig, dit_3b, dit_7b, vae_config
from .io.registry import DEFAULT_DIT, DEFAULT_VAE, available_models, model_variant
from .utils.debug import Debug

_RUNNER_CACHE: Dict[str, Any] = {}


class SeedVR2LoadDiTModel:
    """Emit a SEEDVR2_DIT config dict (reference: dit_model_loader.py:136)."""

    CATEGORY = "SeedVR2"
    RETURN_TYPES = ("SEEDVR2_DIT",)
    FUNCTION = "execute"

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "model": (available_models("dit"), {"default": DEFAULT_DIT}),
                "device": (["tpu"], {"default": "tpu"}),
            },
            "optional": {
                "cache_model": ("BOOLEAN", {"default": False}),
                "blocks_to_swap": ("INT", {"default": 0}),  # ignored on TPU
                "attention_mode": (["pallas", "xla"], {"default": "pallas"}),
            },
        }

    def execute(
        self,
        model: str = DEFAULT_DIT,
        device: str = "tpu",
        cache_model: bool = False,
        blocks_to_swap: int = 0,
        attention_mode: str = "pallas",
        node_id: Optional[int] = None,
        **_ignored,
    ):
        return (
            {
                "model": model,
                "device": device,
                "cache_model": cache_model,
                "attention_mode": attention_mode,
                "node_id": node_id,
            },
        )


class SeedVR2LoadVAEModel:
    """Emit a SEEDVR2_VAE config dict (reference: vae_model_loader.py:165)."""

    CATEGORY = "SeedVR2"
    RETURN_TYPES = ("SEEDVR2_VAE",)
    FUNCTION = "execute"

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "model": (available_models("vae"), {"default": DEFAULT_VAE}),
                "device": (["tpu"], {"default": "tpu"}),
            },
            "optional": {
                "cache_model": ("BOOLEAN", {"default": False}),
                "encode_tiled": ("BOOLEAN", {"default": False}),
                "encode_tile_size": ("INT", {"default": 512}),
                "encode_tile_overlap": ("INT", {"default": 64}),
                "decode_tiled": ("BOOLEAN", {"default": False}),
                "decode_tile_size": ("INT", {"default": 512}),
                "decode_tile_overlap": ("INT", {"default": 64}),
            },
        }

    def execute(
        self,
        model: str = DEFAULT_VAE,
        device: str = "tpu",
        cache_model: bool = False,
        encode_tiled: bool = False,
        encode_tile_size: int = 512,
        encode_tile_overlap: int = 64,
        decode_tiled: bool = False,
        decode_tile_size: int = 512,
        decode_tile_overlap: int = 64,
        node_id: Optional[int] = None,
        **_ignored,
    ):
        return (
            {
                "model": model,
                "device": device,
                "cache_model": cache_model,
                "encode_tiled": encode_tiled,
                "encode_tile_size": (encode_tile_size, encode_tile_size),
                "encode_tile_overlap": (encode_tile_overlap, encode_tile_overlap),
                "decode_tiled": decode_tiled,
                "decode_tile_size": (decode_tile_size, decode_tile_size),
                "decode_tile_overlap": (decode_tile_overlap, decode_tile_overlap),
                "node_id": node_id,
            },
        )


class SeedVR2TorchCompileSettings:
    """Compatibility shim for the reference's compile node (reference:
    torch_compile_settings.py:97). jax.jit is always on; the dict is
    accepted and ignored."""

    CATEGORY = "SeedVR2"
    RETURN_TYPES = ("TORCH_COMPILE_ARGS",)
    FUNCTION = "execute"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {}, "optional": {"mode": (["default"], {"default": "default"})}}

    def execute(self, **kwargs):
        return (dict(kwargs),)


class SeedVR2VideoUpscaler:
    """Run the 4-phase pipeline (reference: video_upscaler.py:226-580).
    Progress weights match the reference: 0.2/0.25/0.5/0.05."""

    CATEGORY = "SeedVR2"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "execute"
    PHASE_WEIGHTS = (0.20, 0.25, 0.50, 0.05)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "images": ("IMAGE",),
                "dit": ("SEEDVR2_DIT",),
                "vae": ("SEEDVR2_VAE",),
                "resolution": ("INT", {"default": 1080}),
                "seed": ("INT", {"default": 42}),
            },
            "optional": {
                "max_resolution": ("INT", {"default": 0}),
                "batch_size": ("INT", {"default": 5}),
                "uniform_batch_size": ("BOOLEAN", {"default": False}),
                "temporal_overlap": ("INT", {"default": 0}),
                "prepend_frames": ("INT", {"default": 0}),
                "color_correction": (
                    ["wavelet", "lab", "hsv", "wavelet_adaptive", "adain", "none"],
                    {"default": "wavelet"},
                ),
                "input_noise_scale": ("FLOAT", {"default": 0.0}),
                "latent_noise_scale": ("FLOAT", {"default": 0.0}),
                "torch_compile_args": ("TORCH_COMPILE_ARGS",),
            },
        }

    def execute(
        self,
        images,
        dit: Dict[str, Any],
        vae: Dict[str, Any],
        resolution: int = 1080,
        seed: int = 42,
        max_resolution: int = 0,
        batch_size: int = 5,
        uniform_batch_size: bool = False,
        temporal_overlap: int = 0,
        prepend_frames: int = 0,
        color_correction: str = "wavelet",
        input_noise_scale: float = 0.0,
        latent_noise_scale: float = 0.0,
        torch_compile_args: Optional[Dict] = None,
        model_dir: str = "./models",
        progress_callback=None,
        enable_debug: bool = False,
        **_ignored,
    ):
        from .pipeline import phases

        debug = Debug(enable_debug)
        runner = self._get_runner(dit, vae, resolution, max_resolution, batch_size,
                                  uniform_batch_size, temporal_overlap, prepend_frames,
                                  seed, color_correction, input_noise_scale,
                                  latent_noise_scale, model_dir, debug)

        frames = np.asarray(images, np.float32)
        cb = self._weighted_progress(progress_callback) if progress_callback else None
        out = phases.generate(runner, frames, debug=debug, progress_callback=cb)
        return (out,)

    def _weighted_progress(self, cb):
        names = ["Phase 1: Encoding", "Phase 2: Upscaling", "Phase 3: Decoding", "Phase 4: Post-processing"]
        offsets = np.concatenate([[0.0], np.cumsum(self.PHASE_WEIGHTS)])

        def wrapped(cur, total, frames, phase_name):
            pi = names.index(phase_name) if phase_name in names else 0
            frac = offsets[pi] + self.PHASE_WEIGHTS[pi] * (cur / max(total, 1))
            cb(frac)

        return wrapped

    def _get_runner(self, dit, vae, resolution, max_resolution, batch_size,
                    uniform, overlap, prepend, seed, color, in_noise, lat_noise,
                    model_dir, debug):
        from .ops.attention import set_attention_backend
        from .pipeline.loader import load_runner

        set_attention_backend(dit.get("attention_mode", "pallas"))
        dit_name = dit["model"]
        dit_cfg = dit_7b() if model_variant(dit_name) == "7b" else dit_3b()
        cfg = PipelineConfig(
            dit=dit_cfg,
            vae=vae_config(),
            resolution=resolution,
            max_resolution=max_resolution,
            batch_size=batch_size,
            uniform_batch_size=uniform,
            temporal_overlap=overlap,
            prepend_frames=prepend,
            seed=seed,
            color_correction=color,
            input_noise_scale=in_noise,
            latent_noise_scale=lat_noise,
            encode_tiled=vae.get("encode_tiled", False),
            encode_tile_size=tuple(vae.get("encode_tile_size", (512, 512))),
            encode_tile_overlap=tuple(vae.get("encode_tile_overlap", (64, 64))),
            decode_tiled=vae.get("decode_tiled", False),
            decode_tile_size=tuple(vae.get("decode_tile_size", (512, 512))),
            decode_tile_overlap=tuple(vae.get("decode_tile_overlap", (64, 64))),
        )
        cache_key = f"{dit_name}+{vae['model']}"
        if dit.get("cache_model") and cache_key in _RUNNER_CACHE:
            runner = _RUNNER_CACHE[cache_key]
            runner.cfg = cfg
            return runner

        runner = load_runner(
            dit_model=dit_name,
            vae_model=vae["model"],
            model_dir=model_dir,
            cfg=cfg,
            debug=debug,
        )
        if dit.get("cache_model") or vae.get("cache_model"):
            _RUNNER_CACHE[cache_key] = runner
        return runner


NODE_CLASS_MAPPINGS = {
    "SeedVR2VideoUpscaler": SeedVR2VideoUpscaler,
    "SeedVR2LoadDiTModel": SeedVR2LoadDiTModel,
    "SeedVR2LoadVAEModel": SeedVR2LoadVAEModel,
    "SeedVR2TorchCompileSettings": SeedVR2TorchCompileSettings,
}

__all__ = list(NODE_CLASS_MAPPINGS) + ["NODE_CLASS_MAPPINGS"]
