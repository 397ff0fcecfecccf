"""seedvr2_tpu — a TPU-native (JAX/XLA/Pallas) one-step diffusion video upscaling framework.

A ground-up rebuild of the capabilities of numz/ComfyUI-SeedVR2_VideoUpscaler
(reference: /root/reference) designed for TPU hardware:

- NaDiT diffusion transformers (3B / 7B) with 3D shifted-window attention,
  mm/pixel RoPE, AdaLN-single modulation, SwiGLU/GELU MLPs — implemented as
  dense, statically-shaped, MXU-friendly JAX with a fused Pallas attention
  kernel (reference: src/models/dit_3b, src/models/dit_7b).
- Causal 3D video VAE (8x spatial / 4x temporal) with functional streaming
  state instead of module-held memory banks
  (reference: src/models/video_vae_v3/modules/attn_video_vae.py).
- Rectified-flow one-step sampling (reference: src/common/diffusion).
- 4-phase generation pipeline: encode -> upscale -> decode -> postprocess
  (reference: src/core/generation_phases.py).
- GSPMD mesh parallelism (data / sequence / tensor axes) replacing the
  reference's multi-process NCCL fan-out and BlockSwap offload.
"""

__version__ = "0.1.0"


def load_runner(*args, **kwargs):
    """Convenience re-export of seedvr2_tpu.pipeline.loader.load_runner."""
    from .pipeline.loader import load_runner as _lr

    return _lr(*args, **kwargs)


def generate(*args, **kwargs):
    """Convenience re-export of seedvr2_tpu.pipeline.phases.generate."""
    from .pipeline.phases import generate as _g

    return _g(*args, **kwargs)
