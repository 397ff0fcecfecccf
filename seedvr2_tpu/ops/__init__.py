from . import attention, blending, color, normalization, resize, rope  # noqa: F401
