"""Deterministic seeding.

The reference reseeds torch/np/random before every batch so identical inputs
give identical outputs regardless of batch position (reference:
src/common/seed.py:23-29, generation_phases.py:661-664). JAX PRNG is
functional, so the equivalent is deriving fresh keys from the same integers.
"""

from __future__ import annotations

import jax


def batch_key(seed: int, purpose: str = "dit") -> jax.Array:
    """Key for a generation batch. Reference semantics: the *same* seed per
    batch (reset each batch), and seed + 1_000_000 for VAE sampling
    (reference: generation_phases.py:326-331)."""
    offset = {"dit": 0, "vae": 1_000_000, "input_noise": 2_000_000}[purpose]
    return jax.random.PRNGKey(seed + offset)


def noise_pair(seed: int, shape, dtype):
    """(base_noise, aug_noise) as in phase 2: aug = 0.1*base + 0.05*fresh
    (reference: generation_phases.py:680-683)."""
    k = batch_key(seed, "dit")
    k1, k2 = jax.random.split(k)
    base = jax.random.normal(k1, shape, dtype)
    aug = base * 0.1 + jax.random.normal(k2, shape, dtype) * 0.05
    return base, aug
