"""Attention: Pallas kernel (interpret mode on CPU) vs XLA reference, plus
masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.ops.attention import attention_xla, get_attention_backend, set_attention_backend
from seedvr2_tpu.ops.flash_attention import flash_attention


def _qkv(B=3, S=70, H=2, D=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
    return q, k, v


def test_xla_attention_matches_manual():
    q, k, v = _qkv(B=1, S=8, H=1, D=4)
    out = attention_xla(q, k, v)
    qm, km, vm = (np.asarray(x)[0, :, 0] for x in (q, k, v))
    s = qm @ km.T / np.sqrt(4)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], p @ vm, atol=1e-5)


def test_masked_keys_ignored():
    q, k, v = _qkv(S=16)
    valid = jnp.ones((3, 16), bool).at[:, 10:].set(False)
    out_masked = attention_xla(q, k, v, kv_valid=valid)
    out_trunc = attention_xla(q[:, :16], k[:, :10], v[:, :10])
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc), atol=1e-5)


def test_pallas_matches_xla():
    q, k, v = _qkv(S=70)
    valid = jnp.ones((3, 70), bool).at[1, 50:].set(False)
    ref = attention_xla(q, k, v, kv_valid=valid)
    out = flash_attention(q, k, v, kv_valid=valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_bf16():
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(S=40, seed=1))
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_backend_switch():
    set_attention_backend("flash_attn_2")
    assert get_attention_backend() == "pallas"
    set_attention_backend("sdpa")
    assert get_attention_backend() == "xla"
