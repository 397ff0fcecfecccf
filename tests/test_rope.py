"""RoPE numerics: independent torch re-derivation of the
rotary_embedding_torch semantics used by the reference (lang + pixel axial
frequencies, GPT-J interleaved rotation) vs our numpy/jnp implementation."""

import jax.numpy as jnp
import numpy as np
import torch

from seedvr2_tpu.ops import rope as R


def torch_rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x.unbind(-1)
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


def torch_apply_rotary(freqs, t):
    rot = freqs.shape[-1]
    t_mid, t_right = t[..., :rot], t[..., rot:]
    out = t_mid * freqs.cos() + torch_rotate_half(t_mid) * freqs.sin()
    return torch.cat([out, t_right], dim=-1)


def torch_lang_axial_freqs(dims, per_axis_dim, theta=10000.0, offsets=None):
    """Independent implementation of RotaryEmbedding(freqs_for='lang')
    .get_axial_freqs with integer positions (+offset)."""
    half = per_axis_dim // 2
    base = 1.0 / (theta ** (torch.arange(0, per_axis_dim, 2).float() / per_axis_dim))
    offsets = offsets or [0] * len(dims)
    all_freqs = []
    for ax, d in enumerate(dims):
        pos = torch.arange(d).float() + offsets[ax]
        f = torch.einsum("p,f->pf", pos, base)
        f = f.repeat_interleave(2, dim=-1)
        shape = [1] * len(dims) + [per_axis_dim]
        shape[ax] = d
        all_freqs.append(f.reshape(shape).expand(*dims, per_axis_dim))
    return torch.cat(all_freqs, dim=-1)


def torch_pixel_axial_freqs(dims, per_axis_dim, max_freq=256.0):
    half = per_axis_dim // 2
    base = torch.linspace(1.0, max_freq / 2, half) * torch.pi
    all_freqs = []
    for ax, d in enumerate(dims):
        pos = torch.linspace(-1, 1, d) if d > 1 else torch.tensor([-1.0])
        f = torch.einsum("p,f->pf", pos, base)
        f = f.repeat_interleave(2, dim=-1)
        shape = [1] * len(dims) + [per_axis_dim]
        shape[ax] = d
        all_freqs.append(f.reshape(shape).expand(*dims, per_axis_dim))
    return torch.cat(all_freqs, dim=-1)


def test_lang_axial_freqs_match():
    ours = R.axial_freqs_lang((3, 4, 5), 14, offsets=(7, 0, 0))
    theirs = torch_lang_axial_freqs((3, 4, 5), 14, offsets=[7, 0, 0]).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_pixel_axial_freqs_match():
    ours = R.axial_freqs_pixel((2, 5, 7), 20)
    theirs = torch_pixel_axial_freqs((2, 5, 7), 20).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)


def test_apply_rotary_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 16).astype(np.float32)
    ang = rng.randn(10, 12).astype(np.float32)
    ours = np.asarray(R.apply_rotary(jnp.asarray(x), jnp.asarray(ang)))
    theirs = torch_apply_rotary(torch.from_numpy(ang), torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_rotation_preserves_norm():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 8, 32).astype(np.float32))
    # real rope angles are pair-repeated ([f0,f0,f1,f1,...]) — only then is
    # the transform a true rotation
    ang = jnp.asarray(np.repeat(rng.randn(8, 16).astype(np.float32), 2, axis=-1))
    y = R.apply_rotary(x, ang)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), np.linalg.norm(np.asarray(y), axis=-1), rtol=1e-4
    )


def test_mmrope_layout():
    """3B mmrope: vid temporal positions offset by txt_len; txt angles tiled
    across the three axes (reference: dit_3b/rope.py:170-176)."""
    vid, txt = R.mmrope3d_freqs((2, 3, 4), txt_len=5, rope_dim=128)
    per = 42
    assert vid.shape == (24, 126) and txt.shape == (5, 126)
    # txt angles identical in each of the 3 axis groups
    np.testing.assert_allclose(txt[:, :per], txt[:, per : 2 * per])
    np.testing.assert_allclose(txt[:, :per], txt[:, 2 * per :])
    # vid temporal angle at t=0 equals txt angle at position txt_len
    full = torch_lang_axial_freqs((7, 3, 4), per).numpy()  # positions 0..6
    np.testing.assert_allclose(
        vid[:, :per].reshape(2, 3, 4, per), full[5:7, :, :, :per], rtol=1e-5
    )
