"""Pallas conv3d kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.ops.conv3d_kernel import conv3d_3x3x3, conv3d_3x3x3_im2col, enabled_for


def _ref_conv(x_ext, w, b):
    out = jax.lax.conv_general_dilated(
        x_ext, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x_ext.dtype)
    return out + b


@pytest.mark.parametrize("shape", [(1, 4, 16, 256, 128, 128), (1, 2, 10, 130, 128, 256)])
def test_matches_xla(shape):
    B, T, H, W, Cin, Cout = shape
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (B, T + 2, H, W, Cin), jnp.float32) * 0.5
    w = jax.random.normal(k2, (3, 3, 3, Cin, Cout), jnp.float32) * 0.05
    b = jax.random.normal(k3, (Cout,), jnp.float32) * 0.1
    ref = _ref_conv(x, w, b)
    out = conv3d_3x3x3(x, w, b, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("shape", [(1, 2, 16, 256, 128, 128), (1, 1, 6, 130, 256, 128)])
def test_im2col_matches_xla(shape):
    B, T, H, W, Cin, Cout = shape
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (B, T + 2, H, W, Cin), jnp.float32) * 0.5
    w = jax.random.normal(k2, (3, 3, 3, Cin, Cout), jnp.float32) * 0.05
    b = jax.random.normal(k3, (Cout,), jnp.float32) * 0.1
    ref = _ref_conv(x, w, b)
    out = conv3d_3x3x3_im2col(x, w, b, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("shape", [(1, 3, 16, 256, 128, 128), (2, 2, 10, 130, 256, 128)])
def test_fused_gn_silu_matches_separate(shape):
    """conv3d_3x3x3 with scale/shift tables == silu(group_norm(x)) then the
    plain conv, with SAME zero padding applied to the NORMALIZED tensor
    (ops/conv3d_kernel.py:_kernel_gn halo masking)."""
    from seedvr2_tpu.ops.conv3d_kernel import gn_silu_tables
    from seedvr2_tpu.ops.normalization import group_norm

    B, T, H, W, Cin, Cout = shape
    groups = 32
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(ks[0], (B, T + 2, H, W, Cin), jnp.float32) * 0.7 + 0.3
    w = jax.random.normal(ks[1], (3, 3, 3, Cin, Cout), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (Cout,), jnp.float32) * 0.1
    gw = 1.0 + jax.random.normal(ks[3], (Cin,), jnp.float32) * 0.2
    gb = jax.random.normal(ks[4], (Cin,), jnp.float32) * 0.2

    xn = group_norm(x.reshape(B * (T + 2), H, W, Cin), groups, gw, gb, eps=1e-6)
    xn = jax.nn.silu(xn).reshape(B, T + 2, H, W, Cin)
    ref = _ref_conv(xn, w, b)

    sc, sf = gn_silu_tables(x, gw, gb, groups)
    out = conv3d_3x3x3(x, w, b, interpret=True, scale=sc, shift=sf)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4, rtol=1e-3)


def test_resnet_gn_fusion_streaming_matches_full():
    """The raw-carry streaming semantics of gn= (causal_conv.py): running a
    clip in one shot vs init+active slices must agree — per-frame GroupNorm
    commutes with temporal concatenation."""
    from seedvr2_tpu.models.vae.causal_conv import StreamCtx, causal_conv3d

    Cin, Cout, groups = 128, 128, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(ks[0], (1, 7, 12, 130, Cin), jnp.float32)
    p = {
        "w": jax.random.normal(ks[1], (3, 3, 3, Cin, Cout), jnp.float32) * 0.05,
        "b": jax.random.normal(ks[2], (Cout,), jnp.float32) * 0.1,
    }
    gn = (
        {"w": jnp.ones((Cin,), jnp.float32), "b": jnp.zeros((Cin,), jnp.float32)},
        groups,
    )
    full = causal_conv3d(p, x, StreamCtx("disabled"), "c", gn=gn)
    ctx1 = StreamCtx("init")
    o1 = causal_conv3d(p, x[:, :3], ctx1, "c", gn=gn)
    ctx2 = StreamCtx("active", ctx1.out_state)
    o2 = causal_conv3d(p, x[:, 3:], ctx2, "c", gn=gn)
    sliced = jnp.concatenate([o1, o2], axis=1)
    np.testing.assert_allclose(np.asarray(sliced), np.asarray(full), atol=3e-4, rtol=1e-3)


def test_enabled_for():
    from seedvr2_tpu.ops.conv3d_kernel import set_conv_backend

    set_conv_backend("pallas")
    assert enabled_for((3, 3, 3, 128, 128), (1, 1, 1))
    assert not enabled_for((1, 3, 3, 128, 128), (1, 1, 1))
    assert not enabled_for((3, 3, 3, 128, 128), (2, 2, 2))
    assert not enabled_for((3, 3, 3, 3, 128), (1, 1, 1))
    set_conv_backend("xla")
    assert not enabled_for((3, 3, 3, 128, 128), (1, 1, 1))
