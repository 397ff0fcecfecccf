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


def test_enabled_for():
    from seedvr2_tpu.ops.conv3d_kernel import set_conv_backend

    set_conv_backend("pallas")
    assert enabled_for((3, 3, 3, 128, 128), (1, 1, 1))
    assert not enabled_for((1, 3, 3, 128, 128), (1, 1, 1))
    assert not enabled_for((3, 3, 3, 128, 128), (2, 2, 2))
    assert not enabled_for((3, 3, 3, 3, 128), (1, 1, 1))
    set_conv_backend("xla")
    assert not enabled_for((3, 3, 3, 128, 128), (1, 1, 1))
