"""MATLAB-bicubic resize invariants."""

import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.ops.resize import imresize


def test_constant_preserved():
    img = jnp.full((16, 16, 3), 0.7)
    out = np.asarray(imresize(img, 0.5))
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, 0.7, atol=1e-6)


def test_identity_scale():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((12, 12), dtype=np.float32))
    out = np.asarray(imresize(img, 1.0))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)


def test_linear_ramp_preserved_interior():
    """Cubic interpolation reproduces affine functions away from borders."""
    h = w = 32
    ramp = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
    up = np.asarray(imresize(jnp.asarray(ramp), 2.0, antialias=False))
    x = (np.arange(2 * w) + 0.5) / 2.0 - 0.5
    np.testing.assert_allclose(up[32, 4:-4], x[4:-4], atol=1e-4)


def test_downscale_antialias_averages():
    """2x downscale of a checkerboard approaches the mean with antialiasing."""
    cb = np.indices((32, 32)).sum(0) % 2
    out = np.asarray(imresize(jnp.asarray(cb.astype(np.float32)), 0.5))
    assert out.shape == (16, 16)
    assert abs(out[4:-4, 4:-4].mean() - 0.5) < 0.05
    assert out[4:-4, 4:-4].std() < 0.3


def test_batched_channels():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    out = imresize(img, 0.75)
    assert out.shape == (2, 12, 12, 3)
