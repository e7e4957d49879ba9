"""Patch crop/stitch round trips and corruption masks."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.ops.corruption import (
    mask_block,
    mask_sequence,
    mask_spatial,
    mask_temporal,
)
from adaptivepnp_sci_tpu.ops.patches import (
    crop_patches,
    random_crop,
    stitch_patches,
    strided_patches,
)


def test_crop_stitch_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 32, 48, 3), dtype=np.float32))
    tiles, grid = crop_patches(x, 16)
    assert tiles.shape == (6, 2, 16, 16, 3) and grid == (2, 3)
    back = stitch_patches(tiles, grid)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_strided_patches_values(rng):
    x = jnp.asarray(rng.random((20, 20, 1), dtype=np.float32))
    p = strided_patches(x, 8, 4)
    assert p.shape == (16, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(p[0]), np.asarray(x[:8, :8]))
    np.testing.assert_array_equal(np.asarray(p[1]), np.asarray(x[:8, 4:12]))


def test_random_crop_shape(rng):
    x = jnp.asarray(rng.random((4, 20, 20, 3), dtype=np.float32))
    c = random_crop(jax.random.PRNGKey(0), x, 8)
    assert c.shape == (4, 8, 8, 3)


def test_mask_spatial_drops_center_frame_only(rng):
    x = jnp.ones((1, 5, 16, 16, 3), jnp.float32)
    out = mask_spatial(jax.random.PRNGKey(0), x, ratio=0.5)
    assert np.asarray(out[:, 2]).min() < 1e-5          # center corrupted
    np.testing.assert_array_equal(np.asarray(out[:, 0]), 1.0)  # others intact
    frac = float((np.asarray(out[:, 2]) < 1e-5).mean())
    assert 0.3 < frac < 0.7


def test_mask_temporal():
    x = jnp.ones((2, 5, 8, 8, 3))
    out = mask_temporal(x)
    np.testing.assert_allclose(np.asarray(out[:, 2]), 1e-6)
    np.testing.assert_array_equal(np.asarray(out[:, 1]), 1.0)


def test_mask_block_and_sequence():
    x = jnp.ones((1, 5, 16, 16, 3))
    out = mask_block(jax.random.PRNGKey(1), x, ratio=0.1)
    frac = float((np.asarray(out) < 1e-5).mean())
    assert 0.05 < frac < 0.2
    outs = mask_sequence(jax.random.PRNGKey(2), x, ("s", "t", "b"))
    assert len(outs) == 3
