"""Tests for Bayer pack/unpack, CFA masks, mosaicing, and layout converters."""

import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.ops import bayer


def test_pack_matches_strided_slicing(rng):
    x = rng.random((8, 16, 20), dtype=np.float32)  # (B, H, W)
    packed = np.asarray(bayer.pack(jnp.asarray(x)))
    for ib, (a, b) in enumerate(bayer.BAYER_OFFSETS):
        np.testing.assert_array_equal(packed[:, ib], x[:, a::2, b::2])


def test_pack_unpack_roundtrip(rng):
    x = rng.random((3, 8, 12, 16), dtype=np.float32)
    out = np.asarray(bayer.unpack(bayer.pack(jnp.asarray(x))))
    np.testing.assert_array_equal(out, x)


def test_pack_2d_input(rng):
    y = rng.random((16, 16), dtype=np.float32)
    packed = np.asarray(bayer.pack(jnp.asarray(y)))
    assert packed.shape == (4, 8, 8)
    np.testing.assert_array_equal(packed[3], y[1::2, 1::2])


def test_cfa_masks_rggb():
    m = bayer.cfa_masks((4, 4), "RGGB")
    assert m.shape == (4, 4, 3)
    # exactly one channel active per pixel
    np.testing.assert_array_equal(m.sum(-1), np.ones((4, 4)))
    assert m[0, 0, 0] and m[0, 1, 1] and m[1, 0, 1] and m[1, 1, 2]


def test_cfa_masks_all_patterns():
    for pattern in ("RGGB", "BGGR", "GRBG", "GBRG"):
        m = bayer.cfa_masks((6, 6), pattern)
        np.testing.assert_array_equal(m.sum(-1), np.ones((6, 6)))
        # green always occupies half the sites
        assert m[..., 1].sum() == 18


def test_mosaic_matches_masked_sum(rng):
    rgb = rng.random((2, 8, 8, 3), dtype=np.float32)
    got = np.asarray(bayer.mosaic(jnp.asarray(rgb)))
    m = bayer.cfa_masks((8, 8))
    np.testing.assert_allclose(got, (rgb * m).sum(-1), rtol=1e-6)


def test_rggb_subsample_equals_reference_indexing(rng):
    """theta-update re-mosaicking: R@(0::2,0::2), G@(0::2,1::2)&(1::2,0::2), B@(1::2,1::2)."""
    rgb = rng.random((5, 8, 8, 3), dtype=np.float32)
    got = np.asarray(bayer.rggb_subsample(jnp.asarray(rgb)))
    np.testing.assert_array_equal(got[:, 0], rgb[:, 0::2, 0::2, 0])
    np.testing.assert_array_equal(got[:, 1], rgb[:, 0::2, 1::2, 1])
    np.testing.assert_array_equal(got[:, 2], rgb[:, 1::2, 0::2, 1])
    np.testing.assert_array_equal(got[:, 3], rgb[:, 1::2, 1::2, 2])


def test_embed_rgb_sparse_placement(rng):
    mosaic_img = rng.random((2, 6, 6), dtype=np.float32)
    rgb = np.asarray(bayer.embed_rgb(jnp.asarray(mosaic_img)))
    assert rgb.shape == (2, 6, 6, 3)
    np.testing.assert_array_equal(rgb.sum(-1), mosaic_img)  # one channel/pixel
    np.testing.assert_array_equal(rgb[:, 0::2, 0::2, 0], mosaic_img[:, 0::2, 0::2])
    assert rgb[:, 0::2, 0::2, 1:].sum() == 0


def test_mosaic_of_embed_is_identity(rng):
    m = rng.random((3, 8, 8), dtype=np.float32)
    out = np.asarray(bayer.mosaic(bayer.embed_rgb(jnp.asarray(m))))
    np.testing.assert_allclose(out, m, rtol=1e-6)
