"""Property-based invariant tests (hypothesis) for the core ops.

The fixed-seed oracle tests pin exact values; these pin the ALGEBRA the
solver depends on, over randomized shapes/contents:

  * <At(y), x> == <y, A(x)>          (adjointness — x-update correctness)
  * unpack(pack(x)) == x             (Bayer packing is a bijection)
  * CFA masks partition every pixel  (mosaic loses nothing but color)
  * data-consistent iterates are x-update fixed points (GAP + ADMM)
  * TV prox does not increase the ROF objective
  * mosaic/embed/rggb_subsample consistency

Shapes are drawn from small even sizes so jit recompiles stay bounded.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from adaptivepnp_sci_tpu.ops import bayer, physics

SIZES = st.sampled_from([4, 6, 8])
FRAMES = st.sampled_from([2, 4])
SEEDS = st.integers(0, 2**31 - 1)

COMMON = dict(max_examples=20, deadline=None)


def _rng_arrays(seed, b, h, w):
    rng = np.random.default_rng(seed)
    x = rng.random((b, h, w)).astype(np.float32)
    phi = (rng.random((b, h, w)) > 0.5).astype(np.float32)
    y = rng.random((h, w)).astype(np.float32)
    return x, phi, y


@settings(**COMMON)
@given(SEEDS, FRAMES, SIZES, SIZES)
def test_forward_adjoint_are_adjoint(seed, b, h, w):
    x, phi, y = _rng_arrays(seed, b, h, w)
    lhs = float(jnp.vdot(physics.adjoint(jnp.asarray(y), phi), x))
    rhs = float(jnp.vdot(jnp.asarray(y), physics.forward(jnp.asarray(x), phi)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


@settings(**COMMON)
@given(SEEDS, FRAMES, SIZES, SIZES)
def test_pack_unpack_roundtrip(seed, b, h, w):
    x, _, _ = _rng_arrays(seed, b, 2 * h, 2 * w)
    np.testing.assert_array_equal(
        np.asarray(bayer.unpack(bayer.pack(jnp.asarray(x)))), x
    )


@settings(**COMMON)
@given(SIZES, SIZES, st.sampled_from(["RGGB", "BGGR", "GRBG", "GBRG"]))
def test_cfa_masks_partition_of_unity(h, w, pattern):
    m = bayer.cfa_masks((2 * h, 2 * w), pattern)
    np.testing.assert_array_equal(m.sum(-1), np.ones((2 * h, 2 * w)))


@settings(**COMMON)
@given(SEEDS, FRAMES, SIZES, SIZES)
def test_data_consistent_fixed_points(seed, b, h, w):
    """If theta already explains the measurement (y = A(theta), duals 0),
    both x-updates must return theta unchanged."""
    x, phi, _ = _rng_arrays(seed, b, h, w)
    x, phi = jnp.asarray(x), jnp.asarray(phi)
    y = physics.forward(x, phi)
    ps = physics.phi_sum(phi)
    zero = jnp.zeros_like(x)
    gap = physics.gap_x_update(x, zero, y, phi, ps)
    np.testing.assert_allclose(np.asarray(gap), np.asarray(x),
                               rtol=1e-5, atol=1e-6)
    admm = physics.admm_x_update(x, zero, y, phi, ps, rho=1.0, alpha=1.0)
    np.testing.assert_allclose(np.asarray(admm), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


@settings(**COMMON)
@given(SEEDS, SIZES, SIZES)
def test_mosaic_embed_consistency(seed, h, w):
    """mosaic(embed_rgb(bayer)) == bayer; rggb_subsample puts each color's
    parity-site samples in the right plane (independent NumPy slicing — not
    a re-derivation through the same ops)."""
    rng = np.random.default_rng(seed)
    mosaic_img = rng.random((2 * h, 2 * w)).astype(np.float32)
    back = bayer.mosaic(bayer.embed_rgb(jnp.asarray(mosaic_img)))
    np.testing.assert_allclose(np.asarray(back), mosaic_img, rtol=1e-6)

    rgb = rng.random((2 * h, 2 * w, 3)).astype(np.float32)
    planes = np.asarray(bayer.rggb_subsample(jnp.asarray(rgb)))
    # RGGB: R at (even,even) ch0, G at (even,odd)+(odd,even) ch1, B (odd,odd) ch2
    np.testing.assert_allclose(planes[0], rgb[0::2, 0::2, 0], rtol=1e-6)
    np.testing.assert_allclose(planes[1], rgb[0::2, 1::2, 1], rtol=1e-6)
    np.testing.assert_allclose(planes[2], rgb[1::2, 0::2, 1], rtol=1e-6)
    np.testing.assert_allclose(planes[3], rgb[1::2, 1::2, 2], rtol=1e-6)


def _rof_energy(out, inp, weight):
    gy = np.diff(out, axis=0, append=out[-1:, :])
    gx = np.diff(out, axis=1, append=out[:, -1:])
    tv = np.sqrt(gy**2 + gx**2).sum()
    return 0.5 * ((out - inp) ** 2).sum() + weight * tv


@settings(max_examples=10, deadline=None)
@given(SEEDS, st.floats(0.02, 0.3))
def test_tv_prox_does_not_increase_rof_energy(seed, weight):
    from adaptivepnp_sci_tpu.ops.tv import tv_chambolle_2d

    rng = np.random.default_rng(seed)
    img = rng.random((16, 16)).astype(np.float32)
    out = np.asarray(tv_chambolle_2d(jnp.asarray(img), weight=weight,
                                     max_iter=30))
    assert _rof_energy(out, img, weight) <= _rof_energy(img, img, weight) + 1e-4
