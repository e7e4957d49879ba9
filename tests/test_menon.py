"""Menon2007 demosaic: golden values from the reference package's published
doctest examples (menon2007.py docstrings) + structural invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.ops import bayer
from adaptivepnp_sci_tpu.ops.menon2007 import menon2007

# doctest input/output pairs from the vendored colour-demosaicing package
_CFA_RGGB = np.array(
    [[0.30980393, 0.36078432, 0.30588236, 0.3764706],
     [0.35686275, 0.39607844, 0.36078432, 0.40000001]], np.float32)

_EXPECTED_RGGB = np.array(
    [[[0.30980393, 0.35686275, 0.39215687],
      [0.30980393, 0.36078432, 0.39607844],
      [0.30588236, 0.36078432, 0.39019608],
      [0.32156864, 0.3764706, 0.40000001]],
     [[0.30980393, 0.35686275, 0.39215687],
      [0.30980393, 0.36078432, 0.39607844],
      [0.30588236, 0.36078432, 0.39019609],
      [0.32156864, 0.3764706, 0.40000001]]], np.float32)

# float64: the H/V classifier for this example ties at ~1.5e-8, so the
# input must carry full doctest precision
_CFA_BGGR = np.array(
    [[0.3764706, 0.36078432, 0.40784314, 0.3764706],
     [0.35686275, 0.30980393, 0.36078432, 0.29803923]], np.float64)

_EXPECTED_BGGR = np.array(
    [[[0.30588236, 0.35686275, 0.3764706],
      [0.30980393, 0.36078432, 0.39411766],
      [0.29607844, 0.36078432, 0.40784314],
      [0.29803923, 0.3764706, 0.42352942]],
     [[0.30588236, 0.35686275, 0.3764706],
      [0.30980393, 0.36078432, 0.39411766],
      [0.29607844, 0.36078432, 0.40784314],
      [0.29803923, 0.3764706, 0.42352942]]], np.float32)


def test_menon_doctest_rggb():
    got = np.asarray(menon2007(jnp.asarray(_CFA_RGGB)[None]))[0]
    np.testing.assert_allclose(got, _EXPECTED_RGGB, atol=2e-7)


def test_menon_doctest_bggr():
    # the H/V classifier ties within fp32 eps on this tiny example; run the
    # golden comparison in float64 like the reference
    with jax.enable_x64(True):
        got = np.asarray(
            menon2007(jnp.asarray(_CFA_BGGR, jnp.float64)[None], pattern="BGGR")
        )[0]
    np.testing.assert_allclose(got, _EXPECTED_BGGR, atol=2e-7)


def test_menon_preserves_sampled_sites(rng):
    cfa = rng.random((1, 8, 8), dtype=np.float32)
    out = np.asarray(menon2007(jnp.asarray(cfa), refining_step=False))[0]
    m = bayer.cfa_masks((8, 8))
    np.testing.assert_allclose((out * m).sum(-1), cfa[0], rtol=1e-6)


def test_menon_constant_scene_identity():
    rgb = np.full((2, 16, 16, 3), 0.5, np.float32)
    cfa = np.asarray(bayer.mosaic(jnp.asarray(rgb)))
    out = np.asarray(menon2007(jnp.asarray(cfa)))
    np.testing.assert_allclose(out, rgb, atol=1e-6)


def test_menon_beats_nothing_on_smooth_gradient(rng):
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w] / h
    rgb = np.stack([yy, (yy + xx) / 2, xx], -1).astype(np.float32)[None]
    cfa = np.asarray(bayer.mosaic(jnp.asarray(rgb)))
    out = np.asarray(menon2007(jnp.asarray(cfa)))
    err = np.abs(out - rgb)[:, 4:-4, 4:-4]
    assert err.max() < 0.02
