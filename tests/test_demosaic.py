"""Golden tests for demosaicing: NumPy oracle built from the published
Malvar-He-Cutler (ICASSP 2004) kernels + structural invariants."""

import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.ops import bayer, demosaic


def _reflect_conv(img, kern):
    """scipy-free 2-D cross-correlation with reflect padding."""
    kh, kw = kern.shape
    ph, pw = kh // 2, kw // 2
    pad = np.pad(img, ((ph, ph), (pw, pw)), mode="reflect")
    out = np.zeros_like(img, dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kern[i, j] * pad[i : i + img.shape[0], j : j + img.shape[1]]
    return out


def numpy_malvar(cfa):
    """Independent NumPy Malvar2004 for RGGB."""
    h, w = cfa.shape
    m = bayer.cfa_masks((h, w), "RGGB")
    r_m, g_m, b_m = m[..., 0], m[..., 1], m[..., 2]

    gr_gb = np.array(
        [[0, 0, -1, 0, 0], [0, 0, 2, 0, 0], [-1, 2, 4, 2, -1],
         [0, 0, 2, 0, 0], [0, 0, -1, 0, 0]], np.float64) / 8
    rg1 = np.array(
        [[0, 0, 0.5, 0, 0], [0, -1, 0, -1, 0], [-1, 4, 5, 4, -1],
         [0, -1, 0, -1, 0], [0, 0, 0.5, 0, 0]], np.float64) / 8
    rg2 = rg1.T
    rb = np.array(
        [[0, 0, -1.5, 0, 0], [0, 2, 0, 2, 0], [-1.5, 0, 6, 0, -1.5],
         [0, 2, 0, 2, 0], [0, 0, -1.5, 0, 0]], np.float64) / 8

    g = np.where(r_m | b_m, _reflect_conv(cfa, gr_gb), cfa * g_m)
    c1 = _reflect_conv(cfa, rg1)
    c2 = _reflect_conv(cfa, rg2)
    c3 = _reflect_conv(cfa, rb)

    rr = r_m.any(1)[:, None] * np.ones((1, w), bool)
    rc = r_m.any(0)[None] * np.ones((h, 1), bool)
    br = b_m.any(1)[:, None] * np.ones((1, w), bool)
    bc = b_m.any(0)[None] * np.ones((h, 1), bool)

    r = cfa * r_m
    b = cfa * b_m
    r = np.where(rr & bc, c1, r)
    r = np.where(br & rc, c2, r)
    b = np.where(br & rc, c1, b)
    b = np.where(rr & bc, c2, b)
    r = np.where(br & bc, c3, r)
    b = np.where(rr & rc, c3, b)
    return np.stack([r, g, b], -1)


def test_malvar_matches_numpy_oracle(rng):
    cfa = rng.random((3, 16, 20), dtype=np.float32)
    got = np.asarray(demosaic.malvar2004(jnp.asarray(cfa)))
    for i in range(3):
        np.testing.assert_allclose(got[i], numpy_malvar(cfa[i]), rtol=1e-4, atol=1e-5)


def test_malvar_preserves_sampled_sites(rng):
    cfa = rng.random((1, 8, 8), dtype=np.float32)
    out = np.asarray(demosaic.malvar2004(jnp.asarray(cfa)))[0]
    m = bayer.cfa_masks((8, 8))
    # the demosaicked image must keep the measured CFA samples exactly
    np.testing.assert_allclose((out * m).sum(-1), cfa[0], rtol=1e-6)


def test_malvar_constant_scene_identity():
    """A flat gray scene mosaics and demosaics back to itself exactly."""
    rgb = np.full((2, 16, 16, 3), 0.5, np.float32)
    cfa = np.asarray(bayer.mosaic(jnp.asarray(rgb)))
    out = np.asarray(demosaic.malvar2004(jnp.asarray(cfa)))
    np.testing.assert_allclose(out, rgb, atol=1e-6)


def test_bilinear_constant_scene_identity():
    rgb = np.full((1, 16, 16, 3), 0.25, np.float32)
    cfa = np.asarray(bayer.mosaic(jnp.asarray(rgb)))
    out = np.asarray(demosaic.bilinear(jnp.asarray(cfa)))
    np.testing.assert_allclose(out, rgb, atol=1e-6)


def test_malvar_smooth_gradient_low_error(rng):
    """On a smooth scene the interpolation error is small away from borders."""
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w] / h
    rgb = np.stack([yy, (yy + xx) / 2, xx], -1).astype(np.float32)[None]
    cfa = np.asarray(bayer.mosaic(jnp.asarray(rgb)))
    out = np.asarray(demosaic.malvar2004(jnp.asarray(cfa)))
    err = np.abs(out - rgb)[:, 4:-4, 4:-4]
    assert err.max() < 0.02
