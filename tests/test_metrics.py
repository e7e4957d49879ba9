"""PSNR/SSIM parity vs direct NumPy evaluations of the definitions."""

import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.ops import metrics


def test_psnr_formula(rng):
    a = rng.random((32, 32), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    got = float(metrics.psnr(jnp.asarray(a), jnp.asarray(b)))
    want = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    assert abs(got - want) < 1e-3


def test_psnr_identical_images_is_large():
    a = jnp.full((8, 8), 0.5)
    assert float(metrics.psnr(a, a)) > 100


def numpy_ssim(x, y, data_range=1.0, win=7):
    """Direct (slow) evaluation of the SSIM definition with a uniform window."""
    from itertools import product

    h, w = x.shape
    pad = win // 2
    ndp = win * win
    cov_norm = ndp / (ndp - 1)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    vals = []
    for i, j in product(range(pad, h - pad), range(pad, w - pad)):
        px = x[i - pad : i + pad + 1, j - pad : j + pad + 1].astype(np.float64)
        py = y[i - pad : i + pad + 1, j - pad : j + pad + 1].astype(np.float64)
        ux, uy = px.mean(), py.mean()
        vx = cov_norm * (np.mean(px * px) - ux * ux)
        vy = cov_norm * (np.mean(py * py) - uy * uy)
        vxy = cov_norm * (np.mean(px * py) - ux * uy)
        vals.append(
            ((2 * ux * uy + c1) * (2 * vxy + c2))
            / ((ux * ux + uy * uy + c1) * (vx + vy + c2))
        )
    return float(np.mean(vals))


def test_ssim_matches_direct_definition(rng):
    a = rng.random((20, 20), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = numpy_ssim(a, b)
    assert abs(got - want) < 1e-4


def test_ssim_self_is_one(rng):
    a = rng.random((16, 16), dtype=np.float32)
    assert abs(float(metrics.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6


def test_ssim_degrades_with_noise(rng):
    a = rng.random((32, 32), dtype=np.float32)
    small = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1).astype(np.float32)
    big = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    s_small = float(metrics.ssim(jnp.asarray(a), jnp.asarray(small)))
    s_big = float(metrics.ssim(jnp.asarray(a), jnp.asarray(big)))
    assert s_small > s_big


def test_per_frame_variants(rng):
    a = rng.random((4, 16, 16), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    p = np.asarray(metrics.psnr_per_frame(jnp.asarray(a), jnp.asarray(b)))
    s = np.asarray(metrics.ssim_per_frame(jnp.asarray(a), jnp.asarray(b)))
    assert p.shape == (4,) and s.shape == (4,)
    for i in range(4):
        assert abs(p[i] - float(metrics.psnr(jnp.asarray(a[i]), jnp.asarray(b[i])))) < 1e-4
