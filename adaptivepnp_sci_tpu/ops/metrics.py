"""On-device image-quality metrics (PSNR / SSIM).

The reference computes PSNR/SSIM on the host with scikit-image every solver
iteration (``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:
274-304,318-321``), syncing device->host each time. These jnp versions run
inside the jitted solver scan, so the per-iteration quality trace is free.

``ssim`` reproduces ``skimage.metrics.structural_similarity`` defaults for
2-D float inputs with an explicit ``data_range``: 7x7 uniform window, sample
covariance normalization ``N/(N-1)``, K1=0.01 / K2=0.03, and a ``win//2``
border crop before averaging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def psnr(ref: Array, img: Array, data_range: float = 1.0) -> Array:
    """Peak signal-to-noise ratio in dB over the whole array."""
    mse = jnp.mean((ref.astype(jnp.float32) - img.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def psnr_per_frame(ref: Array, img: Array, data_range: float = 1.0) -> Array:
    """PSNR of each leading-axis frame, ``(B, ...) -> (B,)``."""
    return jax.vmap(lambda r, i: psnr(r, i, data_range))(ref, img)


def _uniform_filter_2d(x: Array, win: int) -> Array:
    """Mean filter via two separable cumulative-sum passes (O(HW), no conv).

    Uses edge-replicate padding; only ``win//2``-interior pixels are exact,
    which is all :func:`ssim` consumes after its border crop.
    """
    pad = win // 2

    def filt1d(a: Array, axis: int) -> Array:
        a = jnp.moveaxis(a, axis, 0)
        a = jnp.concatenate(
            [jnp.repeat(a[:1], pad, 0), a, jnp.repeat(a[-1:], pad, 0)], axis=0
        )
        c = jnp.cumsum(a, axis=0)
        zero = jnp.zeros_like(c[:1])
        c = jnp.concatenate([zero, c], axis=0)
        out = (c[win:] - c[:-win]) / win
        return jnp.moveaxis(out, 0, axis)

    return filt1d(filt1d(x, -2), -1)


def ssim(
    ref: Array, img: Array, data_range: float = 1.0, win_size: int = 7
) -> Array:
    """Mean structural similarity of two 2-D images (skimage-compatible)."""
    x = ref.astype(jnp.float32)
    y = img.astype(jnp.float32)

    ndp = win_size**2
    cov_norm = ndp / (ndp - 1)

    ux = _uniform_filter_2d(x, win_size)
    uy = _uniform_filter_2d(y, win_size)
    uxx = _uniform_filter_2d(x * x, win_size)
    uyy = _uniform_filter_2d(y * y, win_size)
    uxy = _uniform_filter_2d(x * y, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    return jnp.mean(s[pad:-pad, pad:-pad])


def ssim_per_frame(ref: Array, img: Array, data_range: float = 1.0) -> Array:
    """SSIM of each leading-axis frame, ``(B, H, W) -> (B,)``."""
    return jax.vmap(lambda r, i: ssim(r, i, data_range))(ref, img)
