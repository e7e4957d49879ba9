"""Grayscale (non-Bayer) video-SCI solvers.

The reference's denoiser wrappers expose a ``gray`` path
(``packages/fastdvdnet/test_fastdvdnet.py:331,355-356``,
``ffdnet_vdenoiser`` with the gray checkpoint) inherited from PnP-SCI,
although the shipped drivers are Bayer-only. This module provides the
grayscale counterpart of the Bayer pipeline: state is the raw frame cube
``(B, H, W)``; GAP/ADMM projection + TV or FFDNet-gray prior
(``model_zoo/ffdnet_gray.pth`` converts directly).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from adaptivepnp_sci_tpu.ops import metrics, physics, tv


@dataclass(frozen=True)
class GrayConfig:
    sigma: tuple[float, ...] = (0.0,)
    iters: tuple[int, ...] = (40,)
    denoiser: str = "tv"     # 'tv' | 'ffdnet'
    lam: float = 1.0
    gamma: float = 0.01
    accelerate: bool = False  # classic GAP acceleration (y-residual feedback)
    tv_weight: float = 0.1
    tv_iters: int = 5


class GrayResult(NamedTuple):
    x: Array                # (B, H, W)
    psnr_per_frame: Array
    ssim_per_frame: Array
    psnr_trace: Array


@functools.lru_cache(maxsize=16)
def _build(config: GrayConfig, denoise_fn: Callable | None, compute_trace: bool):
    import numpy as np

    sigmas = np.concatenate(
        [np.full(n, s, np.float32) for s, n in zip(config.sigma, config.iters)]
    )

    def run(y, phi, x0, orig, variables):
        phi_s = physics.phi_sum(phi)

        def step(carry, sigma):
            x, theta, b, y1 = carry
            if config.accelerate:
                # classic accelerated GAP (no dual): accumulate the
                # measurement residual into y1
                yb = physics.forward(theta, phi)
                y1 = y1 + (y - yb)
                resid = (y1 - yb) / (phi_s + config.gamma)
                x = theta + config.lam * (phi * resid[None])
                xb = x
            else:
                yb = physics.forward(theta + b, phi)
                resid = (y - yb) / (phi_s + config.gamma)
                x = theta + b + config.lam * (phi * resid[None])
                xb = x - b
            if config.denoiser == "tv":
                theta = tv.tv_chambolle_multichannel(
                    xb, weight=config.tv_weight, max_iter=config.tv_iters
                )
            else:
                theta = denoise_fn(variables, xb[..., None], sigma)[..., 0]
            theta = jnp.clip(theta, 0.0, 1.0)
            b = b - (x - theta)
            trace = (
                metrics.psnr(orig, x) if compute_trace else jnp.float32(0)
            )
            return (x, theta, b, y1), trace

        init = (x0, x0, jnp.zeros_like(x0), y)
        (x, theta, b, y1), trace = jax.lax.scan(step, init, jnp.asarray(sigmas))
        return x, trace

    return jax.jit(run)


def gap_denoise_gray(
    y: Array,
    phi: Array,
    config: GrayConfig = GrayConfig(),
    denoise_fn: Callable | None = None,
    variables: Any = None,
    x0: Array | None = None,
    orig: Array | None = None,
) -> GrayResult:
    """Reconstruct a grayscale frame cube from one snapshot.

    ``denoise_fn(variables, frames (B,H,W,1), sigma) -> (B,H,W,1)`` for the
    'ffdnet' prior (frames as batch).
    """
    y = jnp.asarray(y, jnp.float32)
    phi = jnp.asarray(phi, jnp.float32)
    if x0 is None:
        x0 = physics.adjoint(y, phi)
    orig_a = jnp.asarray(orig) if orig is not None else None
    runner = _build(config, denoise_fn, orig is not None)
    x, trace = runner(y, phi, x0, orig_a, variables)
    if orig is not None:
        p = metrics.psnr_per_frame(orig_a, x)
        s = metrics.ssim_per_frame(orig_a, x)
    else:
        p = s = jnp.zeros((x.shape[0],), jnp.float32)
    return GrayResult(x, p, s, trace)
