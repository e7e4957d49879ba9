"""GAP-TV warm-start solver.

Reconstructs the packed Bayer cube with generalized alternating projection
and an on-device TV prior — the semantics of
``admm_denoise_bayer_demosaic_pre(denoiser='tv')``
(``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:326-552``,
driven with 40 iterations / sigma=0 by ``ADMM_TV_Warm_Start_save.py:36-37``).

TPU-native structure: the packed state ``(B, 4, H/2, W/2)`` is updated by a
single jitted ``lax.scan``; the x-update is one fused elementwise pass +
frame-axis reduction, and the Chambolle TV prox (the reference's per-iteration
GPU->CPU round trip) runs on device, vmapped over all ``B*4`` planes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from adaptivepnp_sci_tpu.ops import bayer, metrics, pallas_kernels, physics, tv


@dataclass(frozen=True)
class GapTVConfig:
    iters: int = 40
    lam: float = 1.0
    gamma: float = 0.01
    tv_weight: float = 0.1
    tv_iters: int = 5
    accelerate: bool = False  # plain GAP, as the reference warm start
    use_pallas: bool | None = None  # None = auto (fused kernel on TPU)


class GapTVResult(NamedTuple):
    x_bayer: Array      # (B, H, W) reconstruction (from x, reference parity)
    psnr_per_frame: Array
    ssim_per_frame: Array
    psnr_trace: Array   # per-iteration PSNR vs orig (0 if orig not given)


@functools.partial(jax.jit, static_argnames=("config", "compute_trace"))
def _gap_tv_packed(
    y: Array, phi: Array, x0: Array, orig: Array | None, config: GapTVConfig,
    compute_trace: bool,
) -> tuple[Array, Array]:
    phi_s = physics.phi_sum(phi)
    use_pallas = (
        pallas_kernels.on_tpu() if config.use_pallas is None else config.use_pallas
    )
    x_update = pallas_kernels.gap_x_update if use_pallas else physics.gap_x_update
    tv_prox = (
        pallas_kernels.tv_chambolle_fused if use_pallas
        else tv.tv_chambolle_multichannel
    )

    def step(carry, _):
        x, theta, b = carry
        x = x_update(theta, b, y, phi, phi_s, config.lam, config.gamma)
        xb = x - b
        theta = tv_prox(xb, weight=config.tv_weight, max_iter=config.tv_iters)
        theta = jnp.clip(theta, 0.0, 1.0)
        b = b - (x - theta)
        trace = (
            metrics.psnr(orig, bayer.unpack(x)) if compute_trace else jnp.float32(0)
        )
        return (x, theta, b), trace

    init = (x0, x0, jnp.zeros_like(x0))
    (x, _, _), trace = jax.lax.scan(step, init, None, length=config.iters)
    return x, trace


def gap_tv(
    y_bayer: Array,
    phi_bayer: Array,
    config: GapTVConfig = GapTVConfig(),
    x0_bayer: Array | None = None,
    orig_bayer: Array | None = None,
) -> GapTVResult:
    """Warm-start reconstruction.

    Args:
      y_bayer:   snapshot measurement ``(H, W)``.
      phi_bayer: per-frame masks ``(B, H, W)``.
      x0_bayer:  optional initialization ``(B, H, W)`` (default ``At(y)``).
      orig_bayer: optional ground truth ``(B, H, W)`` for metrics.
    """
    y = bayer.pack(jnp.asarray(y_bayer))        # (4, H2, W2)
    phi = bayer.pack(jnp.asarray(phi_bayer))    # (B, 4, H2, W2)
    if x0_bayer is None:
        x0 = physics.adjoint(y, phi)
    else:
        x0 = bayer.pack(jnp.asarray(x0_bayer))

    orig = jnp.asarray(orig_bayer) if orig_bayer is not None else None
    x, trace = _gap_tv_packed(y, phi, x0, orig, config, orig is not None)

    x_bayer = bayer.unpack(x)  # (B, H, W)
    if orig is not None:
        p = metrics.psnr_per_frame(orig, x_bayer)
        s = metrics.ssim_per_frame(orig, x_bayer)
    else:
        p = s = jnp.zeros((x_bayer.shape[0],), jnp.float32)
    return GapTVResult(x_bayer, p, s, trace)
