"""One-stage GAP warm-start solver with DEEP priors on Bayer data.

Semantics of ``admm_denoise_bayer_demosaic_pre`` with
``denoiser in ('ffdnet_color', 'fastdvd_color', 'PPP')``
(``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:439-496``):
GAP x-update ``x = (theta+b) + lam*At((y - A(theta+b))/(phi_sum+gamma))``
(:389-391), denoise input ``x - b`` (:447), Malvar demosaic of the scattered
mosaic (:451-457), joint RGB denoise, RGGB-subsample theta-update (:469-472),
clip (:505) and GAP dual ``b -= (x - theta)`` (:507). The 'PPP' branch's
scheduled FFDNet adaptation (:459-464) maps to the same measurement-loss
optax step the two-stage solver uses.

Unlike the two-stage solver there is no second (RGB) dual ``w`` — this is the
single-stage warm-start family. TPU-native structure matches ``gap_tv``: the
whole sigma schedule is ONE jitted ``lax.scan`` with frames batched.

Reference faithfulness note: the reference's first deep iteration carries the
same dual aliasing artifact documented in ``tests/oracle_reference.py``
(``xall``/``theta_all``/``x0all`` alias one tensor); we implement the clean
dual semantics, measured at <0.05 dB final impact for the two-stage loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from adaptivepnp_sci_tpu.adapt.online import (
    AdaptConfig,
    first_lr,
    make_adapt_fn,
    make_schedule,
)
from adaptivepnp_sci_tpu.ops import bayer, demosaic, metrics, pallas_kernels, physics
from adaptivepnp_sci_tpu.solvers.priors import Prior
from adaptivepnp_sci_tpu.solvers.two_stage_admm import _default_adam


@dataclass(frozen=True)
class GapDeepConfig:
    """Static configuration (hashable: keys the jit cache)."""

    sigma: tuple[float, ...]
    iters: tuple[int, ...]
    denoiser: str = "ffdnet"          # 'ffdnet' | 'fastdvd'
    demosaic_method: str = "malvar"   # 'malvar' | 'bilinear'
    lam: float = 1.0
    gamma: float = 0.01
    adapt: AdaptConfig | None = None  # reference 'PPP'/update_ branches
    use_pallas: bool | None = None    # None = auto (fused x-update on TPU)


class GapDeepResult(NamedTuple):
    x_rgb: Array            # (B, H, W, 3) final denoised RGB cube
    x_bayer: Array          # (B, H, W) final estimate (from x, ref :544-546)
    psnr_per_frame: Array
    ssim_per_frame: Array
    psnr_trace: Array
    variables: Any          # possibly-adapted denoiser variables
    opt_state: Any


@functools.lru_cache(maxsize=16)
def _build_runner(
    config: GapDeepConfig,
    prior: Prior,
    optimizer: optax.GradientTransformation | None,
    compute_trace: bool,
):
    sigmas_np, adapt_mask_np = make_schedule(config.sigma, config.iters, config.adapt)
    total_iters = int(sigmas_np.shape[0])
    do_adapt = config.adapt is not None
    adapt_step = (
        make_adapt_fn(prior, optimizer, config.adapt)
        if do_adapt
        else None
    )
    dm = demosaic.bilinear if config.demosaic_method == "bilinear" else (
        demosaic.malvar2004
    )

    def run(y_full, phi_full, x0, orig, variables, opt_state, key):
        y_p = bayer.pack(y_full)
        phi_p = bayer.pack(phi_full)
        phi_s = physics.phi_sum(phi_p)
        use_pallas = (
            pallas_kernels.on_tpu() if config.use_pallas is None
            else config.use_pallas
        )
        x_update = (
            pallas_kernels.gap_x_update if use_pallas else physics.gap_x_update
        )

        def trace_psnr(x):
            if not compute_trace:
                return jnp.float32(0)
            return metrics.psnr(orig, bayer.unpack(x))

        def step_body(carry, inp, fire: bool):
            x, theta, b, variables, opt_state, key = carry
            sigma, _k = inp

            x = x_update(
                theta, b, y_p, phi_p, phi_s, config.lam, config.gamma
            )
            xb_full = bayer.unpack(x - b)            # (B, H, W)
            x_rgb = dm(xb_full)                      # (B, H, W, 3)

            if do_adapt and fire:
                # trigger iterations are compiled fire-inline at their
                # STATIC positions (segment loop below) — no lax.cond in
                # the scan, same design as two_stage_admm._build_runner
                variables, opt_state, key = adapt_step(
                    variables, opt_state, key, x_rgb, sigma, y_p, phi_p,
                    y_full, phi_full
                )

            xhat = prior.apply(variables, x_rgb, sigma)
            theta = jnp.clip(bayer.rggb_subsample(xhat), 0.0, 1.0)
            b = b - (x - theta)                      # GAP dual (ref :507)

            carry = (x, theta, b, variables, opt_state, key)
            return carry, trace_psnr(x)

        # Static trigger segmentation (two_stage_admm.py segment loop): the
        # schedule splits into maximal same-mask runs — non-firing runs are
        # one lax.scan of the plain step, isolated triggers unroll inline,
        # consecutive triggers scan the firing step.
        def xs_slice(lo, hi):
            return (jnp.asarray(sigmas_np[lo:hi]), jnp.arange(lo, hi))

        mask = np.asarray(adapt_mask_np, bool)
        run_bounds = [0] + (
            np.nonzero(mask[1:] != mask[:-1])[0] + 1
        ).tolist() + [total_iters]
        carry = (x0, x0, jnp.zeros_like(x0), variables, opt_state, key)
        traces = []
        for lo, hi in zip(run_bounds[:-1], run_bounds[1:]):
            fire = bool(mask[lo]) if hi > lo else False
            if fire and hi - lo == 1:
                inp = (jnp.float32(sigmas_np[lo]), jnp.int32(lo))
                carry, tr = step_body(carry, inp, True)
                tr = tr[None]
            else:
                carry, tr = jax.lax.scan(
                    lambda c, i, f=fire: step_body(c, i, f),
                    carry, xs_slice(lo, hi),
                )
            traces.append(tr)
        trace = traces[0] if len(traces) == 1 else jnp.concatenate(traces)

        x, theta, b, variables, opt_state, key = carry
        # final denoise output for the RGB return (ref returns last xbgr3)
        xhat = prior.apply(variables, dm(bayer.unpack(x - b)), sigmas_np[-1])
        return x, xhat, trace, variables, opt_state

    return jax.jit(run)


def gap_deep(
    y_bayer: Array,
    phi_bayer: Array,
    config: GapDeepConfig,
    prior: Prior,
    variables: Any,
    x0_bayer: Array | None = None,
    orig_bayer: Array | None = None,
    optimizer: optax.GradientTransformation | None = None,
    opt_state: Any = None,
    key: Array | None = None,
) -> GapDeepResult:
    """Reconstruct one measurement with the one-stage GAP + deep prior."""
    y = jnp.asarray(y_bayer, jnp.float32)
    phi = jnp.asarray(phi_bayer, jnp.float32)
    if y.ndim != 2 or phi.ndim != 3 or phi.shape[1:] != y.shape:
        raise ValueError(
            f"expected y (H, W) and phi (B, H, W); got {y.shape}, {phi.shape}"
        )

    if x0_bayer is None:
        x0 = physics.adjoint(bayer.pack(y), bayer.pack(phi))
    else:
        x0 = bayer.pack(jnp.asarray(x0_bayer, jnp.float32))

    if config.adapt is not None:
        if optimizer is None:
            optimizer = _default_adam(first_lr(config.adapt))
        if opt_state is None:
            opt_state = optimizer.init(variables["params"])
    if key is None:
        key = jax.random.PRNGKey(0)

    orig = jnp.asarray(orig_bayer) if orig_bayer is not None else None
    runner = _build_runner(config, prior, optimizer, orig is not None)
    x, xhat, trace, variables, opt_state = runner(
        y, phi, x0, orig, variables, opt_state, key
    )

    x_bayer = bayer.unpack(x)
    if orig is not None:
        p = metrics.psnr_per_frame(orig, x_bayer)
        s = metrics.ssim_per_frame(orig, x_bayer)
    else:
        p = s = jnp.zeros((x_bayer.shape[0],), jnp.float32)
    return GapDeepResult(xhat, x_bayer, p, s, trace, variables, opt_state)
