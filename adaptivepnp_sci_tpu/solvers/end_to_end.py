"""Single-dispatch end-to-end reconstruction.

Fuses GAP-TV warm start + two-stage online-adaptive ADMM + final PSNR/SSIM
into ONE jitted XLA program, so a measurement costs one host->device dispatch
(the per-program round-trip dominates wall time on remote-attached TPUs) and
nothing intermediate ever returns to the host.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from adaptivepnp_sci_tpu.ops import bayer, metrics, physics
from adaptivepnp_sci_tpu.solvers.gap_tv import GapTVConfig, _gap_tv_packed
from adaptivepnp_sci_tpu.solvers.priors import Prior
from adaptivepnp_sci_tpu.adapt.online import first_lr
from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
    ADMMConfig,
    _build_runner,
    _default_adam,
)


class EndToEndResult(NamedTuple):
    x_rgb: Array
    x_bayer: Array
    psnr_per_frame: Array
    ssim_per_frame: Array
    psnr_trace: Array
    variables: Any
    opt_state: Any


@functools.lru_cache(maxsize=16)
def build_reconstruct(
    warm_cfg: GapTVConfig,
    admm_cfg: ADMMConfig,
    prior: Prior | None,
    demosaic_fn: Callable | None = None,
    optimizer: optax.GradientTransformation | None = None,
    compute_metrics: bool = True,
):
    """Returns jitted ``fn(y, phi, orig, variables, opt_state, key) ->
    EndToEndResult`` (pass ``orig=None``-shaped zeros when metrics off)."""
    if admm_cfg.adapt is not None and optimizer is None:
        optimizer = _default_adam(first_lr(admm_cfg.adapt))
    runner = _build_runner(admm_cfg, prior, demosaic_fn, optimizer, compute_metrics)

    @jax.jit
    def fn(y, phi, orig, variables, opt_state, key):
        y_p = bayer.pack(y)
        phi_p = bayer.pack(phi)
        x0 = physics.adjoint(y_p, phi_p)
        xw, _ = _gap_tv_packed(y_p, phi_p, x0, None, warm_cfg, False)

        theta, xhat, trace, variables, opt_state, _, _ = runner(
            y, phi, xw, orig if compute_metrics else None, variables, opt_state, key
        )
        x_bayer = bayer.unpack(theta)
        if compute_metrics:
            p = metrics.psnr_per_frame(orig, x_bayer)
            s = metrics.ssim_per_frame(orig, x_bayer)
        else:
            p = s = jnp.zeros((x_bayer.shape[0],), jnp.float32)
        return EndToEndResult(xhat, x_bayer, p, s, trace, variables, opt_state)

    return fn


def reconstruct_single_dispatch(
    y: Array,
    phi: Array,
    warm_cfg: GapTVConfig,
    admm_cfg: ADMMConfig,
    prior: Prior | None,
    variables: Any,
    orig: Array | None = None,
    opt_state: Any = None,
    key: Array | None = None,
    demosaic_fn: Callable | None = None,
) -> EndToEndResult:
    """Convenience wrapper around :func:`build_reconstruct`."""
    optimizer = None
    if admm_cfg.adapt is not None and prior is not None:
        optimizer = _default_adam(first_lr(admm_cfg.adapt))
        if opt_state is None:
            opt_state = optimizer.init(variables["params"])
    fn = build_reconstruct(
        warm_cfg, admm_cfg, prior, demosaic_fn, optimizer, orig is not None
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    return fn(
        jnp.asarray(y, jnp.float32), jnp.asarray(phi, jnp.float32),
        jnp.asarray(orig) if orig is not None else None,
        variables, opt_state, key,
    )
