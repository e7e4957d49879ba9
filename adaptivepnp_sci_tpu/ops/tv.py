"""On-device total-variation proximal operator (Chambolle 2004 dual projection).

The reference calls ``skimage.restoration.denoise_tv_chambolle`` — a Cython
CPU kernel — from inside the solver loop, forcing a device->host->device round
trip *every iteration* (``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_
online.py:147-160,398-407``). That CPU prox dominates the warm-start wall time.

Here the same algorithm (A. Chambolle, "An algorithm for total variation
minimization and applications", JMIV 2004 — the duality-based fixed point
iteration also used by scikit-image) is a pure jitted JAX function: the dual
field update, divergence, and energy check are fused by XLA into a handful of
VPU passes entirely in HBM/VMEM, and the channel axis is vmapped.

Semantics match skimage's ``_denoise_tv_chambolle_nd`` for 2-D inputs,
including the energy-based early-stop criterion, so the warm start stays
iteration-parity-exact with the reference pipeline (weight=0.1, 5 inner
iterations, multichannel over the flattened ``B*4`` plane axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array


def _divergence2d(p: Array) -> Array:
    """Negative divergence accumulation of the dual field ``p`` ``(2, H, W)``."""
    d = -p.sum(0)
    d = d.at[1:, :].add(p[0, :-1, :])
    d = d.at[:, 1:].add(p[1, :, :-1])
    return d


def _grad2d(out: Array) -> Array:
    """Forward differences along each axis, zero-padded at the far edge."""
    gy = jnp.zeros_like(out).at[:-1, :].set(jnp.diff(out, axis=0))
    gx = jnp.zeros_like(out).at[:, :-1].set(jnp.diff(out, axis=1))
    return jnp.stack([gy, gx])


def tv_chambolle_2d(
    image: Array, weight: float = 0.1, eps: float = 2.0e-4, max_iter: int = 5
) -> Array:
    """Chambolle TV denoising of one 2-D image, dual fixed-point iteration.

    Minimizes ``||u - image||^2 / 2 + weight * TV(u)`` with ``tau = 1/4`` and
    the relative-energy stopping rule ``|E_prev - E| < eps * E_init``.
    """
    image = image.astype(jnp.float32)
    size = image.size
    tau = 1.0 / (2.0 * image.ndim)

    def step(state):
        i, p, _out, e_init, e_prev, _done = state
        d = jnp.where(i > 0, 1.0, 0.0) * _divergence2d(p)
        out = image + d
        e = jnp.sum(d * d)

        g = _grad2d(out)
        norm = jnp.sqrt(jnp.sum(g * g, axis=0))
        e = e + weight * jnp.sum(norm)
        coef = norm * (tau / weight) + 1.0
        p = (p - tau * g) / coef[None]
        e = e / size

        done = jnp.logical_and(i > 0, jnp.abs(e_prev - e) < eps * jnp.where(i == 0, e, e_init))
        e_init = jnp.where(i == 0, e, e_init)
        return i + 1, p, out, e_init, e, done

    def cond(state):
        i, *_, done = state
        return jnp.logical_and(i < max_iter, jnp.logical_not(done))

    p0 = jnp.zeros((2,) + image.shape, jnp.float32)
    init = (jnp.int32(0), p0, image, jnp.float32(0), jnp.float32(0), jnp.bool_(False))
    _, _, out, *_ = jax.lax.while_loop(cond, step, init)
    return out


@functools.partial(jax.jit, static_argnames=("weight", "eps", "max_iter"))
def tv_chambolle_multichannel(
    x: Array, weight: float = 0.1, eps: float = 2.0e-4, max_iter: int = 5
) -> Array:
    """Channel-wise 2-D TV prox over leading channel axes.

    ``x`` is ``(..., H, W)``; every leading index is denoised independently as
    one 2-D image (the reference flattens the packed cube to
    ``(H/2, W/2, B*4)`` and runs skimage with ``multichannel=True``, i.e.
    channel-independent 2-D TV — same thing, vmapped).
    """
    lead = x.shape[:-2]
    flat = x.reshape((-1,) + x.shape[-2:])
    den = jax.vmap(lambda im: tv_chambolle_2d(im, weight, eps, max_iter))(flat)
    return den.reshape(lead + x.shape[-2:])
