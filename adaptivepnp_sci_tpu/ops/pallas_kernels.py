"""Fused Pallas TPU kernels for the solver projection hot path.

The GAP/ADMM x-update is purely elementwise plus one frame-axis reduction
over the packed cube ``(B, 4, H/2, W/2)``:

    p     = theta -/+ b / rho
    resid = (y - sum_t phi_t * p_t) / (c + phi_sum)
    x     = p + phi * resid

Left to XLA this is already a few fused VPU passes, but the intermediate
``p`` round-trips HBM between the reduction pass and the broadcast pass.
The Pallas kernel streams one spatial tile of all B*4 planes into VMEM,
computes ``p``, the reduction, and the broadcast in-register, and writes the
single output — one HBM read per input, one write, nothing else. The last
dimension tiles at 256 lanes (W/2 = 256 for the 512px benchmark scenes), the
frame/plane axes stay whole inside the block for the reduction.

Falls back to the jnp reference implementation off-TPU; ``interpret=True``
paths are exercised in CPU tests against the oracle in
:mod:`adaptivepnp_sci_tpu.ops.physics`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaptivepnp_sci_tpu.ops import physics


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


_VMEM_BUDGET = 8 * 1024 * 1024  # half of ~16MB VMEM; Pallas double-buffers


def _pick_tiles(nb: int, h: int, w: int) -> tuple[int, int]:
    """Spatial tile sizes fitting the VMEM budget.

    Per (bh, bw) tile the kernel holds 4 cube blocks (theta, b, phi, out) of
    ``nb*4*bh*bw`` f32 plus 2 plane blocks, each double-buffered by the
    Pallas pipeline.
    """
    bw = 256 if w % 256 == 0 else (128 if w % 128 == 0 else w)
    bytes_per_pixel = (4 * nb * 4 + 2 * 4) * 4 * 2  # cubes + planes, x2 buffers
    for bh in (64, 32, 16, 8):
        if h % bh == 0 and bytes_per_pixel * bh * bw <= _VMEM_BUDGET:
            return bh, bw
    return (h, bw) if bytes_per_pixel * h * bw <= _VMEM_BUDGET else (8, bw)


def _x_update_kernel(theta_ref, b_ref, y_ref, phi_ref, phis_ref, out_ref,
                     *, inv_rho: float, denom_c: float, sign: float):
    """sign=-1: ADMM (p = theta - b/rho); sign=+1: GAP (p = theta + b)."""
    p = theta_ref[:] + sign * b_ref[:] * inv_rho
    yb = jnp.sum(phi_ref[:] * p, axis=0)                       # (4, bh, bw)
    resid = (y_ref[:] - yb) / (denom_c + phis_ref[:])
    out_ref[:] = p + phi_ref[:] * resid[None]


def _fused_x_update(theta: Array, b: Array, y: Array, phi: Array,
                    phi_s: Array, inv_rho: float, denom_c: float,
                    sign: float, interpret: bool = False) -> Array:
    nb, c, h, w = theta.shape
    bh, bw = _pick_tiles(nb, h, w)
    grid = (h // bh, w // bw)

    cube_spec = pl.BlockSpec(
        (nb, c, bh, bw), lambda i, j: (0, 0, i, j), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (c, bh, bw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _x_update_kernel, inv_rho=inv_rho, denom_c=denom_c, sign=sign
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cube_spec, cube_spec, plane_spec, cube_spec, plane_spec],
        out_specs=cube_spec,
        out_shape=jax.ShapeDtypeStruct(theta.shape, theta.dtype),
        interpret=interpret,
    )(theta, b, y, phi, phi_s)


def _tv_plane_kernel(img_ref, out_ref, *, weight: float, eps: float,
                     max_iter: int):
    """Full Chambolle dual iteration for one 2-D plane, entirely in VMEM.

    The jnp version re-reads the plane + dual fields from HBM every inner
    iteration (and its `.at[].add` divergence lowers to scatters); here the
    5-iteration fixed point runs register/VMEM-resident with one HBM read and
    one write per plane. Semantics match :func:`ops.tv.tv_chambolle_2d`
    including the relative-energy early stop.
    """
    img = img_ref[0].astype(jnp.float32)
    size = img.size
    tau = 0.25
    zrow = jnp.zeros((1, img.shape[1]), jnp.float32)
    zcol = jnp.zeros((img.shape[0], 1), jnp.float32)

    def divergence(py, px):
        d = -(py + px)
        d = d + jnp.concatenate([zrow, py[:-1, :]], axis=0)
        d = d + jnp.concatenate([zcol, px[:, :-1]], axis=1)
        return d

    def grads(out):
        gy = jnp.concatenate([out[1:, :] - out[:-1, :], zrow], axis=0)
        gx = jnp.concatenate([out[:, 1:] - out[:, :-1], zcol], axis=1)
        return gy, gx

    def step(state):
        i, py, px, _out, e_init, e_prev, _done = state
        d = jnp.where(i > 0, 1.0, 0.0) * divergence(py, px)
        out = img + d
        e = jnp.sum(d * d)
        gy, gx = grads(out)
        norm = jnp.sqrt(gy * gy + gx * gx)
        e = (e + weight * jnp.sum(norm)) / size
        coef = norm * (tau / weight) + 1.0
        py = (py - tau * gy) / coef
        px = (px - tau * gx) / coef
        done = jnp.logical_and(i > 0, jnp.abs(e_prev - e) < eps * e_init)
        e_init = jnp.where(i == 0, e, e_init)
        return i + 1, py, px, out, e_init, e, done

    def cond(state):
        i, *_, done = state
        return jnp.logical_and(i < max_iter, jnp.logical_not(done))

    z = jnp.zeros_like(img)
    init = (jnp.int32(0), z, z, img, jnp.float32(0), jnp.float32(0),
            jnp.bool_(False))
    out_ref[0] = jax.lax.while_loop(cond, step, init)[3]


#: the plane kernel keeps ~8 fp32 plane-size buffers live through the
#: while_loop (img, py, px, out, gy/gx/norm temporaries), and pallas_call
#: double-buffers the input and output blocks across the grid (+2 more
#: planes, like the explicit "x2 buffers" term in ``_pick_tiles``); planes
#: beyond this budget must take the HBM-streaming jnp path instead of
#: VMEM-OOMing at compile time (hit at 1024² packed planes = a 2048² scene).
_TV_PLANE_LIVE_BUFFERS = 10
_TV_PLANE_VMEM_BUDGET = 14 * 2**20


def tv_chambolle_fused(x: Array, weight: float = 0.1, eps: float = 2.0e-4,
                       max_iter: int = 5, interpret: bool = False) -> Array:
    """Pallas-fused channel-wise 2-D TV prox over ``(..., H, W)``.

    Planes too large for the in-VMEM fixed point (>~14MB of live buffers)
    fall back to :func:`ops.tv.tv_chambolle_multichannel` — identical
    semantics, HBM-streaming."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    if h * w * 4 * _TV_PLANE_LIVE_BUFFERS > _TV_PLANE_VMEM_BUDGET:
        from adaptivepnp_sci_tpu.ops import tv

        return tv.tv_chambolle_multichannel(x, weight, eps, max_iter)
    flat = x.reshape((-1, h, w)).astype(jnp.float32)
    n = flat.shape[0]
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _tv_plane_kernel, weight=weight, eps=eps, max_iter=max_iter
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        interpret=interpret,
    )(flat)
    return out.reshape(lead + (h, w))


def admm_x_update(theta: Array, b: Array, y: Array, phi: Array, phi_s: Array,
                  rho: float, alpha: float, interpret: bool = False) -> Array:
    """Fused equivalent of :func:`physics.admm_x_update`."""
    return _fused_x_update(
        theta, b, y, phi, phi_s,
        inv_rho=1.0 / rho, denom_c=alpha * rho, sign=-1.0, interpret=interpret,
    )


def gap_x_update(theta: Array, b: Array, y: Array, phi: Array, phi_s: Array,
                 lam: float = 1.0, gamma: float = 0.01,
                 interpret: bool = False) -> Array:
    """Fused equivalent of :func:`physics.gap_x_update` (lam folds into the
    residual scale only when lam == 1, which every reference config uses)."""
    if lam != 1.0:
        return physics.gap_x_update(theta, b, y, phi, phi_s, lam, gamma)
    return _fused_x_update(
        theta, b, y, phi, phi_s,
        inv_rho=1.0, denom_c=gamma, sign=+1.0, interpret=interpret,
    )
