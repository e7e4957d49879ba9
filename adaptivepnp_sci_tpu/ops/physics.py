"""SCI forward model and solver projection updates.

The CACTI forward model collapses ``B`` mask-modulated frames into one 2-D
snapshot: ``y = A(x) = sum_t Phi_t * x_t``; the adjoint broadcasts the
measurement back through the masks: ``At(y) = Phi * y``.

Semantics match the reference implementation (``/root/reference/utilspy.py:28-44``
and the x-updates in
``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:128-140,389-391``)
but the layout is TPU-native: packed Bayer state is ``(B, 4, H/2, W/2)``
(frames x RGGB planes leading, spatial dims last), so every op below is a
pure elementwise map + one reduction over the leading frame axis — a single
XLA fusion with no gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

# Frame axis of packed state tensors (B, 4, H/2, W/2).
FRAME_AXIS = 0


def forward(x: Array, phi: Array) -> Array:
    """SCI forward model ``A(x) = sum_t phi_t * x_t``.

    Args:
      x:   ``(B, ..., H, W)`` frames (packed Bayer ``(B, 4, H/2, W/2)`` or
           full-res ``(B, H, W)``).
      phi: binary/float masks, same shape as ``x``.

    Returns:
      Snapshot measurement with the frame axis reduced, e.g. ``(4, H/2, W/2)``.

    Reference parity: ``A_`` at ``/root/reference/utilspy.py:28-33``.
    """
    return jnp.sum(x * phi, axis=FRAME_AXIS)


def adjoint(y: Array, phi: Array) -> Array:
    """Adjoint ``At(y) = phi * y`` (broadcast y over the frame axis).

    Reference parity: ``At_`` at ``/root/reference/utilspy.py:35-44``.
    """
    return phi * y[None]


def phi_sum(phi: Array) -> Array:
    """Per-pixel mask energy ``sum_t phi_t^2`` (for binary masks == sum_t phi_t),
    with the reference's zero-guard: pixels never sampled get 1 to avoid
    division by zero (``/root/reference/dvp…online.py:72-74``)."""
    s = jnp.sum(phi, axis=FRAME_AXIS)
    return jnp.where(s == 0, 1.0, s)


def gap_x_update(
    theta: Array, b: Array, y: Array, phi: Array, phi_s: Array,
    lam: float = 1.0, gamma: float = 0.01,
) -> Array:
    """GAP Euclidean-projection x-update used by the TV warm start.

    ``x = (theta + b) + lam * At((y - A(theta + b)) / (phi_sum + gamma))``

    Reference parity: ``/root/reference/dvp…online.py:389-391``.
    """
    p = theta + b
    resid = (y - forward(p, phi)) / (phi_s + gamma)
    return p + lam * (phi * resid[None])


def admm_x_update(
    theta: Array, b: Array, y: Array, phi: Array, phi_s: Array,
    rho: float, alpha: float,
) -> Array:
    """Two-stage-ADMM x-update (diagonalized linear inverse).

    ``p = theta - b / rho``
    ``x = p + Phi * (y - A(p)) / (alpha * rho + phi_sum)``

    Reference parity: ``/root/reference/dvp…online.py:128-140``.
    """
    p = theta - b / rho
    resid = (y - forward(p, phi)) / (alpha * rho + phi_s)
    return p + phi * resid[None]


def measurement_loss(x: Array, phi: Array, y: Array) -> Array:
    """Self-supervised measurement-consistency loss ``MSE(A(x), y)`` used by
    online denoiser adaptation (``/root/reference/packages/ffdnet/
    test_ffdnet_ipol.py:289-291``)."""
    return jnp.mean((forward(x, phi) - y) ** 2)
