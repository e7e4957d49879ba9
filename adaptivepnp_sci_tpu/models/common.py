"""Shared model building blocks (NHWC, PyTorch-channel-order compatible)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def space_to_depth(x: Array, r: int = 2) -> Array:
    """NHWC space-to-depth with PyTorch ``pixel_unshuffle`` channel ordering.

    ``(N, H, W, C) -> (N, H/r, W/r, C*r*r)`` where output feature
    ``c*r*r + i*r + j`` holds input pixel offset ``(i, j)`` of channel ``c`` —
    the ordering the reference's KAIR ``PixelUnShuffle`` produces in NCHW
    (``/root/reference/models/basicblock.py:104-152``), so converted conv
    weights line up.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (n, h/r, w/r, c, i, j)
    return x.reshape(n, h // r, w // r, c * r * r)


def depth_to_space(x: Array, r: int = 2) -> Array:
    """Inverse of :func:`space_to_depth` (PyTorch ``PixelShuffle`` ordering)."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (n, h, i, w, j, c)
    return x.reshape(n, h * r, w * r, c)


def replication_pad_to_even(x: Array) -> tuple[Array, int, int]:
    """Edge-replicate pad NHWC spatial dims up to even sizes; returns pads."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, ph, pw


def upsample_bilinear_align_corners(x: Array, scale: int = 2) -> Array:
    """Bilinear 2x upsample with ``align_corners=True`` semantics (NHWC).

    Matches ``nn.UpsamplingBilinear2d(scale_factor=2)`` in the reference DDnet
    (``/root/reference/models/network_demosaicking.py:335``): output sample
    ``o`` reads input coordinate ``o * (in - 1) / (out - 1)``.
    """
    n, h, w, c = x.shape
    oh, ow = h * scale, w * scale

    def interp(axis_len: int, out_len: int) -> tuple[Array, Array, Array]:
        pos = jnp.arange(out_len, dtype=jnp.float32) * (axis_len - 1) / (out_len - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, axis_len - 1)
        frac = pos - lo.astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, yf = interp(h, oh)
    xlo, xhi, xf = interp(w, ow)

    top = x[:, ylo][:, :, xlo] * (1 - xf)[None, None, :, None] + \
        x[:, ylo][:, :, xhi] * xf[None, None, :, None]
    bot = x[:, yhi][:, :, xlo] * (1 - xf)[None, None, :, None] + \
        x[:, yhi][:, :, xhi] * xf[None, None, :, None]
    return top * (1 - yf)[None, :, None, None] + bot * yf[None, :, None, None]
