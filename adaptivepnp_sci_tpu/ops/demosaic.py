"""Classical CFA demosaicing (Malvar 2004 and bilinear) as batched XLA convs.

The reference demosaics each of the B frames in a Python loop with four
separate ``F.conv2d`` calls per frame
(``/root/reference/packages/colour_demosaicing/bayer/demosaicing/
malvar2004.py:169-246``, call site ``dvp…online.py:186-191``). Here all
frames and all interpolation kernels run in ONE ``lax.conv_general_dilated``
(input ``(B, 1, H, W)``, weights ``(K, 1, 5, 5)``) so the MXU/VPU sees one
large batched op, followed by a parity-mask select.

Kernels are the published constants from H.S. Malvar, L.-W. He, R. Cutler,
"High-quality linear interpolation for demosaicing of Bayer-patterned color
images", ICASSP 2004.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from adaptivepnp_sci_tpu.ops.bayer import cfa_masks

# Malvar 2004 interpolation kernels (x8).
_GR_GB = np.array(
    [[0, 0, -1, 0, 0],
     [0, 0, 2, 0, 0],
     [-1, 2, 4, 2, -1],
     [0, 0, 2, 0, 0],
     [0, 0, -1, 0, 0]], np.float32) / 8.0

_RG_RB_BG_BR = np.array(
    [[0, 0, 0.5, 0, 0],
     [0, -1, 0, -1, 0],
     [-1, 4, 5, 4, -1],
     [0, -1, 0, -1, 0],
     [0, 0, 0.5, 0, 0]], np.float32) / 8.0

_RB_BB_BR_RR = np.array(
    [[0, 0, -1.5, 0, 0],
     [0, 2, 0, 2, 0],
     [-1.5, 0, 6, 0, -1.5],
     [0, 2, 0, 2, 0],
     [0, 0, -1.5, 0, 0]], np.float32) / 8.0

# Bilinear kernels (colour-demosaicing parity: bilinear.py).
_BILINEAR_G = np.array([[0, 1, 0], [1, 4, 1], [0, 1, 0]], np.float32) / 4.0
_BILINEAR_RB = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 4.0


def _conv_bank(x: Array, kernels: np.ndarray) -> Array:
    """Reflect-pad + multi-kernel correlation:
    ``(B, H, W) x (K, kh, kw) -> (K, B, H, W)``.

    Implemented as shifted-slice multiply-adds on the VPU instead of
    ``lax.conv``: a single-input-channel 5x5 conv is a degenerate MXU
    contraction (25-deep) and measured ~20ms/frame-cube on v5e, ~40x slower
    than these fused elementwise passes. One reflect-padded copy is shared
    by all kernels; XLA fuses the whole bank into a few passes. Pure fp32 —
    demosaicking feeds the ADMM state where interpolation error accumulates
    over the 20-40 iteration chain.
    """
    k, kh, kw = kernels.shape
    pad = kh // 2
    h, w = x.shape[-2:]
    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad)), mode="reflect"
    )
    outs = [jnp.zeros_like(x, dtype=jnp.float32) for _ in range(k)]
    for i in range(kh):
        for j in range(kw):
            col = kernels[:, i, j]
            if not np.any(col):
                continue
            window = xp[:, i : i + h, j : j + w]
            for t in range(k):
                if col[t] != 0:
                    outs[t] = outs[t] + float(col[t]) * window
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("pattern",))
def malvar2004(cfa: Array, pattern: str = "RGGB") -> Array:
    """Malvar-He-Cutler demosaic, batched: ``(B, H, W) -> (B, H, W, 3)``.

    Reference parity: ``demosaicing_CFA_Bayer_Malvar2004_tensor``
    (``malvar2004.py:169-246``), vectorized over the frame axis.
    """
    h, w = cfa.shape[-2:]
    masks = cfa_masks((h, w), pattern)  # (H, W, 3) bool
    r_m, g_m, b_m = masks[..., 0], masks[..., 1], masks[..., 2]

    g_conv, rb_g1, rb_g2, rb_br = _conv_bank(
        cfa, np.stack([_GR_GB, _RG_RB_BG_BR, _RG_RB_BG_BR.T, _RB_BB_BR_RR])
    )

    r = cfa * r_m
    g = jnp.where(r_m | b_m, g_conv, cfa * g_m)
    b = cfa * b_m

    # Row/column parity masks: rows/cols that contain red (resp. blue) sites.
    r_rows = r_m.any(axis=1)[:, None] & np.ones((1, w), bool)
    r_cols = r_m.any(axis=0)[None, :] & np.ones((h, 1), bool)
    b_rows = b_m.any(axis=1)[:, None] & np.ones((1, w), bool)
    b_cols = b_m.any(axis=0)[None, :] & np.ones((h, 1), bool)

    r = jnp.where(r_rows & b_cols, rb_g1, r)
    r = jnp.where(b_rows & r_cols, rb_g2, r)
    b = jnp.where(b_rows & r_cols, rb_g1, b)
    b = jnp.where(r_rows & b_cols, rb_g2, b)
    r = jnp.where(b_rows & b_cols, rb_br, r)
    b = jnp.where(r_rows & r_cols, rb_br, b)

    return jnp.stack([r, g, b], axis=-1)


@functools.partial(jax.jit, static_argnames=("pattern",))
def bilinear(cfa: Array, pattern: str = "RGGB") -> Array:
    """Bilinear demosaic, batched: ``(B, H, W) -> (B, H, W, 3)``.

    Reference parity: ``demosaicing_CFA_Bayer_bilinear``
    (``packages/colour_demosaicing/bayer/demosaicing/bilinear.py``).
    """
    h, w = cfa.shape[-2:]
    masks = jnp.asarray(cfa_masks((h, w), pattern), cfa.dtype)
    planes = cfa[..., None] * masks  # (B, H, W, 3)

    def conv1(x: Array, kern: np.ndarray) -> Array:
        return _conv_bank(x, kern[None])[0]

    r = conv1(planes[..., 0], _BILINEAR_RB)
    g = conv1(planes[..., 1], _BILINEAR_G)
    b = conv1(planes[..., 2], _BILINEAR_RB)
    return jnp.stack([r, g, b], axis=-1)
