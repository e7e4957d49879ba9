"""Menon 2007 (DDFAPD) directional demosaicing in JAX, batched over frames.

Algorithm: D. Menon, S. Andriani, G. Calvagno, "Demosaicing with directional
filtering and a posteriori decision", IEEE TIP 2007 — directional green
interpolation (horizontal/vertical FIR), decision by chrominance-gradient
classifiers, R/B reconstruction, optional refining step.

Reference parity: ``packages/colour_demosaicing/bayer/demosaicing/
menon2007.py`` (NumPy) — the reference's tensor port hardcodes 512x512
(``menon2007_tensor.py:44-48``); this version is shape-generic and vmapped.
scipy ``convolve`` semantics (true convolution = flipped kernel, mirror /
zero padding) are preserved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from adaptivepnp_sci_tpu.ops.bayer import cfa_masks

_H0 = np.array([0, 0.5, 0, 0.5, 0], np.float32)
_H1 = np.array([-0.25, 0, 0.5, 0, -0.25], np.float32)
_KB = np.array([0.5, 0, 0.5], np.float32)
_FIR = np.ones(3, np.float32) / 3

# classifier kernel (scipy.convolve flips it; store pre-flipped for
# cross-correlation)
_K = np.array(
    [[0, 0, 1, 0, 1],
     [0, 0, 0, 1, 0],
     [0, 0, 3, 0, 3],
     [0, 0, 0, 1, 0],
     [0, 0, 1, 0, 1]], np.float32)
_K_FLIP = _K[::-1, ::-1].copy()
_KT_FLIP = _K.T[::-1, ::-1].copy()


def _cnv_h(x: Array, kern: np.ndarray) -> Array:
    """1-D horizontal correlation with mirror padding (kernels symmetric)."""
    p = len(kern) // 2
    xp = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
    return sum(kern[i] * xp[:, i : i + x.shape[1]] for i in range(len(kern)))


def _cnv_v(x: Array, kern: np.ndarray) -> Array:
    p = len(kern) // 2
    xp = jnp.pad(x, ((p, p), (0, 0)), mode="reflect")
    return sum(kern[i] * xp[i : i + x.shape[0], :] for i in range(len(kern)))


def _cnv2_zero(x: Array, kern: np.ndarray) -> Array:
    """2-D correlation with zero padding (kern already flipped)."""
    kh, kw = kern.shape
    xp = jnp.pad(x, ((kh // 2, kh // 2), (kw // 2, kw // 2)))
    out = jnp.zeros_like(x)
    for i in range(kh):
        for j in range(kw):
            if kern[i, j] != 0:
                out = out + kern[i, j] * xp[i : i + x.shape[0], j : j + x.shape[1]]
    return out


def _menon_single(cfa: Array, masks: np.ndarray, refine: bool) -> Array:
    r_m, g_m, b_m = masks[..., 0], masks[..., 1], masks[..., 2]
    h, w = cfa.shape

    r = cfa * r_m
    g = cfa * g_m
    b = cfa * b_m

    g_h = jnp.where(~g_m, _cnv_h(cfa, _H0) + _cnv_h(cfa, _H1), g)
    g_v = jnp.where(~g_m, _cnv_v(cfa, _H0) + _cnv_v(cfa, _H1), g)

    c_h = jnp.where(r_m, r - g_h, 0.0)
    c_h = jnp.where(b_m, b - g_h, c_h)
    c_v = jnp.where(r_m, r - g_v, 0.0)
    c_v = jnp.where(b_m, b - g_v, c_v)

    d_h = jnp.abs(c_h - jnp.pad(c_h, ((0, 0), (0, 2)), mode="reflect")[:, 2:])
    d_v = jnp.abs(c_v - jnp.pad(c_v, ((0, 2), (0, 0)), mode="reflect")[2:, :])

    dd_h = _cnv2_zero(d_h, _K_FLIP)
    dd_v = _cnv2_zero(d_v, _KT_FLIP)

    m = dd_v >= dd_h
    g = jnp.where(m, g_h, g_v)

    r_r = r_m.any(axis=1)[:, None] & np.ones((1, w), bool)
    b_r = b_m.any(axis=1)[:, None] & np.ones((1, w), bool)

    r = jnp.where(g_m & r_r, g + _cnv_h(r, _KB) - _cnv_h(g, _KB), r)
    r = jnp.where(g_m & b_r, g + _cnv_v(r, _KB) - _cnv_v(g, _KB), r)
    b = jnp.where(g_m & b_r, g + _cnv_h(b, _KB) - _cnv_h(g, _KB), b)
    b = jnp.where(g_m & r_r, g + _cnv_v(b, _KB) - _cnv_v(g, _KB), b)

    r = jnp.where(
        b_r & b_m,
        jnp.where(m, b + _cnv_h(r, _KB) - _cnv_h(b, _KB),
                  b + _cnv_v(r, _KB) - _cnv_v(b, _KB)),
        r,
    )
    b = jnp.where(
        r_r & r_m,
        jnp.where(m, r + _cnv_h(b, _KB) - _cnv_h(r, _KB),
                  r + _cnv_v(b, _KB) - _cnv_v(r, _KB)),
        b,
    )

    if refine:
        r, g, b = _refine(r, g, b, masks, m)
    return jnp.stack([r, g, b], axis=-1)


def _refine(r, g, b, masks, m):
    """Refining step (``refining_step_Menon2007``)."""
    r_m, g_m, b_m = masks[..., 0], masks[..., 1], masks[..., 2]
    h, w = r.shape

    r_g = r - g
    b_g = b - g
    b_g_m = jnp.where(b_m, jnp.where(m, _cnv_h(b_g, _FIR), _cnv_v(b_g, _FIR)), 0.0)
    r_g_m = jnp.where(r_m, jnp.where(m, _cnv_h(r_g, _FIR), _cnv_v(r_g, _FIR)), 0.0)
    g = jnp.where(r_m, r - r_g_m, g)
    g = jnp.where(b_m, b - b_g_m, g)

    r_r = r_m.any(axis=1)[:, None] & np.ones((1, w), bool)
    r_c = r_m.any(axis=0)[None, :] & np.ones((h, 1), bool)
    b_r = b_m.any(axis=1)[:, None] & np.ones((1, w), bool)
    b_c = b_m.any(axis=0)[None, :] & np.ones((h, 1), bool)

    r_g = r - g
    b_g = b - g

    r_g_m = jnp.where(g_m & b_r, _cnv_v(r_g, _KB), r_g_m)
    r = jnp.where(g_m & b_r, g + r_g_m, r)
    r_g_m = jnp.where(g_m & b_c, _cnv_h(r_g, _KB), r_g_m)
    r = jnp.where(g_m & b_c, g + r_g_m, r)

    b_g_m = jnp.where(g_m & r_r, _cnv_v(b_g, _KB), b_g_m)
    b = jnp.where(g_m & r_r, g + b_g_m, b)
    b_g_m = jnp.where(g_m & r_c, _cnv_h(b_g, _KB), b_g_m)
    b = jnp.where(g_m & r_c, g + b_g_m, b)

    # both R and B updates read the SAME pre-update chrominance R-B
    r_b = r - b
    r_b_m = jnp.where(b_m, jnp.where(m, _cnv_h(r_b, _FIR), _cnv_v(r_b, _FIR)), 0.0)
    r = jnp.where(b_m, b + r_b_m, r)
    r_b_m = jnp.where(r_m, jnp.where(m, _cnv_h(r_b, _FIR), _cnv_v(r_b, _FIR)), 0.0)
    b = jnp.where(r_m, r - r_b_m, b)

    return r, g, b


@functools.partial(jax.jit, static_argnames=("pattern", "refining_step"))
def menon2007(cfa: Array, pattern: str = "RGGB", refining_step: bool = True) -> Array:
    """Directional demosaic, batched: ``(B, H, W) -> (B, H, W, 3)``.

    Dtype-preserving for float inputs: the H/V decision ``d_V >= d_H`` can
    tie within fp32 epsilon on synthetic data; float64 inputs (under
    ``jax.experimental.enable_x64``) reproduce the reference bit-for-bit.
    """
    if not jnp.issubdtype(cfa.dtype, jnp.floating):
        cfa = cfa.astype(jnp.float32)
    masks = cfa_masks(cfa.shape[-2:], pattern)
    return jax.vmap(lambda im: _menon_single(im, masks, refining_step))(cfa)
