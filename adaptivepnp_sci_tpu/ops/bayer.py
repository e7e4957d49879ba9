"""Bayer / CFA layout ops.

The whole solver state lives in packed RGGB planes: a full-resolution Bayer
mosaic ``(..., H, W)`` becomes four half-resolution planes ``(..., 4, H/2, W/2)``
ordered ``[R, G1, G2, B]`` (offsets ``[(0,0), (0,1), (1,0), (1,1)]``).

Everything here is a pure reshape/transpose or a broadcasted mask multiply —
XLA lowers them to free layout changes / single VPU passes, replacing the
reference's strided-slice scatter loops
(``/root/reference/utils/utils_image.py:106-171``,
``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:66-82,170-172,206-209``).

Only the RGGB pattern is exercised by the reference drivers; the mask helpers
accept any of the four standard patterns for parity with
``packages/colour_demosaicing/bayer/masks.py:23-72``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array

#: RGGB plane offsets, plane order [R, G1, G2, B].
BAYER_OFFSETS = ((0, 0), (0, 1), (1, 0), (1, 1))


def pack(x: Array) -> Array:
    """Full-res mosaic ``(..., H, W)`` -> packed planes ``(..., 4, H/2, W/2)``.

    Plane ``a*2+b`` holds ``x[..., a::2, b::2]`` (RGGB order).
    """
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2)
    # (..., H/2, 2, W/2, 2) -> (..., 2, 2, H/2, W/2)
    x = jnp.moveaxis(x, (-3, -1), (-4, -3))
    return x.reshape(*lead, 4, h // 2, w // 2)


def unpack(planes: Array) -> Array:
    """Packed planes ``(..., 4, H/2, W/2)`` -> full-res mosaic ``(..., H, W)``."""
    *lead, four, h2, w2 = planes.shape
    assert four == 4, planes.shape
    x = planes.reshape(*lead, 2, 2, h2, w2)
    x = jnp.moveaxis(x, (-4, -3), (-3, -1))
    return x.reshape(*lead, h2 * 2, w2 * 2)


def cfa_masks(shape: tuple[int, int], pattern: str = "RGGB") -> np.ndarray:
    """Boolean CFA masks ``(H, W, 3)`` for the given Bayer pattern.

    Reference parity: ``masks_CFA_Bayer`` /
    ``masks_CFA_Bayer_tensor`` (``/root/reference/packages/colour_demosaicing/
    bayer/masks.py:23-72``, ``/root/reference/utils/utils_image.py:106-112``).
    """
    pattern = pattern.upper()
    masks = {c: np.zeros(shape, dtype=bool) for c in "RGB"}
    for channel, (y, x) in zip(pattern, BAYER_OFFSETS):
        masks[channel][y::2, x::2] = True
    return np.stack([masks[c] for c in "RGB"], axis=-1)


def mosaic(rgb: Array, pattern: str = "RGGB") -> Array:
    """RGB ``(..., H, W, 3)`` -> Bayer mosaic ``(..., H, W)`` by CFA subsampling.

    Reference parity: ``mosaicing_CFA_Bayer`` (``packages/colour_demosaicing/
    bayer/mosaicing.py:25-64``) and ``gen_bayer_img(..., output_ch=1)``
    (``/root/reference/utils/utils_image.py:120-126``).
    """
    m = jnp.asarray(cfa_masks(rgb.shape[-3:-1], pattern), dtype=rgb.dtype)
    return jnp.sum(rgb * m, axis=-1)


def rggb_subsample(rgb: Array) -> Array:
    """RGB frames ``(..., H, W, 3)`` -> packed RGGB planes ``(..., 4, H/2, W/2)``.

    This is the theta-update re-mosaicking of the two-stage ADMM: take R at
    (even, even), G at (even, odd) and (odd, even), B at (odd, odd)
    (``/root/reference/dvp…online.py:206-209``).
    """
    return pack(mosaic(rgb))


def embed_rgb(bayer: Array) -> Array:
    """Bayer mosaic ``(..., H, W)`` -> sparse RGB ``(..., H, W, 3)`` with each
    sample placed in its CFA color channel and zeros elsewhere.

    Reference parity: ``oneCh2ThreeCh`` (``/root/reference/utils/
    utils_image.py:153-161``) — the input format of DDnet joint demosaicking.
    """
    m = jnp.asarray(cfa_masks(bayer.shape[-2:]), dtype=bayer.dtype)
    return bayer[..., None] * m


def planes_to_mosaic_batch(planes: Array) -> Array:
    """Alias of :func:`unpack` for readability at solver call sites."""
    return unpack(planes)
