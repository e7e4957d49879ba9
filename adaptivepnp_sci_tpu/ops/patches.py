"""Patch cropping / stitching for large scenes, vmap-first.

Reference parity: ``utils/crop_into_patches.py:5-29`` (``patches``),
``extract_image_patches`` via ``nn.Unfold`` (``utils/tools.py:30-58``), and
``get_patch`` random 512-crops (``packages/DDnet/utils.py:22-46``). The
reference loops patch indices on the host; here cropping is one reshape
(non-overlapping) or one gather (strided), and the patch axis becomes a vmap
/ shard axis so >512px scenes process as a batch of tiles on the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def crop_patches(x: Array, patch: int) -> tuple[Array, tuple[int, int]]:
    """Non-overlapping tiles: ``(..., H, W, C) -> (Py*Px, ..., p, p, C)``.

    H, W must be divisible by ``patch``. Returns tiles + the (Py, Px) grid
    for :func:`stitch_patches`.
    """
    *lead, h, w, c = x.shape
    py, px = h // patch, w // patch
    t = x.reshape(*lead, py, patch, px, patch, c)
    t = jnp.moveaxis(t, (-5, -3), (0, 1))        # (py, px, ..., p, p, c)
    return t.reshape(py * px, *lead, patch, patch, c), (py, px)


def stitch_patches(tiles: Array, grid: tuple[int, int]) -> Array:
    """Inverse of :func:`crop_patches`."""
    py, px = grid
    n, *lead, p, p2, c = tiles.shape
    t = tiles.reshape(py, px, *lead, p, p2, c)
    t = jnp.moveaxis(t, (0, 1), (-5, -3))
    return t.reshape(*lead, py * p, px * p2, c)


def crop_overlapping(
    x: Array, patch: int, halo: int
) -> tuple[Array, tuple[int, int]]:
    """Overlapping halo windows: ``(..., H, W, C) -> (Py*Px, ..., p+2h, p+2h,
    C)``.

    ``x`` must already be spatially padded by ``halo`` on each side
    (``H = Py*patch + 2*halo``); window ``i`` covers core tile ``i`` plus
    ``halo`` pixels of real context on every side, so adjacent windows
    overlap by ``2*halo``. The cores (``[halo:halo+patch]`` of each window)
    tile the unpadded image exactly — stitch with
    ``stitch_patches(windows[..., halo:halo+patch, halo:halo+patch, :])``.
    The strided/overlapping analogue of the reference's host-side patch
    croppers (``utils/crop_into_patches.py:5-29``, ``utils/tools.py:30-58``).
    """
    *lead, h, w, c = x.shape
    py, px = (h - 2 * halo) // patch, (w - 2 * halo) // patch
    win = patch + 2 * halo

    def crop(y0, x0):
        return jax.lax.dynamic_slice(
            x, (0,) * len(lead) + (y0, x0, 0), tuple(lead) + (win, win, c)
        )

    gy, gx = jnp.meshgrid(jnp.arange(py) * patch, jnp.arange(px) * patch,
                          indexing="ij")
    return jax.vmap(crop)(gy.reshape(-1), gx.reshape(-1)), (py, px)


def strided_patches(x: Array, patch: int, stride: int) -> Array:
    """Overlapping patches of a single image ``(H, W, C) -> (N, p, p, C)``."""
    h, w, c = x.shape
    ys = jnp.arange(0, h - patch + 1, stride)
    xs = jnp.arange(0, w - patch + 1, stride)

    def crop(y0, x0):
        return jax.lax.dynamic_slice(x, (y0, x0, 0), (patch, patch, c))

    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    return jax.vmap(crop)(grid_y.reshape(-1), grid_x.reshape(-1))


def random_crop(key: Array, x: Array, size: int) -> Array:
    """Random square crop (``get_patch`` semantics) of ``(..., H, W, C)``."""
    h, w = x.shape[-3], x.shape[-2]
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - size + 1)
    x0 = jax.random.randint(kx, (), 0, w - size + 1)
    start = (0,) * (x.ndim - 3) + (y0, x0, 0)
    sizes = x.shape[:-3] + (size, size, x.shape[-1])
    return jax.lax.dynamic_slice(x, start, sizes)
