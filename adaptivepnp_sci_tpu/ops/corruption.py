"""Input-corruption augmentation for adaptation robustness experiments.

Reference parity: ``gen_masked_data`` / ``gen_masked_data_less`` /
``mask_sequence`` (``/root/reference/utils/utils_image.py:17-87``) — spatial
/ temporal / block dropout of frames, optionally applied to the FastDVDnet
adaptation input (``packages/fastdvdnet/test_fastdvdnet.py:360-361``). The
reference mutates tensors in Python loops of random scalar indices; here each
mode is a vectorized masked fill driven by a PRNG key (dropped pixels get
1e-6, matching the reference's ``zero``).

Layout: frame windows ``(N, F, H, W, C)`` (the reference packs frames into
channels ``(N, F*C, H, W)``; its hardcoded channel slice 9:12 is the center
frame of a 5-frame RGB window — here ``F//2`` explicitly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

_ZERO = 1e-6


def mask_spatial(key: Array, x: Array, ratio: float = 0.1) -> Array:
    """Drop a ``ratio`` fraction of the center frame's pixels (all channels)."""
    n, f, h, w, c = x.shape
    drop = jax.random.uniform(key, (h, w)) < ratio
    center = jnp.where(drop[..., None], _ZERO, x[:, f // 2])
    return x.at[:, f // 2].set(center)


def mask_temporal(x: Array) -> Array:
    """Drop the whole center frame."""
    f = x.shape[1]
    return x.at[:, f // 2].set(_ZERO)


def mask_block(key: Array, x: Array, ratio: float = 0.1) -> Array:
    """Drop random (frame, pixel) sites across the window."""
    n, f, h, w, c = x.shape
    drop = jax.random.uniform(key, (f, h, w)) < ratio
    return jnp.where(drop[None, :, :, :, None], _ZERO, x)


def mask_sequence(
    key: Array, x: Array, modes: tuple[str, ...] = ("s",), ratio: float = 0.1
) -> tuple[Array, ...]:
    """Apply each corruption mode, returning one corrupted copy per mode."""
    outs = []
    for i, mode in enumerate(modes):
        sub = jax.random.fold_in(key, i)
        if mode == "s":
            outs.append(mask_spatial(sub, x, ratio))
        elif mode == "t":
            outs.append(mask_temporal(x))
        elif mode == "b":
            outs.append(mask_block(sub, x, ratio))
        else:
            raise ValueError(f"unknown corruption mode {mode!r}")
    return tuple(outs)
