"""Training-time augmentation.

Reference parity:
  * ``data_augmentation`` 8-mode flip/rot (``packages/ffdnet/utils.py:133-178``)
  * ``normalize_augment`` — per-batch random flip/rot choice applied on device
    (``packages/DDnet/utils.py:47-94``).

All jitted: the mode is a traced integer driving ``lax.switch`` so augmented
training steps stay one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

# 8 dihedral modes, same numbering as the reference: 0 identity, 1 flipud,
# 2 rot90, 3 rot90+flipud, 4 rot180, 5 rot180+flipud, 6 rot270, 7 rot270+flipud
_MODES = 8


def apply_mode(img: Array, mode: Array) -> Array:
    """Apply dihedral transform ``mode`` to ``(..., H, W, C)`` (H==W for rots)."""

    def rot(k):
        return lambda x: jnp.rot90(x, k=k, axes=(-3, -2))

    def flip(f):
        return lambda x: jnp.flip(f(x), axis=-3)

    branches = [
        lambda x: x, flip(lambda x: x),
        rot(1), flip(rot(1).__call__),
        rot(2), flip(rot(2).__call__),
        rot(3), flip(rot(3).__call__),
    ]
    return jax.lax.switch(mode, branches, img)


def augment_batch(key: Array, batch: Array) -> Array:
    """Random dihedral transform per sample: ``(N, ..., H, W, C)``."""
    modes = jax.random.randint(key, (batch.shape[0],), 0, _MODES)
    return jax.vmap(apply_mode)(batch, modes)


def random_sigma(key: Array, n: int, lo: float, hi: float) -> Array:
    """Per-sample noise std, uniform in [lo, hi] (already /255-scaled)."""
    return jax.random.uniform(key, (n,), minval=lo, maxval=hi)


def add_gaussian_noise(key: Array, x: Array, sigma: Array) -> Array:
    """Add N(0, sigma^2) noise; sigma broadcasts per leading sample axis."""
    sig = jnp.asarray(sigma).reshape((-1,) + (1,) * (x.ndim - 1))
    return x + sig * jax.random.normal(key, x.shape, x.dtype)
