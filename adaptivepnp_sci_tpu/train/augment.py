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


#: reference transform weights: [do_nothing, 7 dihedral modes, add_csnt]
#: (~1/4 chance of identity; ``packages/DDnet/utils.py:73-75``)
_REF_AUG_WEIGHTS = jnp.array([32, 12, 12, 12, 12, 12, 12, 12, 12],
                             jnp.float32) / 148.0


def normalize_augment(key: Array, batch: Array,
                      ctrl_fr_idx: int | None = None) -> tuple[Array, Array]:
    """Reference-faithful ``normalize_augment``
    (``packages/DDnet/utils.py:47-94``): scales a ``(N, F, H, W, C)`` clip
    batch from [0, 255] to [0, 1], applies ONE randomly chosen transform to
    the whole batch — the 8 dihedral modes plus ``add_csnt`` (a per-sample
    constant offset drawn N(0, (5/255)^2)) with the reference's weighted
    choice — and returns ``(augmented, center-frame ground truth)``.

    (:func:`augment_batch` is the per-sample uniform variant the trainers
    use by default; this one replays the reference semantics exactly.)
    """
    img = batch / 255.0
    k_mode, k_noise = jax.random.split(key)
    mode = jax.random.choice(k_mode, 9, p=_REF_AUG_WEIGHTS)

    def csnt(x):
        offs = (5.0 / 255.0) * jax.random.normal(
            k_noise, (x.shape[0],) + (1,) * (x.ndim - 1), x.dtype
        )
        return x + offs

    branches = [lambda x, m=m: apply_mode(x, jnp.int32(m)) for m in range(8)]
    branches.append(csnt)
    out = jax.lax.switch(mode, branches, img)
    c = ctrl_fr_idx if ctrl_fr_idx is not None else batch.shape[1] // 2
    return out, out[:, c]


def random_sigma(key: Array, n: int, lo: float, hi: float) -> Array:
    """Per-sample noise std, uniform in [lo, hi] (already /255-scaled)."""
    return jax.random.uniform(key, (n,), minval=lo, maxval=hi)


def add_gaussian_noise(key: Array, x: Array, sigma: Array) -> Array:
    """Add N(0, sigma^2) noise; sigma broadcasts per leading sample axis."""
    sig = jnp.asarray(sigma).reshape((-1,) + (1,) * (x.ndim - 1))
    return x + sig * jax.random.normal(key, x.shape, x.dtype)
