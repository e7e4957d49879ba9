"""Ring halo exchange for temporally-sharded sliding-window denoising.

The FastDVDnet/DDnet priors read a circular 5-frame window around each frame
(``/root/reference/packages/fastdvdnet/fastdvdnet.py:115``). With the B-frame
cube sharded over the 'frame' mesh axis, each shard only needs ``window//2``
boundary frames from each ring neighbor — two ``lax.ppermute`` collectives
over ICI instead of an all-gather of the whole cube. Because the ring wraps,
the circular-padding semantics of the reference fall out for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def halo_windows(local: Array, axis_name: str, window: int = 5) -> Array:
    """Build per-frame sliding windows of a frame-sharded cube.

    Call inside ``shard_map``. ``local`` is this shard's frames
    ``(B_local, ...)``; returns ``(B_local, window, ...)`` where window ``w``
    of frame ``f`` spans the *global* circular range ``f-hw .. f+hw``.

    Requires ``B_local >= window // 2`` (halos come from immediate ring
    neighbors only) — e.g. B=8 over <=4 shards for 5-frame windows.
    """
    hw = (window - 1) // 2
    b_local = local.shape[0]
    if b_local < hw:
        raise ValueError(
            f"B_local={b_local} < halo={hw}: too many shards for window={window}"
        )
    n = jax.lax.axis_size(axis_name)
    fwd = [(j, (j + 1) % n) for j in range(n)]   # send to right neighbor
    bwd = [(j, (j - 1) % n) for j in range(n)]   # send to left neighbor
    left_halo = jax.lax.ppermute(local[-hw:], axis_name, fwd)
    right_halo = jax.lax.ppermute(local[:hw], axis_name, bwd)
    ext = jnp.concatenate([left_halo, local, right_halo], axis=0)
    idx = jnp.arange(b_local)[:, None] + jnp.arange(window)[None, :]
    return ext[idx]
