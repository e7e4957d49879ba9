"""SVD orthogonalization regularizer (FFDNet training).

Reference parity: ``svd_orthogonalization`` (``packages/ffdnet/utils.py:
269-301``) — every conv filter bank, viewed as a ``(kh*kw*cin, cout)``
matrix, is replaced by the nearest orthonormal-column matrix ``U @ Vh``.
The Flax NHWC kernel layout ``(kh, kw, cin, cout)`` reshapes to exactly that
matrix, and ``jnp.linalg.svd`` keeps the whole pass on device (the reference
pulls every weight to NumPy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _orthogonalize_kernel(k: jnp.ndarray) -> jnp.ndarray:
    if k.ndim != 4:  # not a conv kernel (bias, BN, scalar weight tensors)
        return k
    kh, kw, cin, cout = k.shape
    mat = k.reshape(kh * kw * cin, cout)
    u, _, vh = jnp.linalg.svd(mat, full_matrices=False)
    return (u @ vh).reshape(kh, kw, cin, cout).astype(k.dtype)


@jax.jit
def svd_orthogonalize(params):
    """Orthogonalize every conv kernel in a params pytree."""
    return jax.tree_util.tree_map(_orthogonalize_kernel, params)
