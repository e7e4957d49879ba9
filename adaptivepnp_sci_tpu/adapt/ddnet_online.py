"""Online adaptation of the DDnet joint demosaicker (``dm_update``).

Reference semantics (``/root/reference/packages/DDnet/DDnet_test.py:239-293``):
Adam steps on the self-consistency loss ``MSE(input, re-mosaic(output))``
over the sparse-RGB frame windows, then a final no-grad demosaic pass.

Note: in the reference this path is dormant — the drivers call ``test_ddnet``
without ``args``, so ``dm_update`` is never enabled (``DDnet_test.py:218-224``).
Here it is a first-class pure function; the sequential pipeline adapts DDnet
per measurement on the current Bayer estimate and carries the refined
variables forward (``dm_update=True`` in
:func:`adaptivepnp_sci_tpu.pipelines.run_reconstruction`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax import Array

from adaptivepnp_sci_tpu.ops import bayer
from adaptivepnp_sci_tpu.solvers.priors import window_indices


def dm_consistency_loss(model, variables, mosaic_frames: Array,
                        window: int = 5) -> Array:
    """``MSE(sparse_rgb_in, sparse_rgb(mosaic(out)))`` over all frames.

    The reference compares sparse-RGB tensors, where 2/3 of entries are zero
    in both operands — equivalent to the Bayer-domain MSE divided by 3 (the
    exact gradient scale is preserved).
    """
    b = mosaic_frames.shape[0]
    rgb_in = bayer.embed_rgb(mosaic_frames)
    out = model.apply(variables, rgb_in[window_indices(b, window)])
    return jnp.mean((bayer.mosaic(out) - mosaic_frames) ** 2) / 3.0


def make_dm_adapt_fn(model, lr: float = 1e-6, update_per_iter: int = 1,
                     window: int = 5, fresh_opt: bool = False):
    """Returns jitted ``adapt(variables, opt_state, mosaic_frames) ->
    (variables, opt_state, loss)`` running ``update_per_iter`` Adam steps.

    ``fresh_opt`` re-initializes the optimizer state before EVERY step —
    the reference constructs a new ``torch.optim.Adam`` inside each update
    (``DDnet_test.py:278-281``); the default carries one Adam state across
    steps and measurements (this framework's extension)."""
    optimizer = optax.adam(lr)

    @jax.jit
    def adapt(variables, opt_state, mosaic_frames):
        loss_val = jnp.float32(0)
        for _ in range(update_per_iter):
            if fresh_opt:
                opt_state = optimizer.init(variables)
            loss_val, grads = jax.value_and_grad(
                lambda v: dm_consistency_loss(model, v, mosaic_frames, window)
            )(variables)
            updates, opt_state = optimizer.update(grads, opt_state, variables)
            variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss_val

    def init_opt(variables) -> Any:
        return optimizer.init(variables)

    adapt.init_opt = init_opt
    return adapt
