"""Denoiser-prior plugin interface for the PnP solvers.

A prior is a pure function ``(params, rgb, sigma) -> rgb`` over the whole
``(B, H, W, 3)`` frame cube plus the metadata the online-adaptation step
needs. Where the reference loops Python over frames / sliding windows
(``packages/fastdvdnet/fastdvdnet.py:113-139``), these priors batch the frame
or window axis so the TPU sees one large conv program.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class Prior(NamedTuple):
    """A pluggable deep denoiser prior.

    Attributes:
      name: identifier ('ffdnet', 'fastdvd', ...).
      apply: ``(params, rgb (B,H,W,3), sigma scalar) -> (B,H,W,3)``.
      loss_mode: measurement-consistency loss domain for online adaptation —
        'packed4' (FFDNet: 4-channel packed planes,
        ``packages/ffdnet/test_ffdnet_ipol.py:275-291``) or 'bayer1'
        (FastDVDnet: full-res 1-channel mosaic,
        ``packages/fastdvdnet/test_fastdvdnet.py:428-431``).
      adapt_noise_std: gaussian noise added to the adaptation input (FastDVDnet
        uses 5/255, ``test_fastdvdnet.py:359``; FFDNet 0).
    """

    name: str
    apply: Callable[[Any, Array, Array], Array]
    loss_mode: str = "packed4"
    adapt_noise_std: float = 0.0
    #: optional memory-bounded variant used inside the adaptation gradient
    #: (None = same as ``apply``)
    apply_adapt: Callable[[Any, Array, Array], Array] | None = None
    #: optional ('s'|'t'|'b', ratio) input corruption applied to the
    #: adaptation input after the gaussian noise — the reference's
    #: ``gen_masked_data`` hook (``test_fastdvdnet.py:339-340,360-361``)
    adapt_mask: tuple[str, float] | None = None


@functools.lru_cache(maxsize=16)
def ffdnet_prior(model) -> Prior:
    """FFDNet image prior: B frames denoised as one batch.

    Replaces the reference's per-frame loop
    (``packages/ffdnet/test_ffdnet_ipol.py:263-272,303-315``).

    Cached per model (Flax modules hash by configuration): the solver's
    jitted-runner cache keys on the Prior OBJECT, so a driver that rebuilt
    the prior each measurement would silently recompile every measurement.
    """

    def apply(params, rgb: Array, sigma: Array) -> Array:
        return model.apply(params, rgb, sigma)

    return Prior("ffdnet", apply, loss_mode="packed4", adapt_noise_std=0.0)


def window_indices(n_frames: int, window: int = 5) -> Array:
    """Circular sliding-window gather indices ``(B, window)``.

    Window for frame f is ``(f - hw .. f + hw) mod B`` — the reference's
    ``(range(f, f+W) - hw) % N`` (``packages/fastdvdnet/fastdvdnet.py:115``).
    """
    hw = (window - 1) // 2
    return (jnp.arange(n_frames)[:, None] + jnp.arange(window)[None, :] - hw) % n_frames


def window_indices_mirror(n_frames: int, window: int = 5) -> Array:
    """Mirror-border sliding windows — the ``denoise_seq_fastdvdnet`` variant
    (``packages/fastdvdnet/fastdvdnet.py:36-79``): out-of-range neighbors
    reflect off the sequence ends instead of wrapping."""
    hw = (window - 1) // 2
    idx = jnp.arange(n_frames)[:, None] + jnp.arange(window)[None, :] - hw
    idx = jnp.abs(idx)                       # reflect at 0
    return jnp.where(idx >= n_frames, 2 * (n_frames - 1) - idx, idx)


def ddnet_demosaic_param(model, window: int = 5):
    """Parametrized deep joint demosaicker for the solver:
    ``(variables, (B, H, W)) -> (B, H, W, 3)``.

    Embeds each Bayer frame as sparse RGB, gathers circular 5-frame windows,
    and runs DDnet batched over all windows — the semantics of ``test_ddnet``
    / ``ddnet_seqdenoise`` (``/root/reference/packages/DDnet/DDnet_test.py:
    166-204,218-321``) without the per-frame Python loop. Spatial dims are
    reflect-padded to multiples of 4 for the two U-Net downsamplings.

    The variables stay an explicit argument so the solver can thread adapted
    demosaicker weights through its scan carry (in-scan ``dm_update``).
    """
    from adaptivepnp_sci_tpu.ops.bayer import embed_rgb

    def apply(variables: Any, mosaic_frames: Array) -> Array:
        b, h, w = mosaic_frames.shape
        hp, wp = (-h) % 4, (-w) % 4
        rgb = embed_rgb(mosaic_frames)  # (B, H, W, 3)
        if hp or wp:
            rgb = jnp.pad(rgb, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="reflect")
        idx = window_indices(b, window)
        out = model.apply(variables, rgb[idx])
        return out[:, :h, :w]

    return apply


def ddnet_demosaic(model, variables, window: int = 5):
    """Fixed-weight form of :func:`ddnet_demosaic_param`:
    ``(B, H, W) -> (B, H, W, 3)`` with the variables baked into the closure.

    NOT cached (``variables`` is an unhashable pytree): construct it ONCE
    per weight set and reuse the returned closure across measurements — the
    solver's jitted-runner cache keys on this object's identity, so a fresh
    closure per measurement recompiles the whole schedule each time."""
    apply_p = ddnet_demosaic_param(model, window)

    def apply(mosaic_frames: Array) -> Array:
        return apply_p(variables, mosaic_frames)

    return apply


@functools.lru_cache(maxsize=16)
def fastdvd_prior(model, window: int = 5, window_chunk: int | None = None,
                  adapt_window_chunk: int | None = None,
                  adapt_mask: tuple[str, float] | None = None) -> Prior:
    """FastDVDnet temporal prior over circular 5-frame windows.

    Cached per (model, args) like :func:`ffdnet_prior`, so per-measurement
    reconstruction drivers can call it freely without missing the solver's
    jit cache.

    Default path (``window == 5``, no chunking): the model's
    ``seq_circular`` method — temp1 evaluated once per DISTINCT circular
    triplet (B evaluations instead of 3B; window f's triplets are centered
    at f-1, f, f+1 mod B, so consecutive windows share two of three).
    Identical math to per-window evaluation with frozen BN, at half the
    conv work and a third of the temp1 activation footprint.

    ``window_chunk=k`` falls back to explicit window gathering, processed
    in sequential groups of k via ``lax.scan`` (peak memory = one group,
    like the reference's per-frame loop but k-wide) — kept for
    memory-constrained adaptation at large resolutions.
    ``adapt_window_chunk`` optionally tightens the group size further
    inside the adaptation gradient, where stored residuals are the
    dominant memory term.
    """

    def shared_triplet(params, rgb: Array, sigma: Array) -> Array:
        return model.apply(params, rgb, sigma, method="seq_circular")

    def chunked(chunk):
        if chunk is None and window == 5:
            return shared_triplet
        def apply(params, rgb: Array, sigma: Array) -> Array:
            b = rgb.shape[0]
            windows = rgb[window_indices(b, window)]
            if chunk is None or chunk >= b:
                return model.apply(params, windows, sigma)
            assert b % chunk == 0, (b, chunk)
            grouped = windows.reshape((b // chunk, chunk) + windows.shape[1:])

            def one(_, grp):
                return None, model.apply(params, grp, sigma)

            _, outs = jax.lax.scan(one, None, grouped)
            return outs.reshape((b,) + rgb.shape[1:])

        return apply

    return Prior(
        "fastdvd", chunked(window_chunk), loss_mode="bayer1",
        adapt_noise_std=5.0 / 255.0,
        apply_adapt=chunked(adapt_window_chunk or window_chunk),
        adapt_mask=adapt_mask,
    )
