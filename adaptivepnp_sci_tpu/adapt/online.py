"""Online adaptation: fine-tune the denoiser against the measurement itself.

The reference interleaves Adam steps on
``MSE(A(mosaic(denoise(x))), y)`` with the ADMM iterations, gated by
``k > initial_iter and k % interval_iter == 0`` and an update-count cap
(``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:200-203,
247-251``). PyTorch needs ``.train()/.eval()`` bookkeeping and a fresh Adam
object per trigger; here adaptation is a pure function — ``jax.grad`` through
denoiser + re-mosaic + forward model, an optax update carried through the
solver scan — so projection, denoise, and adapt fuse into one XLA program.

Because the schedule depends only on static config, the per-iteration fire
mask is precomputed host-side (:func:`make_schedule`), which exactly encodes
the reference's mutable ``update_i`` counter semantics.
"""

from __future__ import annotations

import functools as _functools
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from adaptivepnp_sci_tpu.ops import bayer, physics

if TYPE_CHECKING:  # avoid a circular import; Prior is duck-typed at runtime
    from adaptivepnp_sci_tpu.solvers.priors import Prior


@dataclass(frozen=True)
class AdaptConfig:
    """Online adaptation schedule (per-scene driver tables,
    ``two_stage_ADMM_Online_FFD_Warm.py:62-151``).

    ``lr``/``update_per_iter`` may be tuples: the reference's per-stage lists
    (``packages/fastdvdnet/test_fastdvdnet.py:344-349,383-385``) — every
    trigger iterates the stages in order, ``update_per_iter[i]`` Adam steps at
    ``lr[i]``, with a FRESH optimizer per stage when
    ``fresh_opt_per_trigger`` is set (the reference always constructs a new
    ``torch.optim.Adam`` per stage/trigger). A scalar on either field
    broadcasts against the other.

    ``fresh_opt_per_trigger`` (default True): reference-faithful optimizer
    semantics — zero Adam moments at every trigger (``packages/ffdnet/
    test_ffdnet_ipol.py:250-251``). ``False`` carries one Adam state through
    the whole solver scan (and across measurements) — this framework's
    extension. Measured (AB_RESULTS.md): identical PSNR/SSIM/speed at the
    production lr=2e-6..2e-7; at aggressive lr the carried trajectory
    diverges as far from the reference as not adapting at all (RESULTS.md),
    so faithful is the default.

    ``trainable_filter``: optional tuple of substrings of parameter paths;
    when set, only matching parameters receive updates — the reference's
    dormant ``fix`` mode that fine-tunes ``temp2`` only
    (``test_fastdvdnet.py:365-373``).

    ``crop``: optional side length — compute each trigger's measurement
    loss on a random even-aligned ``crop x crop`` window of the frame
    instead of the full resolution (extension beyond the reference, which
    adapts on the full frame — ``test_ffdnet_ipol.py:263-294``). The loss
    is a global MSE through a pixel-separable forward model, so any
    Bayer-phase-aligned crop is an unbiased estimator of it; the fwd+bwd
    denoiser pass then costs ``(crop/H)*(crop/W)`` of the full-frame
    adaptation. A/B on the flagship in AB_RESULTS.md.
    """

    lr: float | tuple[float, ...] = 2e-6
    update_per_iter: int | tuple[int, ...] = 2
    initial_iter: int = 1
    interval_iter: int = 5
    update_times: int = -1  # -1 = unlimited
    fresh_opt_per_trigger: bool = True
    trainable_filter: tuple[str, ...] | None = None
    crop: int | None = None


def resolve_stages(adapt: AdaptConfig) -> tuple[tuple[float, int], ...]:
    """Normalize ``(lr, update_per_iter)`` into per-stage ``((lr_i, n_i), ...)``
    pairs, broadcasting scalars (reference list handling,
    ``test_fastdvdnet.py:344-349``)."""
    lrs = adapt.lr if isinstance(adapt.lr, tuple) else (float(adapt.lr),)
    ns = (
        adapt.update_per_iter
        if isinstance(adapt.update_per_iter, tuple)
        else (int(adapt.update_per_iter),)
    )
    if len(lrs) == 1 and len(ns) > 1:
        lrs = lrs * len(ns)
    if len(ns) == 1 and len(lrs) > 1:
        ns = ns * len(lrs)
    if len(lrs) != len(ns):
        raise ValueError(
            f"lr stages ({len(lrs)}) and update_per_iter stages ({len(ns)}) "
            "must match or broadcast"
        )
    return tuple(zip((float(l) for l in lrs), (int(n) for n in ns)))


def first_lr(adapt: AdaptConfig) -> float:
    """Base lr the default optimizer is built with: the first NONZERO stage
    lr — other stages rescale its updates by ``lr_i / base`` (exact for
    Adam, whose step is linear in lr; zero-lr stages scale to exactly zero,
    and a zero BASE would make every rescale 0/0). 1.0 if every stage is 0
    (all updates then rescale to zero anyway)."""
    return next((l for l, _ in resolve_stages(adapt) if l != 0.0), 1.0)


@_functools.lru_cache(maxsize=16)
def default_adam(lr: float) -> optax.GradientTransformation:
    """THE adaptation optimizer: a stable identity per lr (a fresh optax
    object per call would miss the solver's runner cache and recompile
    every measurement), and the identity :func:`make_adapt_fn` checks
    before applying per-stage lr rescaling — the ``lr_i / lr_0`` trick is
    only exact relative to this optimizer's base lr."""
    return optax.adam(lr)


def make_schedule(
    sigma: tuple[float, ...], iters: tuple[int, ...], adapt: AdaptConfig | None
) -> tuple[np.ndarray, np.ndarray]:
    """Flatten the sigma continuation schedule into per-iteration arrays.

    Returns ``(sigma_per_iter [T], adapt_mask [T])`` where the mask replays
    the reference's trigger ``k > initial_iter and k % interval_iter == 0``
    with the ``update_times`` cap.
    """
    sigmas = np.concatenate(
        [np.full(n, s, np.float32) for s, n in zip(sigma, iters)]
    )
    total = int(sigmas.shape[0])
    mask = np.zeros(total, bool)
    if adapt is not None:
        fired = 0
        for k in range(total):
            if (
                k > adapt.initial_iter
                and k % adapt.interval_iter == 0
                and (adapt.update_times < 0 or fired < adapt.update_times)
            ):
                mask[k] = True
                fired += 1
    return sigmas, mask


def measurement_loss_fn(
    prior: "Prior",
    rgb_in: Array,
    sigma: Array,
    y_packed: Array,
    phi_packed: Array,
    y_full: Array,
    phi_full: Array,
) -> Callable[[Any], Array]:
    """Build the self-supervised loss closure for one adaptation trigger.

    Activation memory of the backward pass is bounded by per-block
    rematerialization inside the networks (``nn.remat``) plus the prior's
    optional ``apply_adapt`` variant (sequential window groups) — an
    8-window video denoiser at 512² stores ~25GB of activations unremat'd,
    far beyond one chip's HBM.
    """
    apply = prior.apply_adapt if getattr(prior, "apply_adapt", None) else prior.apply

    if prior.loss_mode == "packed4":

        def loss(params):
            xhat = apply(params, rgb_in, sigma)
            pred = physics.forward(bayer.rggb_subsample(xhat), phi_packed)
            return jnp.mean((pred - y_packed) ** 2)

    else:  # 'bayer1'

        def loss(params):
            xhat = apply(params, rgb_in, sigma)
            pred = physics.forward(bayer.mosaic(xhat), phi_full)
            return jnp.mean((pred - y_full) ** 2)

    return loss


def _trainable_mask(params, filters: tuple[str, ...]):
    """Static per-leaf bool pytree: does the parameter's path contain any of
    the filter substrings? (Reference ``fix`` mode scopes fine-tuning to
    ``model.module.temp2``, ``test_fastdvdnet.py:365-373``.)"""
    import jax.tree_util as jtu

    def leaf_on(path, _v):
        s = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        return any(f in s for f in filters)

    return jtu.tree_map_with_path(leaf_on, params)


def make_adapt_fn(
    prior: "Prior",
    optimizer: optax.GradientTransformation,
    adapt_cfg: AdaptConfig,
    grad_axis: str | None = None,
):
    """Returns ``adapt(variables, opt_state, key, rgb_in, sigma, y_p, phi_p,
    y_f, phi_f) -> (variables, opt_state, key)`` performing the trigger's
    Adam steps (statically unrolled — 1-2 per stage in every reference
    config; per-stage ``(lr, n)`` lists per :func:`resolve_stages`).

    Only the ``'params'`` collection receives gradients; ``batch_stats``
    (BatchNorm running statistics) stay frozen — the reference's BN-freeze
    during FastDVDnet adaptation (``test_fastdvdnet.py:374-379``). With
    ``adapt_cfg.trainable_filter``, gradients outside the matched parameter
    paths are zeroed — with zero gradient, Adam's moments stay exactly zero
    and the update is exactly zero, so out-of-scope parameters are bitwise
    frozen without changing the optimizer-state structure.

    ``adapt_cfg.fresh_opt_per_trigger`` re-initializes the optimizer state at
    the start of every stage of every trigger (the reference constructs a new
    ``torch.optim.Adam`` there); stages beyond the first rescale the
    optimizer's updates by ``lr_i / lr_0``, which is exact for Adam.

    ``grad_axis`` names a mapped axis (vmap/shard_map) to ``pmean`` gradients
    over — used by the tiled solver so all tiles share ONE adapted weight
    copy (DP-style grad sync) instead of drifting apart per tile.
    """
    stages = resolve_stages(adapt_cfg)
    base = first_lr(adapt_cfg)
    if len(stages) > 1 and optimizer is not default_adam(base):
        raise ValueError(
            "per-stage lr lists rescale updates by lr_i/base, which is only "
            "exact relative to the default Adam's base lr — pass "
            "optimizer=None (or adapt.online.default_adam(first_lr(cfg))) "
            "when AdaptConfig.lr is a tuple"
        )

    def adapt(variables, opt_state, key, rgb_in, sigma, y_p, phi_p, y_f, phi_f):
        if prior.adapt_noise_std > 0:
            key, sub = jax.random.split(key)
            rgb_in = rgb_in + prior.adapt_noise_std * jax.random.normal(
                sub, rgb_in.shape, rgb_in.dtype
            )
        if getattr(prior, "adapt_mask", None):
            # reference's optional masked-input ablation during adaptation
            # (gen_masked_data, test_fastdvdnet.py:360-361); the frame cube
            # plays the window axis role
            from adaptivepnp_sci_tpu.ops import corruption

            mode, ratio = prior.adapt_mask
            key, sub = jax.random.split(key)
            win = rgb_in[None]  # (1, B, H, W, 3)
            if mode == "s":
                win = corruption.mask_spatial(sub, win, ratio)
            elif mode == "t":
                win = corruption.mask_temporal(win)
            elif mode == "b":
                win = corruption.mask_block(sub, win, ratio)
            else:
                raise ValueError(f"unknown adapt_mask mode {mode!r}")
            rgb_in = win[0]
        if adapt_cfg.crop is not None:
            # loss on a random Bayer-phase-aligned crop: slice the frame
            # cube AND the measurement/masks consistently (the forward
            # model is pixel-separable, so the cropped MSE is an unbiased
            # estimator of the full-frame loss at (crop/H)(crop/W) cost)
            c = int(adapt_cfg.crop)
            b_n, h, w = phi_f.shape
            if c % 2 or h % 2 or w % 2:
                raise ValueError(f"crop/frame dims must be even, got "
                                 f"crop={c} frame=({h},{w})")
            if c > h or c > w:
                raise ValueError(f"crop {c} exceeds frame ({h},{w})")
            key, sub = jax.random.split(key)
            oy = jax.random.randint(sub, (), 0, (h - c) // 2 + 1) * 2
            key, sub = jax.random.split(key)
            ox = jax.random.randint(sub, (), 0, (w - c) // 2 + 1) * 2
            rgb_in = jax.lax.dynamic_slice(
                rgb_in, (0, oy, ox, 0), (rgb_in.shape[0], c, c, 3))
            y_f = jax.lax.dynamic_slice(y_f, (oy, ox), (c, c))
            phi_f = jax.lax.dynamic_slice(phi_f, (0, oy, ox), (b_n, c, c))
            y_p = bayer.pack(y_f)
            phi_p = bayer.pack(phi_f)
        base_loss = measurement_loss_fn(prior, rgb_in, sigma, y_p, phi_p, y_f, phi_f)
        frozen = {k: v for k, v in variables.items() if k != "params"}
        trainable = variables["params"]
        mask = (
            _trainable_mask(trainable, adapt_cfg.trainable_filter)
            if adapt_cfg.trainable_filter is not None
            else None
        )
        loss = lambda p: base_loss({"params": p, **frozen})  # noqa: E731
        for lr_i, n_i in stages:
            if adapt_cfg.fresh_opt_per_trigger:
                opt_state = optimizer.init(trainable)
            for _ in range(n_i):
                grads = jax.grad(loss)(trainable)
                if mask is not None:
                    grads = jax.tree_util.tree_map(
                        lambda g, m: g if m else jnp.zeros_like(g), grads, mask
                    )
                if grad_axis is not None:
                    grads = jax.lax.pmean(grads, grad_axis)
                updates, opt_state = optimizer.update(grads, opt_state, trainable)
                if lr_i != base:
                    updates = jax.tree_util.tree_map(
                        lambda u: u * (lr_i / base), updates
                    )
                trainable = optax.apply_updates(trainable, updates)
        return {"params": trainable, **frozen}, opt_state, key

    return adapt
