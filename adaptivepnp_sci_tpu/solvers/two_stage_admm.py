"""Two-stage online-adaptive plug-and-play ADMM — the main reconstruction
algorithm (semantics of ``twoStageAdmm_denoise_bayer``,
``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:40-324``).

Stage 1 works on packed Bayer planes (dual ``b``): diagonalized x-update,
demosaic to RGB. Stage 2 works on the RGB cube (dual ``w``, penalty ``tau``):
deep joint denoise, re-mosaic into the theta-update. Online adaptation of the
denoiser fires on a precomputed mask inside the iteration.

TPU-native structure:
  * the full sigma-continuation schedule compiles into ONE XLA program per
    (config, shapes): ``lax.scan`` segments split at the STATIC adaptation
    trigger iterations, which are unrolled with the ``jax.grad`` + optax
    steps compiled inline (no ``lax.cond`` — a rarely-taken conditional
    carrying the denoiser fwd+bwd graph costs ~1 s on its first execution
    per run on TPU, and lowers to execute-both-branches select under vmap);
  * frames are a batch axis everywhere (no per-frame Python loops);
  * solver state stays fp32 (bf16 accumulation error compounds over the
    20-40 iteration chain); the denoiser may run bf16 internally.

The solver returns refined denoiser variables so drivers can carry adapted
weights across measurements (``two_stage_ADMM_Online_FFD_Warm.py:270-275``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from adaptivepnp_sci_tpu.adapt.online import (
    AdaptConfig,
    default_adam,
    first_lr,
    make_adapt_fn,
    make_schedule,
)
from adaptivepnp_sci_tpu.ops import bayer, demosaic, metrics, pallas_kernels, physics, tv
from adaptivepnp_sci_tpu.solvers.priors import Prior


@dataclass(frozen=True)
class ADMMConfig:
    """Static solver configuration (hashable: keys the jit cache)."""

    sigma: tuple[float, ...]
    iters: tuple[int, ...]
    denoiser: str = "ffdnet"          # 'tv' | 'ffdnet' | 'fastdvd'
    demosaic_method: str = "malvar"   # 'malvar' | 'bilinear' | 'menon2007' | 'ddnet'
    closed_form_demosaic: bool = False
    lam: float = 1.0
    gamma: float = 0.01
    tv_weight: float = 0.1
    tv_iters: int = 5
    adapt: AdaptConfig | None = None
    use_pallas: bool | None = None  # None = auto (fused x-update on TPU)
    #: relaxed (averaged) denoiser step: xhat = (1-r)*x + r*D(x). r=1.0 is
    #: the reference's plain PnP step; r<1 damps the denoiser's feedback so
    #: higher-fidelity (less contractive, sigma_max>1) denoisers stay stable
    #: in-loop (averaged-operator PnP, cf. Ryu et al. 2019). A tuple gives a
    #: PER-SIGMA-STAGE schedule (same length as ``sigma``) — e.g. damp only
    #: the large-sigma stages where the denoiser moves the iterate furthest,
    #: full steps at small sigma where fidelity matters. Extension beyond
    #: the reference.
    denoiser_relax: float | tuple[float, ...] = 1.0
    #: measurement-consistency trust fallback (extension beyond the
    #: reference, which always returns the LAST iterate): track the iterate
    #: with the lowest measurement residual ||A(theta) - y||^2 through the
    #: scan — the warm start included as candidate 0 — and return THAT.
    #: Ground-truth-free, so legitimate at reconstruction time. Guards the
    #: failure mode where an imperfect (regenerated-weights) denoiser prior
    #: hallucinates and drags the iterate AWAY from the data manifold: the
    #: result can then never be less measurement-consistent than its own
    #: warm start. Default False = reference semantics.
    select_best: bool = False
    #: held-out variant of ``select_best`` (round-5 extension; 0 = off =
    #: rank by the raw residual). The raw residual is structurally biased
    #: toward the warm start: GAP-TV runs 40 data-consistency-heavy
    #: iterations, so on clean measurements its raw residual is nearly
    #: unbeatable, and the guard can pin the solve at its warm start even
    #: when denoiser iterates are SEVERAL dB better (measured: the
    #: iterate-distilled FastDVDnet beat its warm start by +6 dB unguarded
    #: on textured/photo scenes yet every guarded row pinned — RESULTS.md
    #: round 5, the same bias found for Malvar-vs-DDnet selection). With
    #: ``select_best_holdout=f``, a Bernoulli(f) subset of snapshot pixels
    #: is removed from the solve's ENTIRE data term (x-update AND
    #: adaptation loss; the ``phi_sum`` zero-guard makes the removal exact)
    #: and iterates are ranked by their prediction error of the TRUE
    #: measurement at the held-out pixels — cross-validation, unbiased
    #: between data-consistent and prior-consistent iterates. The warm
    #: start stays candidate 0, so the pin-to-warm-start protection (and
    #: the full-data warm start itself) is unchanged — but candidate 0 is
    #: RANKED by the held-out error of a GAP-TV warm start recomputed
    #: in-graph from the MASKED data (``select_best_warm_iters``
    #: iterations): the passed ``x0_bayer`` was fit to the full
    #: measurement, so its own held-out "prediction" error is a fitting
    #: residual, biased ~0 after 40 data-consistency iterations, and
    #: ranking by it re-creates exactly the pin-to-warm-start bias this
    #: mode exists to remove (measured: with candidate 0 ranked by the
    #: full-data x0, the CV guard pinned every row the raw guard pinned).
    #: If candidate 0 wins the fair ranking, the FULL-data ``x0_bayer`` is
    #: still what gets returned.
    select_best_holdout: float = 0.0
    #: PRNG seed for the held-out pixel mask
    select_best_seed: int = 0
    #: GAP-TV budget for the in-graph masked warm start that ranks
    #: candidate 0 under ``select_best_holdout`` — keep it equal to the
    #: iteration budget of the real warm start passed as ``x0_bayer``
    #: (the pipeline's ``WARM_START_ITERS`` = 40) so the fair stand-in
    #: has the same capacity as the candidate it ranks.
    select_best_warm_iters: int = 40
    #: replay the reference's ITERATION-1 dual-aliasing artifact exactly:
    #: the reference binds x/theta/x0 to one tensor (``dvp…online.py:87-89``)
    #: and its theta-update writes through that alias before the clip
    #: rebinds it (:206-209,265), so in the first iteration only the dual
    #: update ``b += x - theta`` (:267) sees x already overwritten with the
    #: PRE-CLIP theta. Default False = clean ADMM duals (the two differ by
    #: <=0.05 dB fixed-weight, ~0.14 dB through adaptation at toy scale —
    #: see tests/test_reference_parity.py). True = bitwise-faithful mode
    #: for parity pinning.
    faithful_aliasing: bool = False

    @property
    def rho(self) -> float:
        # reference: 0.55 for fastdvd / closed-form, else 1 (dvp…online.py:106-115)
        if self.closed_form_demosaic or self.denoiser == "fastdvd":
            return 0.55
        return 1.0

    @property
    def alpha(self) -> float:
        return 0.01 if self.denoiser == "tv" else 1.0

    @property
    def tau(self) -> float:
        return 10.0 if self.closed_form_demosaic else 100.0


class ADMMResult(NamedTuple):
    x_rgb: Array            # (B, H, W, 3) final denoised RGB cube
    x_bayer: Array          # (B, H, W) final Bayer estimate (from theta)
    psnr_per_frame: Array   # (B,)
    ssim_per_frame: Array   # (B,)
    psnr_trace: Array       # (T,) per-iteration PSNR (zeros without orig)
    variables: Any          # possibly-adapted denoiser variables
    opt_state: Any
    dm_variables: Any = None  # in-scan-adapted demosaicker variables
    dm_opt_state: Any = None


class DmSpec(NamedTuple):
    """In-scan demosaicker adaptation (the reference's ``dm_update``,
    ``/root/reference/packages/DDnet/DDnet_test.py:239-293``): every solver
    iteration runs ``update_per_iter`` Adam steps on the self-consistency
    loss ``MSE(mosaic(demosaic(x)), x)`` before demosaicking, with the DDnet
    variables and optimizer state threaded through the scan carry."""

    apply: Callable[[Any, Array], Array]  # (dm_variables, (B,H,W)) -> (B,H,W,3)
    optimizer: optax.GradientTransformation
    update_per_iter: int = 1
    #: reference-faithful optimizer semantics: the reference constructs a
    #: FRESH torch Adam inside every dm update step
    #: (``DDnet_test.py:278-281``), so each step is a bias-corrected first
    #: Adam step (~ sign-gradient * lr). False carries one Adam state through
    #: the scan (this framework's extension).
    fresh_opt: bool = False


@functools.lru_cache(maxsize=16)
def make_dm_spec(model, lr: float = 1e-6, update_per_iter: int = 1,
                 window: int = 5, fresh_opt: bool = False) -> DmSpec:
    """Cached DmSpec for a DDnet-style Flax module (stable identity keys the
    runner's jit cache across measurements)."""
    from adaptivepnp_sci_tpu.solvers.priors import ddnet_demosaic_param

    return DmSpec(ddnet_demosaic_param(model, window), optax.adam(lr),
                  update_per_iter, fresh_opt)


# Stable identity for the default adaptation optimizer (one object per lr):
# a fresh optax object per call would miss the runner cache and recompile
# every measurement, and make_adapt_fn checks this identity before applying
# per-stage lr rescaling.
_default_adam = default_adam


@functools.lru_cache(maxsize=32)
def _build_runner(
    config: ADMMConfig,
    prior: Prior | None,
    demosaic_fn: Callable | None,
    optimizer: optax.GradientTransformation | None,
    compute_trace: bool,
    grad_axis: str | None = None,
    dm_spec: DmSpec | None = None,
):
    """Build (and cache) the jitted whole-schedule scan for a configuration.

    ``grad_axis``: mapped-axis name for cross-tile/cross-shard adaptation
    gradient ``pmean`` (see :func:`two_stage_admm_tiled`).
    ``dm_spec``: optional in-scan demosaicker adaptation; the runner then
    demosaics with ``dm_spec.apply(dm_variables, ...)`` (carried, adapted
    every iteration) instead of ``demosaic_fn``/``config.demosaic_method``.

    The runner signature is
    ``run(y, phi, x0, orig, variables, opt_state, key, dm_variables,
    dm_opt_state) -> (theta, x_rgb, trace, variables, opt_state,
    dm_variables, dm_opt_state)`` — pass/receive ``None`` dm state when
    ``dm_spec`` is None.
    """
    if dm_spec is not None and config.closed_form_demosaic:
        raise ValueError("in-scan dm adaptation requires a demosaic call "
                         "every iteration (closed_form_demosaic=False)")
    if dm_spec is not None and config.denoiser == "tv":
        raise ValueError("in-scan dm adaptation needs the two-stage deep "
                         "path, not the TV solver")
    sigmas_np, adapt_mask_np = make_schedule(config.sigma, config.iters, config.adapt)
    total_iters = int(sigmas_np.shape[0])
    rho, alpha, tau = config.rho, config.alpha, config.tau

    relax = config.denoiser_relax
    if isinstance(relax, tuple):
        if len(relax) != len(config.sigma):
            raise ValueError(
                f"denoiser_relax stages ({len(relax)}) must match sigma "
                f"stages ({len(config.sigma)})"
            )
        relax_np = np.concatenate(
            [np.full(n, r, np.float32) for r, n in zip(relax, config.iters)]
        )
        use_relax = any(r != 1.0 for r in relax)
    else:
        relax_np = np.full(total_iters, float(relax), np.float32)
        use_relax = relax != 1.0

    do_adapt = config.adapt is not None and prior is not None
    adapt_step = (
        make_adapt_fn(prior, optimizer, config.adapt, grad_axis)
        if do_adapt
        else None
    )

    def run(y_full, phi_full, x0, orig, variables, opt_state, key,
            dm_variables=None, dm_opt_state=None):
        hold_p = None
        if config.select_best and config.select_best_holdout > 0:
            # held-out CV guard: drop a pixel subset from the whole data
            # term, rank iterates by prediction error at those pixels
            hold = jax.random.bernoulli(
                jax.random.PRNGKey(config.select_best_seed),
                config.select_best_holdout, y_full.shape,
            ).astype(y_full.dtype)
            y_true_p = bayer.pack(y_full)
            phi_true_p = bayer.pack(phi_full)
            hold_p = bayer.pack(hold)
            hold_n = jnp.maximum(jnp.sum(hold_p), 1.0)
            y_full = y_full * (1.0 - hold)
            phi_full = phi_full * (1.0 - hold)[None]
        y_p = bayer.pack(y_full)      # (4, H2, W2)
        phi_p = bayer.pack(phi_full)  # (B, 4, H2, W2)
        phi_s = physics.phi_sum(phi_p)
        n_frames, h, w = phi_full.shape
        use_pallas = (
            pallas_kernels.on_tpu() if config.use_pallas is None
            else config.use_pallas
        )
        x_update = (
            pallas_kernels.admm_x_update if use_pallas else physics.admm_x_update
        )
        tv_prox = (
            pallas_kernels.tv_chambolle_fused if use_pallas
            else tv.tv_chambolle_multichannel
        )

        cfa = jnp.asarray(bayer.cfa_masks((h, w)), jnp.float32)

        if demosaic_fn is not None:
            dm = demosaic_fn
        elif config.demosaic_method == "bilinear":
            dm = lambda m: demosaic.bilinear(m)  # noqa: E731
        elif config.demosaic_method == "menon2007":
            from adaptivepnp_sci_tpu.ops.menon2007 import menon2007

            dm = lambda m: menon2007(m)  # noqa: E731
        else:
            dm = lambda m: demosaic.malvar2004(m)  # noqa: E731

        def trace_psnr(theta):
            if not compute_trace:
                return jnp.float32(0)
            return metrics.psnr(orig, bayer.unpack(theta))

        def resid(theta):
            # measurement residual of the CURRENT estimate (select_best):
            # raw ||A(theta)-y||^2, or — with select_best_holdout — the
            # prediction error of the TRUE measurement at the held-out
            # pixels only. Under a mapped tile/shard axis the residual is
            # pmean-ed so every tile takes the SAME best iterate —
            # per-tile selection could mix iterations across tile
            # boundaries and seam the stitched frame.
            if hold_p is None:
                r = jnp.mean((physics.forward(theta, phi_p) - y_p) ** 2)
            else:
                err = (physics.forward(theta, phi_true_p) - y_true_p) ** 2
                r = jnp.sum(err * hold_p) / hold_n
            if grad_axis is not None:
                r = jax.lax.pmean(r, grad_axis)
            return r

        def cand0_resid(x0):
            # ranking statistic for candidate 0 (the warm start). With the
            # CV guard the passed x0 was fit to the FULL measurement, so
            # resid(x0) at held-out pixels is a near-zero fitting residual,
            # not a prediction error — rank instead by a GAP-TV warm start
            # recomputed here from the already-masked data (y_p/phi_p), the
            # fair "what would the warm start predict without those pixels"
            # stand-in. The VALUE returned on a pin stays the full-data x0.
            if hold_p is None:
                return resid(x0)
            from adaptivepnp_sci_tpu.solvers.gap_tv import (
                GapTVConfig,
                _gap_tv_packed,
            )

            wcfg = GapTVConfig(iters=config.select_best_warm_iters,
                               use_pallas=config.use_pallas)
            x_ref, _ = _gap_tv_packed(
                y_p, phi_p, physics.adjoint(y_p, phi_p), None, wcfg, False
            )
            return resid(x_ref)

        if config.denoiser == "tv":

            def step(carry, inp):
                x, theta, b, best_r, best_t = carry
                _sigma, _flag, _k = inp
                x = x_update(theta, b, y_p, phi_p, phi_s, rho, alpha)
                xb = x + b / rho
                theta = tv_prox(xb, weight=config.tv_weight,
                                max_iter=config.tv_iters)
                theta = jnp.clip(theta, 0.0, 1.0)
                b = b + (x - theta)
                if config.select_best:
                    r = resid(theta)
                    take = r < best_r
                    best_r = jnp.where(take, r, best_r)
                    best_t = jnp.where(take, theta, best_t)
                return (x, theta, b, best_r, best_t), trace_psnr(theta)

            if config.select_best:
                init = (x0, x0, jnp.zeros_like(x0), cand0_resid(x0), x0)
            else:
                # scalar placeholders: no forward-model eval, no full-size
                # pass-through array in the scan carry
                init = (x0, x0, jnp.zeros_like(x0), jnp.float32(0),
                        jnp.float32(0))
            xs = (
                jnp.asarray(sigmas_np),
                jnp.asarray(adapt_mask_np),
                jnp.arange(total_iters),
            )
            (x, theta, b, best_r, best_t), trace = jax.lax.scan(step, init, xs)
            if config.select_best:
                theta = best_t
            zero_rgb = jnp.zeros((n_frames, h, w, 3), jnp.float32)
            return theta, zero_rgb, trace, variables, opt_state, None, None

        def step_body(carry, inp, fire: bool):
            (x, theta, b, w_dual, xhat, variables, opt_state, key,
             dm_vars, dm_opt, best) = carry
            sigma, k, relax_k = inp

            x = x_update(theta, b, y_p, phi_p, phi_s, rho, alpha)
            xb_full = bayer.unpack(x + b / rho)  # (B, H, W)

            if dm_spec is not None:
                # in-scan dm_update: self-consistency Adam steps on the
                # demosaicker, then demosaic with the refined weights
                # (DDnet_test.py:239-293 interleaved with the ADMM loop)
                def dm_loss(v):
                    out = dm_spec.apply(v, xb_full)
                    return jnp.mean((bayer.mosaic(out) - xb_full) ** 2) / 3.0

                for _ in range(dm_spec.update_per_iter):
                    if dm_spec.fresh_opt:
                        dm_opt = dm_spec.optimizer.init(dm_vars)
                    grads = jax.grad(dm_loss)(dm_vars)
                    if grad_axis is not None:
                        grads = jax.lax.pmean(grads, grad_axis)
                    dm_updates, dm_opt = dm_spec.optimizer.update(
                        grads, dm_opt, dm_vars
                    )
                    dm_vars = optax.apply_updates(dm_vars, dm_updates)
                x_rgb = dm_spec.apply(dm_vars, xb_full)
            elif config.closed_form_demosaic:
                def closed_form(_):
                    num = (
                        rho * bayer.embed_rgb(bayer.unpack(x))
                        + bayer.embed_rgb(bayer.unpack(b))
                        + tau * xhat
                        + w_dual
                    )
                    out = num / (rho * cfa + tau)
                    if config.denoiser == "ffdnet":
                        out = jnp.clip(out, 0.0, 1.0)
                    return out

                x_rgb = jax.lax.cond(k > 0, closed_form, lambda _: dm(xb_full), None)
            else:
                x_rgb = dm(xb_full)

            x_rgb_w = x_rgb - w_dual / tau

            if do_adapt and fire:
                # the trigger schedule is static, so the fire is compiled in
                # unconditionally at this (unrolled) iteration — see the
                # segment loop below for why there is no lax.cond here
                variables, opt_state, key = adapt_step(
                    variables, opt_state, key, x_rgb_w, sigma, y_p, phi_p,
                    y_full, phi_full
                )

            xhat = prior.apply(variables, x_rgb_w, sigma)
            if use_relax:
                xhat = x_rgb_w + relax_k * (xhat - x_rgb_w)

            theta_pre = bayer.rggb_subsample(xhat)
            theta = jnp.clip(theta_pre, 0.0, 1.0)
            if config.faithful_aliasing:
                # k==0 only: the dual sees the pre-clip theta instead of x
                x_for_dual = jnp.where(k == 0, theta_pre, x)
            else:
                x_for_dual = x
            b = b + (x_for_dual - theta)
            w_dual = w_dual + (x_rgb - xhat)

            if config.select_best:
                best_r, best_t, best_x = best
                r = resid(theta)
                take = r < best_r
                best = (
                    jnp.where(take, r, best_r),
                    jnp.where(take, theta, best_t),
                    jnp.where(take, xhat, best_x),
                )

            carry = (x, theta, b, w_dual, xhat, variables, opt_state, key,
                     dm_vars, dm_opt, best)
            return carry, trace_psnr(theta)

        if config.select_best:
            # candidate 0 = the warm start itself (its RGB view through the
            # initial demosaicker), so the returned iterate can never be less
            # measurement-consistent than the solver's own stage-1 input
            x0_rgb = (
                dm_spec.apply(dm_variables, bayer.unpack(x0))
                if dm_spec is not None
                else dm(bayer.unpack(x0))
            )
            best0 = (cand0_resid(x0), x0, x0_rgb)
        else:
            best0 = (jnp.float32(0), jnp.float32(0), jnp.float32(0))

        carry = (
            x0,
            x0,
            jnp.zeros_like(x0),
            jnp.zeros((n_frames, h, w, 3), jnp.float32),
            jnp.zeros((n_frames, h, w, 3), jnp.float32),
            variables,
            opt_state,
            key,
            dm_variables,
            dm_opt_state,
            best0,
        )

        # The adaptation schedule is STATIC (precomputed host-side), so the
        # solver is laid out as maximal same-mask runs: non-firing runs
        # compile to a ``lax.scan`` of the plain step, an isolated trigger
        # iteration is unrolled fire-inline, and a run of CONSECUTIVE
        # triggers (dense masks, e.g. interval_iter=1) compiles to one
        # ``lax.scan`` of the firing step — so program size stays bounded
        # at both cadence extremes. This replaces the previous
        # lax.cond-inside-scan design: on TPU a rarely-taken conditional
        # whose branch holds the full denoiser fwd+bwd graph costs ~1 s
        # extra on its first execution per program run (measured on the
        # 512^2x8 FastDVD benchmark: cond-in-scan 3.26 s vs 2.29 s
        # segmented, identical math), and under vmap (tiled solver)
        # lax.cond lowers to select, executing the adaptation EVERY
        # iteration. Static segmentation avoids both.
        def xs_slice(lo, hi):
            return (
                jnp.asarray(sigmas_np[lo:hi]),
                jnp.arange(lo, hi),
                jnp.asarray(relax_np[lo:hi]),
            )

        mask = np.asarray(adapt_mask_np, bool)
        run_bounds = [0] + (
            np.nonzero(mask[1:] != mask[:-1])[0] + 1
        ).tolist() + [total_iters]
        traces = []
        for lo, hi in zip(run_bounds[:-1], run_bounds[1:]):
            fire = bool(mask[lo]) if hi > lo else False
            if fire and hi - lo == 1:
                inp = (jnp.float32(sigmas_np[lo]), jnp.int32(lo),
                       jnp.float32(relax_np[lo]))
                carry, tr = step_body(carry, inp, True)
                tr = tr[None]
            else:
                carry, tr = jax.lax.scan(
                    lambda c, i, f=fire: step_body(c, i, f),
                    carry, xs_slice(lo, hi),
                )
            traces.append(tr)
        trace = traces[0] if len(traces) == 1 else jnp.concatenate(traces)

        (x, theta, b, w_dual, xhat, variables, opt_state, key,
         dm_variables, dm_opt_state, best) = carry
        if config.select_best:
            _, theta, xhat = best
        return theta, xhat, trace, variables, opt_state, dm_variables, dm_opt_state

    return jax.jit(run)


def two_stage_admm(
    y_bayer: Array,
    phi_bayer: Array,
    config: ADMMConfig,
    prior: Prior | None = None,
    variables: Any = None,
    x0_bayer: Array | None = None,
    orig_bayer: Array | None = None,
    demosaic_fn: Callable | None = None,
    optimizer: optax.GradientTransformation | None = None,
    opt_state: Any = None,
    key: Array | None = None,
    dm_spec: DmSpec | None = None,
    dm_variables: Any = None,
    dm_opt_state: Any = None,
) -> ADMMResult:
    """Reconstruct one measurement.

    Args:
      y_bayer:    snapshot ``(H, W)``.
      phi_bayer:  masks ``(B, H, W)``.
      config:     solver schedule/penalties (static).
      prior:      deep denoiser plugin (None for 'tv').
      variables:  denoiser Flax variables (carried across measurements).
      x0_bayer:   warm start ``(B, H, W)`` (e.g. GAP-TV output).
      orig_bayer: optional ground truth for metrics.
      demosaic_fn: optional fixed-weight deep demosaicker
        ``(B,H,W)->(B,H,W,3)`` (DDnet).
      optimizer/opt_state: optax transform for online adaptation.
      key:        PRNG key for adaptation input noise.
      dm_spec/dm_variables/dm_opt_state: in-scan demosaicker adaptation
        (see :class:`DmSpec` / :func:`make_dm_spec`); the refined state is
        returned in ``ADMMResult.dm_variables``/``.dm_opt_state`` for
        cross-measurement carry-over.
    """
    y = jnp.asarray(y_bayer, jnp.float32)
    phi = jnp.asarray(phi_bayer, jnp.float32)
    if y.ndim != 2 or phi.ndim != 3 or phi.shape[1:] != y.shape:
        raise ValueError(
            f"expected y (H, W) and phi (B, H, W) with matching spatial dims; "
            f"got y {y.shape}, phi {phi.shape}"
        )
    if y.shape[0] % 2 or y.shape[1] % 2:
        raise ValueError(f"Bayer dims must be even, got {y.shape}")
    if config.denoiser != "tv" and prior is None:
        raise ValueError(f"denoiser={config.denoiser!r} requires a prior")

    if x0_bayer is None:
        x0 = physics.adjoint(bayer.pack(y), bayer.pack(phi))
    else:
        x0 = bayer.pack(jnp.asarray(x0_bayer, jnp.float32))

    if config.adapt is not None and prior is not None:
        if optimizer is None:
            optimizer = _default_adam(first_lr(config.adapt))
        if opt_state is None:
            opt_state = optimizer.init(variables["params"])
    if key is None:
        key = jax.random.PRNGKey(0)

    if dm_spec is not None and dm_opt_state is None:
        dm_opt_state = dm_spec.optimizer.init(dm_variables)

    orig = jnp.asarray(orig_bayer) if orig_bayer is not None else None
    runner = _build_runner(
        config, prior, demosaic_fn, optimizer, orig_bayer is not None,
        None, dm_spec,
    )
    theta, xhat, trace, variables, opt_state, dm_variables, dm_opt_state = runner(
        y, phi, x0, orig, variables, opt_state, key, dm_variables, dm_opt_state
    )

    x_bayer = bayer.unpack(theta)
    if orig is not None:
        p = metrics.psnr_per_frame(orig, x_bayer)
        s = metrics.ssim_per_frame(orig, x_bayer)
    else:
        p = s = jnp.zeros((x_bayer.shape[0],), jnp.float32)
    return ADMMResult(xhat, x_bayer, p, s, trace, variables, opt_state,
                      dm_variables, dm_opt_state)


def two_stage_admm_sequence(
    y_seq: Array,
    phi_bayer: Array,
    config: ADMMConfig,
    prior: Prior | None = None,
    variables: Any = None,
    x0_seq: Array | None = None,
    orig_seq: Array | None = None,
    optimizer: optax.GradientTransformation | None = None,
    dm_spec: DmSpec | None = None,
    dm_variables: Any = None,
) -> ADMMResult:
    """Sequential multi-measurement reconstruction as ONE fused program.

    ``lax.scan`` over the T measurements with the (possibly adapting)
    denoiser variables and Adam state in the carry — the TPU-native form of
    the reference's ``reuse_model`` driver loop
    (``two_stage_ADMM_Online_FFD_Warm.py:241,270-275``): refined weights from
    measurement t initialize measurement t+1, and the whole scene runs in a
    single device dispatch. Results gain a leading ``T`` axis. With
    ``dm_spec``, the in-scan-adapted demosaicker weights are carried across
    measurements the same way.
    """
    t = y_seq.shape[0]
    y = jnp.asarray(y_seq, jnp.float32)
    phi = jnp.asarray(phi_bayer, jnp.float32)

    if x0_seq is None:
        phi_p = bayer.pack(phi)
        x0 = jax.vmap(lambda yy: physics.adjoint(bayer.pack(yy), phi_p))(y)
    else:
        x0 = jax.vmap(bayer.pack)(jnp.asarray(x0_seq, jnp.float32))

    opt_state = None
    if config.adapt is not None and prior is not None:
        if optimizer is None:
            optimizer = _default_adam(first_lr(config.adapt))
        opt_state = optimizer.init(variables["params"])

    dm_opt_state = None
    if dm_spec is not None:
        dm_opt_state = dm_spec.optimizer.init(dm_variables)

    orig = jnp.asarray(orig_seq) if orig_seq is not None else None
    runner = _build_runner(config, prior, None, optimizer, orig is not None,
                           None, dm_spec)
    keys = jax.random.split(jax.random.PRNGKey(0), t)

    @jax.jit
    def run_all(y, x0, orig, variables, opt_state, keys, dm_vars, dm_opt):
        def step(carry, inp):
            variables, opt_state, dm_vars, dm_opt = carry
            if orig is not None:
                y_i, x0_i, orig_i, key_i = inp
            else:
                y_i, x0_i, key_i = inp
                orig_i = None
            theta, xhat, trace, variables, opt_state, dm_vars, dm_opt = runner(
                y_i, phi, x0_i, orig_i, variables, opt_state, key_i,
                dm_vars, dm_opt,
            )
            return (variables, opt_state, dm_vars, dm_opt), (theta, xhat, trace)

        xs = (y, x0, orig, keys) if orig is not None else (y, x0, keys)
        (variables, opt_state, dm_vars, dm_opt), (theta, xhat, trace) = (
            jax.lax.scan(step, (variables, opt_state, dm_vars, dm_opt), xs)
        )
        return theta, xhat, trace, variables, opt_state, dm_vars, dm_opt

    theta, xhat, trace, out_vars, out_opt, out_dm, out_dm_opt = run_all(
        y, x0, orig, variables, opt_state, keys, dm_variables, dm_opt_state
    )
    x_bayer = jax.vmap(bayer.unpack)(theta)
    if orig is not None:
        p = jax.vmap(metrics.psnr_per_frame)(orig, x_bayer)
        s = jax.vmap(metrics.ssim_per_frame)(orig, x_bayer)
    else:
        p = s = jnp.zeros(x_bayer.shape[:2], jnp.float32)
    return ADMMResult(xhat, x_bayer, p, s, trace, out_vars, out_opt,
                      out_dm, out_dm_opt)


def two_stage_admm_tiled(
    y_bayer: Array,
    phi_bayer: Array,
    config: ADMMConfig,
    tile: int = 512,
    prior: Prior | None = None,
    variables: Any = None,
    orig_bayer: Array | None = None,
    demosaic_fn: Callable | None = None,
    mesh=None,
    x0_bayer: Array | None = None,
    opt_state: Any = None,
    dm_spec: DmSpec | None = None,
    dm_variables: Any = None,
    dm_opt_state: Any = None,
    key: Array | None = None,
    overlap: int = 0,
    tile_chunk: int | None = None,
) -> ADMMResult:
    """Large-scene mode: reconstruct one oversized measurement as a vmap
    batch of ``tile x tile`` patches, then stitch.

    ``tile_chunk``: process the tile batch in sequential groups of this
    size (must divide the tile count; default = all tiles at once). The
    concurrent-tile program's peak HBM scales with the group size — at
    2048²x8 the 16-tile ADAPTIVE program needs ~46 GB of concurrent
    backward activations (>1 chip), while 4 sequential 4-tile groups are
    exactly four of the proven 1024² programs. Adaptation becomes
    GROUP-SEQUENTIAL: gradients are pmean-shared within a group, and the
    adapted weights/optimizer state carry into the next group (the spatial
    analogue of the reference's cross-measurement ``reuse_model`` carry,
    ``two_stage_ADMM_Online_FFD_Warm.py:270-275``) — later groups start
    from better-adapted weights; the returned ``variables`` are the last
    group's. With ``select_best``, iterate selection is per group (the
    cross-tile pmean spans one group), so prefer ``overlap`` halos when
    combining the two.

    The SCI x-update is pixel-separable, so tiling is exact for the data
    term; only the denoiser/demosaicker see tile borders (the reference
    handles >512px scenes the same way, with host-side patch croppers —
    ``utils/crop_into_patches.py:5-29``). ``tile`` must be even and divide
    H and W. The tile axis composes with a ('data',) mesh for multi-chip.

    ``overlap`` (even, in pixels): halo-overlap mode — each tile is solved
    on a ``(tile+2*overlap)``-wide window carrying real image context
    across its borders, and only the central ``tile`` core is stitched, so
    the denoiser/demosaicker never see a hard border at an interior seam
    (the spatial analogue of ``parallel/halo.py``'s frame halos). Scene
    edges are reflect-padded — reflection commutes with the acquisition
    model (a mirrored measurement IS the measurement of the mirrored
    scene) and an EVEN overlap preserves the Bayer phase. Seam-band deltas
    with/without overlap are measured in RESULTS.md
    (``scripts/measure_tile_seams.py``).

    ``config.select_best`` composes with tiling: the measurement residual
    is pmean-ed over the tile axis inside the scan, so every tile takes
    the SAME best iterate (per-tile selection could stitch different
    iterations on the two sides of a seam).

    With ``config.adapt`` set, all tiles share ONE adapted weight copy: the
    tile axis is vmapped with an axis name and adaptation gradients are
    ``pmean``-ed over it every trigger (DP-style sync), so the returned
    ``variables`` are the single shared weights — not a per-tile stack.
    ``dm_spec`` (in-scan DDnet adaptation, the reference's ``dm_update`` —
    ``DDnet_test.py:239-293``) threads the same way: demosaicker gradients
    are pmean-shared over the tile axis every iteration and the single
    refined copy is returned in ``.dm_variables``/``.dm_opt_state``.

    ``opt_state``/``dm_opt_state`` may be passed in to continue adaptation
    across measurements (the drivers' ``reuse_model`` sequence carry,
    ``two_stage_ADMM_Online_FFD_Warm.py:270-275``).

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``'data'`` axis — the
    tile batch is placed with a ``P('data')`` sharding so XLA partitions the
    vmap over chips (grad/dm-grad pmean becomes a real cross-chip
    all-reduce).

    ``x0_bayer``: full-size warm start ``(B, H, W)`` (GAP-TV, the
    reference's mandatory stage 1) — cropped into tiles. Without it each
    tile starts from the raw adjoint, where the two-stage solver stalls
    near init (measured 8.1 dB vs 47.8 warm-started at 1024²) — pass it
    for any real use; the default stays for the adjoint-vs-solver tests.
    """
    h, w = y_bayer.shape
    assert h % tile == 0 and w % tile == 0 and tile % 2 == 0, (h, w, tile)
    assert overlap >= 0 and overlap % 2 == 0, overlap  # even: Bayer phase
    y = jnp.asarray(y_bayer, jnp.float32)
    phi = jnp.asarray(phi_bayer, jnp.float32)

    from adaptivepnp_sci_tpu.ops.patches import (
        crop_overlapping,
        crop_patches,
        stitch_patches,
    )

    def crop(arr):
        # (..., H, W, C) -> (N, ..., win, win, C); win = tile + 2*overlap
        if overlap:
            pad = [(0, 0)] * (arr.ndim - 3) + [(overlap, overlap)] * 2 + [(0, 0)]
            return crop_overlapping(jnp.pad(arr, pad, mode="reflect"),
                                    tile, overlap)
        return crop_patches(arr, tile)

    y_t, grid = crop(y[..., None])                       # (N, win, win, 1)
    y_t = y_t[..., 0]
    phi_t, _ = crop(jnp.moveaxis(phi, 0, -1))            # (N, win, win, B)
    phi_t = jnp.moveaxis(phi_t, -1, 1)                   # (N, B, win, win)

    orig = jnp.asarray(orig_bayer) if orig_bayer is not None else None
    orig_t = None
    if orig is not None:
        orig_t, _ = crop(jnp.moveaxis(orig, 0, -1))
        orig_t = jnp.moveaxis(orig_t, -1, 1)
    x0_t = None
    if x0_bayer is not None:
        x0_t, _ = crop(jnp.moveaxis(jnp.asarray(x0_bayer, jnp.float32), 0, -1))
        x0_t = jnp.moveaxis(x0_t, -1, 1)                 # (N, B, win, win)

    optimizer = None
    do_adapt = config.adapt is not None and prior is not None
    if do_adapt:
        optimizer = _default_adam(first_lr(config.adapt))
        if opt_state is None:
            opt_state = optimizer.init(variables["params"])
    else:
        opt_state = None
    if dm_spec is not None and dm_opt_state is None:
        dm_opt_state = dm_spec.optimizer.init(dm_variables)

    grad_axis = (
        "tile" if (do_adapt or dm_spec is not None or config.select_best)
        else None
    )
    runner = _build_runner(
        config, prior, demosaic_fn, optimizer, orig is not None, grad_axis,
        dm_spec,
    )
    # per-measurement key so a carried SEQUENCE of tiled solves draws fresh
    # adaptation randomness (crop offsets / input noise) each measurement
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, y_t.shape[0])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        tile_sharding = NamedSharding(mesh, P("data"))
        y_t = jax.device_put(y_t, tile_sharding)
        phi_t = jax.device_put(phi_t, tile_sharding)
        keys = jax.device_put(keys, tile_sharding)
        if orig_t is not None:
            orig_t = jax.device_put(orig_t, tile_sharding)
        if x0_t is not None:
            x0_t = jax.device_put(x0_t, tile_sharding)

    n_tiles = int(y_t.shape[0])
    chunk = n_tiles if tile_chunk is None else int(tile_chunk)
    if not 1 <= chunk <= n_tiles or n_tiles % chunk:
        raise ValueError(
            f"tile_chunk {tile_chunk} must divide the tile count {n_tiles}"
        )

    def run_chunk(y_c, phi_c, orig_c, keys_c, x0_c, vars_c, opt_c, dm_c,
                  dm_opt_c):
        def one(y_i, phi_i, orig_i, key_i, x0_i):
            if x0_i is None:
                x0 = physics.adjoint(bayer.pack(y_i), bayer.pack(phi_i))
            else:
                x0 = bayer.pack(x0_i)
            return runner(y_i, phi_i, x0, orig_i, vars_c, opt_c, key_i,
                          dm_c, dm_opt_c)

        # None arguments are empty pytrees: vmap maps over no leaves for
        # them, so one vmap covers every orig/x0 presence combination
        return jax.vmap(one, axis_name=grad_axis)(y_c, phi_c, orig_c,
                                                  keys_c, x0_c)

    # every tile carries identical weights — pmean-synced when adapting,
    # vmap-broadcast copies of the inputs otherwise — so ALWAYS return the
    # single shared copy (a tile-stacked pytree carried to the next
    # measurement by run_reconstruction would crash the denoiser apply)
    first = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)  # noqa: E731
    out_vars, out_opt = variables, opt_state
    out_dm, out_dm_opt = dm_variables, dm_opt_state
    thetas, xhats, traces = [], [], []
    for c0 in range(0, n_tiles, chunk):
        sl = slice(c0, c0 + chunk)
        (theta_c, xhat_c, trace_c, out_vars, out_opt, out_dm,
         out_dm_opt) = run_chunk(
            y_t[sl], phi_t[sl],
            None if orig_t is None else orig_t[sl], keys[sl],
            None if x0_t is None else x0_t[sl],
            out_vars, out_opt, out_dm, out_dm_opt,
        )
        out_vars, out_opt = first(out_vars), first(out_opt)
        out_dm, out_dm_opt = first(out_dm), first(out_dm_opt)
        thetas.append(theta_c)
        xhats.append(xhat_c)
        traces.append(trace_c)
    if chunk == n_tiles:
        theta, xhat, trace = thetas[0], xhats[0], traces[0]
    else:
        theta = jnp.concatenate(thetas)
        xhat = jnp.concatenate(xhats)
        trace = jnp.concatenate(traces)

    x_bayer_t = jax.vmap(bayer.unpack)(theta)  # (N, B, win, win)
    if overlap:
        # keep only the central core: borders seen by the denoiser are in
        # the discarded halo, never at a stitched seam
        core = slice(overlap, overlap + tile)
        x_bayer_t = x_bayer_t[:, :, core, core]
        xhat = xhat[:, :, core, core, :]
    x_bayer = jnp.moveaxis(
        stitch_patches(jnp.moveaxis(x_bayer_t, 1, -1), grid), -1, 0
    )
    nb = phi.shape[0]
    # stitch RGB: xhat (N, B, tile, tile, 3) -> fold (B, 3) into channels
    xr = jnp.moveaxis(xhat, 1, -2)            # (N, tile, tile, B, 3)
    xr = xr.reshape(xhat.shape[0], tile, tile, nb * 3)
    xr = stitch_patches(xr, grid)             # (H, W, B*3)
    x_rgb = jnp.moveaxis(xr.reshape(h, w, nb, 3), 2, 0)

    if orig is not None:
        p = metrics.psnr_per_frame(orig, x_bayer)
        s = metrics.ssim_per_frame(orig, x_bayer)
        trace = trace.mean(axis=0)
    else:
        p = s = jnp.zeros((nb,), jnp.float32)
        trace = trace[0] * 0
    return ADMMResult(x_rgb, x_bayer, p, s, trace, out_vars, out_opt,
                      out_dm, out_dm_opt)


def two_stage_admm_batched(
    y_batch: Array,
    phi_bayer: Array,
    config: ADMMConfig,
    prior: Prior | None = None,
    variables: Any = None,
    x0_batch: Array | None = None,
    orig_batch: Array | None = None,
    demosaic_fn: Callable | None = None,
    optimizer: optax.GradientTransformation | None = None,
    opt_state: Any = None,
    key: Array | None = None,
    dm_spec: DmSpec | None = None,
    dm_variables: Any = None,
    dm_opt_state: Any = None,
) -> ADMMResult:
    """Throughput mode: reconstruct ``T`` measurements of one scene as a vmap
    batch (every result field gains a leading ``T`` axis).

    The vmap axis replaces the reference's sequential per-measurement loop;
    each measurement carries its own adaptation state (no cross-measurement
    weight reuse — use :func:`adaptivepnp_sci_tpu.pipelines.run_reconstruction`
    for the reference's sequential ``reuse_model`` semantics). The batch axis
    composes with a ('data',) mesh sharding for multi-chip throughput.

    ``key``/``opt_state``/``dm_spec``/``dm_variables``/``dm_opt_state``
    mirror :func:`two_stage_admm`: the key is split per measurement; the
    (dm_)opt_state/dm_variables initialize EACH measurement's independent
    adaptation, and the returned states are stacked over ``T``.
    """
    t = y_batch.shape[0]
    y = jnp.asarray(y_batch, jnp.float32)
    phi = jnp.asarray(phi_bayer, jnp.float32)

    if x0_batch is None:
        x0 = jax.vmap(lambda yy: physics.adjoint(bayer.pack(yy), bayer.pack(phi)))(y)
    else:
        x0 = jax.vmap(bayer.pack)(jnp.asarray(x0_batch, jnp.float32))

    if config.adapt is not None and prior is not None:
        if optimizer is None:
            optimizer = _default_adam(first_lr(config.adapt))
        if opt_state is None:
            opt_state = optimizer.init(variables["params"])
    else:
        opt_state = None
    if dm_spec is not None and dm_opt_state is None:
        dm_opt_state = dm_spec.optimizer.init(dm_variables)

    orig = jnp.asarray(orig_batch) if orig_batch is not None else None
    runner = _build_runner(
        config, prior, demosaic_fn, optimizer, orig_batch is not None,
        None, dm_spec,
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, t)

    def one(y_i, x0_i, orig_i, k_i):
        return runner(y_i, phi, x0_i, orig_i, variables, opt_state, k_i,
                      dm_variables, dm_opt_state)

    # None orig is an empty pytree: vmap maps over no leaves for it, so one
    # vmap covers both metric modes (same pattern as two_stage_admm_tiled)
    theta, xhat, trace, out_vars, out_opt, out_dm, out_dm_opt = jax.vmap(one)(
        y, x0, orig, keys
    )

    x_bayer = jax.vmap(bayer.unpack)(theta)
    if orig is not None:
        p = jax.vmap(metrics.psnr_per_frame)(orig, x_bayer)
        s = jax.vmap(metrics.ssim_per_frame)(orig, x_bayer)
    else:
        p = s = jnp.zeros(x_bayer.shape[:2], jnp.float32)
    return ADMMResult(xhat, x_bayer, p, s, trace, out_vars, out_opt,
                      out_dm, out_dm_opt)
