"""Training task definitions: on-device batch synthesis + loss per network.

Each task is a pure ``(variables, key, raw_batch) -> (loss, new_batch_stats)``
so the whole step (augment -> noise -> forward -> loss) jits into one program.

Reference parity:
  * FFDNet: random sigma in [0, 75]/255, loss MSE/2
    (``packages/ffdnet/train.py:126-154``, noise interval ``:252``);
  * FastDVDnet: 5-frame clips, sigma in [5, 55]/255, loss vs clean center
    frame /2, train-mode BN (``packages/fastdvdnet/train_fastdvdnet.py:
    118-136``);
  * DDnet: sigma = 1/255, every frame mosaicked to sparse RGB, target = the
    *noisy* center frame (``packages/DDnet/train_DDnet.py:114-124``).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from adaptivepnp_sci_tpu.ops import bayer
from adaptivepnp_sci_tpu.train.augment import add_gaussian_noise, augment_batch


class TrainTask(NamedTuple):
    name: str
    loss_fn: Callable[[Any, Array, Array], tuple[Array, Any]]
    # (variables, key, raw_batch) -> (loss, mutated_collections or {})


def ffdnet_task(model, sigma_range: tuple[float, float] = (0.0, 75 / 255)) -> TrainTask:
    def loss_fn(variables, key, clean):
        k1, k2, k3 = jax.random.split(key, 3)
        clean = augment_batch(k1, clean)
        sigma = jax.random.uniform(
            k2, (clean.shape[0],), minval=sigma_range[0], maxval=sigma_range[1]
        )
        noisy = add_gaussian_noise(k3, clean, sigma)
        out = model.apply(variables, noisy, sigma)
        return jnp.mean((out - clean) ** 2) / 2.0, {}

    return TrainTask("ffdnet", loss_fn)


def fastdvd_task(
    model,
    sigma_range: tuple[float, float] = (5 / 255, 55 / 255),
    demosaic_aug: bool = False,
    lipschitz_penalty: float = 0.0,
    spectral_penalty: float = 0.0,
    spectral_iters: int = 2,
    spectral_target: float = 1.0,
    teacher: Callable[[Array, Array], Array] | None = None,
    distill_weight: float = 1.0,
) -> TrainTask:
    """``demosaic_aug`` passes half the inputs through mosaic->Malvar before
    noising: inside the PnP solver the denoiser sees demosaicked ADMM
    iterates, not clean RGB, and a net trained only on clean inputs
    extrapolates badly on that distribution (dual drift blows up).

    ``lipschitz_penalty`` adds a stochastic contractiveness regularizer
    ``relu(||f(x+d)-f(x)||^2/||d||^2 - 1)``: plug-and-play convergence needs
    a (near-)nonexpansive denoiser, which plain MSE training does not give
    (PnP-ADMM fixed-point theory, e.g. Chan et al. 2017 / Ryu et al. 2019).
    Costs one extra forward per step. Measured round 1: it did NOT rescue
    stability (21.1 dB in-loop) — superseded by ``spectral_penalty``.

    ``spectral_penalty`` is the deterministic replacement: per-sample power
    iteration (``spectral_iters`` rounds of J^T J via jvp+vjp) estimates the
    top singular value of the denoiser's input->output Jacobian and penalizes
    ``relu(sigma_max - spectral_target)^2``. Two details matter:

    * the Jacobian is taken through the EVAL-mode network (frozen BN
      running stats) — the operator the PnP solver actually iterates; the
      stochastic penalty probed the train-mode operator, one reason it
      failed;
    * power iteration targets the top singular DIRECTION instead of a
      random perturbation, so the penalty bites exactly where the ADMM
      feedback loop can amplify.

    Measured outcome (round 2): the penalty holds sigma_max at the target on
    TRAINING inputs but not on held-out data — the instability of
    longer-trained checkpoints was OVERFITTING of the small clip pool, and
    enlarging the pool (regenerate_weights n_clips=4096) fixes stability
    with no penalty at all (see ROADMAP.md). Kept for diagnostics and for
    genuinely small-data regimes.

    ``teacher``: distillation target ``(noisy_center, sigma) -> x_hat``
    (e.g. the real-weight FFDNet applied per frame). MSE-to-clean on
    procedural clips teaches the net to invert THIS generator — the
    measured cause of the in-loop hallucination on non-smooth scenes
    (ROADMAP 'Quality bounds'): clean targets on sharp-edged styles make
    the operator expansive off-manifold. A teacher with real natural-image
    weights provides targets that encode its natural-image prior AND its
    contraction behavior on any input style, so mixed-style pools become
    trainable. ``distill_weight`` in [0,1] blends the losses:
    ``(1-w)*MSE(out, clean_center) + w*MSE(out, teacher(noisy_center))``.
    The teacher sees the SAME conditioning sigma as the student (including
    the mismatched-sigma fraction), mirroring how the PnP loop conditions
    both operators from the same schedule.
    """

    def loss_fn(variables, key, clips):  # clips (N, 5, H, W, 3)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        clips = augment_batch(k1, clips)
        net_in = clips
        if demosaic_aug:
            from adaptivepnp_sci_tpu.ops import bayer as _bayer
            from adaptivepnp_sci_tpu.ops.demosaic import malvar2004

            n, f, h, w, _ = clips.shape
            dm = malvar2004(
                _bayer.mosaic(clips.reshape(n * f, h, w, 3))
            ).reshape(clips.shape)
            use_dm = jax.random.bernoulli(k4, 0.5, (n, 1, 1, 1, 1))
            net_in = jnp.where(use_dm, dm, clips)
        k5, k6, k6b = jax.random.split(k2, 3)
        sigma = jax.random.uniform(
            k5, (clips.shape[0],), minval=sigma_range[0], maxval=sigma_range[1]
        )
        # mismatched-sigma robustness: inside the PnP loop the input is
        # already partially denoised, so the actual noise is BELOW the
        # conditioning sigma; train half the batch that way or the net turns
        # expansive at low sigma and the ADMM iteration diverges.
        # (bernoulli and uniform need INDEPENDENT keys: bernoulli(k,.5) ==
        # uniform(k) < 0.5, so sharing one key means the non-unity branch
        # only ever draws fracs in [0.5, 1).)
        frac = jnp.where(
            jax.random.bernoulli(k6, 0.5, (clips.shape[0],)),
            1.0,
            jax.random.uniform(k6b, (clips.shape[0],)),
        )
        noisy = add_gaussian_noise(k3, net_in, sigma * frac)
        out, mutated = model.apply(
            variables, noisy, sigma, train=True, mutable=["batch_stats"]
        )
        center = clips[:, clips.shape[1] // 2]
        loss = jnp.mean((out - center) ** 2) / 2.0
        if teacher is not None:
            t_out = jax.lax.stop_gradient(
                teacher(noisy[:, noisy.shape[1] // 2], sigma))
            loss = (1.0 - distill_weight) * loss + distill_weight * (
                jnp.mean((out - t_out) ** 2) / 2.0)
        if lipschitz_penalty > 0:
            k7, k8 = jax.random.split(jax.random.fold_in(key, 7))
            delta = 0.02 * jax.random.normal(k7, noisy.shape, noisy.dtype)
            out2, _ = model.apply(
                variables, noisy + delta, sigma, train=True,
                mutable=["batch_stats"],
            )
            num = jnp.sum((out2 - out) ** 2, axis=(1, 2, 3))
            # compare against the center-frame slice of the perturbation: the
            # PnP iteration feeds the denoiser's center-frame output back as
            # the next center frame, so that's the contraction that matters
            den = jnp.sum(delta[:, delta.shape[1] // 2] ** 2, axis=(1, 2, 3))
            ratio = num / jnp.maximum(den, 1e-12)
            loss = loss + lipschitz_penalty * jnp.mean(
                jax.nn.relu(ratio - 1.0)
            )
        if spectral_penalty > 0:
            k9 = jax.random.fold_in(key, 9)

            def f(x):
                # eval-mode operator: frozen BN — what the solver iterates
                return model.apply(variables, x, sigma)

            def _norm(v, axes):
                return jnp.sqrt(jnp.maximum(
                    jnp.sum(v * v, axis=axes, keepdims=True), 1e-20))

            u = jax.random.normal(k9, noisy.shape, noisy.dtype)
            u = u / _norm(u, (1, 2, 3, 4))
            for _ in range(spectral_iters):
                _, ju = jax.jvp(f, (noisy,), (u,))
                _, vjp_fn = jax.vjp(f, noisy)
                u = vjp_fn(ju)[0]
                u = u / _norm(u, (1, 2, 3, 4))
            u = jax.lax.stop_gradient(u)
            _, ju = jax.jvp(f, (noisy,), (u,))
            # per-sample sigma_max estimate: ||J u|| / ||u|| with ||u|| = 1
            sig_max = jnp.sqrt(jnp.maximum(
                jnp.sum(ju * ju, axis=(1, 2, 3)), 1e-20))
            loss = loss + spectral_penalty * jnp.mean(
                jax.nn.relu(sig_max - spectral_target) ** 2
            )
        return loss, mutated

    return TrainTask("fastdvd", loss_fn)


def fastdvd_distill_task(
    model,
    teacher: Callable[[Array, Array], Array],
    jac_weight: float = 0.0,
) -> TrainTask:
    """Operator distillation on explicit probe points: batch is the pytree
    ``(clips (N,5,H,W,3), sigmas (N,), needs_noise (N,))``.

    Probe points come in two families (``scripts/harvest_iterates.py``):
    ADMM-loop iterates, used AS-IS (``needs_noise=0`` — they already carry
    the loop's actual artifact statistics), and clean synthetic clips that
    get fresh Gaussian noise at ``sigma * frac`` each step
    (``needs_noise=1``; same mismatched-sigma fraction as
    :func:`fastdvd_task`). The target is always the teacher's output on the
    center frame at the conditioning sigma — never the clean frame — so the
    student learns the TEACHER OPERATOR on the union of both input
    distributions.

    ``jac_weight`` adds Sobolev-style Jacobian matching: for a random unit
    direction u over the window, penalize
    ``||J_student(x) u - J_teacher(center) u_center||^2`` (per-sample sum,
    eval-mode operators — what the PnP loop iterates). Measured motivation:
    value-only distillation reproduced the teacher to rmse 0.0046 yet
    shipped sigma_max 1.128 vs the teacher's 0.721
    (``scripts/diag_teacher_sigma.py``) — MSE on outputs is blind to the
    derivative, and PnP stability IS a derivative property.
    """

    def loss_fn(variables, key, batch):
        clips, sigmas, needs_noise = batch
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        clips = augment_batch(k1, clips)
        n = clips.shape[0]
        # independent keys for the branch choice and the fraction draw (a
        # shared key correlates them: the non-unity branch would only see
        # fracs in [0.5, 1))
        frac = jnp.where(
            jax.random.bernoulli(k2, 0.5, (n,)),
            1.0,
            jax.random.uniform(k5, (n,)),
        )
        noise = jax.random.normal(k3, clips.shape) * (
            sigmas * frac)[:, None, None, None, None]
        x = clips + needs_noise[:, None, None, None, None] * noise
        c = x.shape[1] // 2
        t_out = jax.lax.stop_gradient(teacher(x[:, c], sigmas))
        out, mutated = model.apply(
            variables, x, sigmas, train=True, mutable=["batch_stats"]
        )
        loss = jnp.mean((out - t_out) ** 2) / 2.0
        if jac_weight > 0:
            u = jax.random.normal(k4, x.shape)
            u = u / jnp.sqrt(jnp.maximum(
                jnp.sum(u * u, axis=(1, 2, 3, 4), keepdims=True), 1e-20))

            def f_s(inp):
                return model.apply(variables, inp, sigmas)  # eval mode

            def f_t(center):
                return teacher(center, sigmas)

            _, s_jvp = jax.jvp(f_s, (x,), (u,))
            _, t_jvp = jax.jvp(f_t, (x[:, c],), (u[:, c],))
            t_jvp = jax.lax.stop_gradient(t_jvp)
            # per-sample squared operator difference along u (u is unit-norm,
            # so this is in sigma_max^2 units)
            jac = jnp.mean(jnp.sum((s_jvp - t_jvp) ** 2, axis=(1, 2, 3)))
            loss = loss + jac_weight * jac
        return loss, mutated

    return TrainTask("fastdvd_distill", loss_fn)


def ddnet_task(model, sigma: float = 1 / 255) -> TrainTask:
    def loss_fn(variables, key, clips):  # clips (N, 5, H, W, 3)
        k1, k3 = jax.random.split(key)
        clips = augment_batch(k1, clips)
        noisy = add_gaussian_noise(k3, clips, jnp.full((clips.shape[0],), sigma))
        # mosaic every frame into sparse RGB (the network's input domain)
        n, f, h, w, _ = noisy.shape
        mosaicked = bayer.embed_rgb(bayer.mosaic(noisy.reshape(n * f, h, w, 3)))
        windows = mosaicked.reshape(n, f, h, w, 3)
        out = model.apply(variables, windows)
        target = noisy[:, f // 2]
        return jnp.mean((out - target) ** 2), {}

    return TrainTask("ddnet", loss_fn)
