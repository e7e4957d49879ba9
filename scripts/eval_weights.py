"""Evaluate FastDVDnet weight sets for PnP use: standalone denoising PSNR,
in-loop (two-stage ADMM) PSNR, and the eval-mode Jacobian spectral norm.

The three numbers answer different questions:
  * standalone PSNR — how well does it denoise (the offline objective)?
  * in-loop PSNR — does it stay stable when the ADMM loop feeds its output
    back through the measurement model 36 times?
  * sigma_max (power iteration on the input->output Jacobian, frozen BN) —
    the contraction margin that separates the two. Measured on the shipped
    stable 12k-step weights: ~0.73; unstable longer-trained sets: >= 0.95.

Usage: python scripts/eval_weights.py ckpt [ckpt ...] [--size 64] [--tpu]
       (default runs on CPU at 64x64 — a fast triage whose ranking matched
       the 512x512 TPU benchmark ordering; --tpu --size 512 reproduces the
       benchmark row.)
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def sigma_max_eval(model, variables, clips, key, iters: int = 6) -> float:
    """Power-iteration estimate of the eval-mode Jacobian's top singular
    value, averaged over the batch."""
    import jax
    import jax.numpy as jnp

    sigma = jnp.full((clips.shape[0],), 20 / 255)

    def f(x):
        return model.apply(variables, x, sigma)

    u = jax.random.normal(key, clips.shape, jnp.float32)
    u = u / jnp.sqrt(jnp.sum(u * u, axis=(1, 2, 3, 4), keepdims=True))
    for _ in range(iters):
        _, ju = jax.jvp(f, (clips,), (u,))
        _, vjp_fn = jax.vjp(f, clips)
        u = vjp_fn(ju)[0]
        u = u / jnp.sqrt(jnp.maximum(
            jnp.sum(u * u, axis=(1, 2, 3, 4), keepdims=True), 1e-20))
    _, ju = jax.jvp(f, (clips,), (u,))
    return float(jnp.mean(jnp.sqrt(jnp.sum(ju * ju, axis=(1, 2, 3)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="+")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--style", default="smooth",
                    help="scene statistics for the eval scene "
                         "(smooth|textured|leaves)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend instead of forcing CPU")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.ops import metrics
    from adaptivepnp_sci_tpu.solvers import GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        two_stage_admm,
    )
    from adaptivepnp_sci_tpu.train.datasets import synthetic_video_dataset
    from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

    model = FastDVDnet()
    prior = fastdvd_prior(model)
    scene = make_scene(b=8, h=args.size, w=args.size, seed=42,
                       style=args.style)
    y, phi = jnp.asarray(scene.meas), jnp.asarray(scene.mask)
    orig = jnp.asarray(scene.orig_bayer)
    warm = gap_tv(y, phi, GapTVConfig(iters=40))
    cfg = ADMMConfig(
        sigma=(12 / 255, 6 / 255), iters=(24, 12), denoiser="fastdvd",
        adapt=AdaptConfig(lr=2e-7, update_per_iter=2, interval_iter=12,
                          initial_iter=1),
    )
    clips = jnp.asarray(synthetic_video_dataset(4, length=5, size=64, seed=9))
    key = jax.random.PRNGKey(0)
    rgb = jnp.asarray(scene.orig_rgb)
    noisy = rgb + (20 / 255) * jax.random.normal(key, rgb.shape)

    for path in args.ckpts:
        v = load_checkpoint_variables(path)
        den = prior.apply(v, noisy, jnp.float32(20 / 255))
        standalone = float(metrics.psnr(rgb, jnp.clip(den, 0, 1)))
        r = two_stage_admm(y, phi, cfg, prior=prior, variables=v,
                           x0_bayer=warm.x_bayer, orig_bayer=orig)
        inloop = float(r.psnr_per_frame.mean())
        smax = sigma_max_eval(model, v, clips, key)
        print(f"{path}: standalone={standalone:.2f} dB  "
              f"in-loop@{args.size}/{args.style}={inloop:.2f} dB  "
              f"sigma_max={smax:.3f}")


if __name__ == "__main__":
    main()
