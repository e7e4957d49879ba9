"""Evidence run for ground-truth-free FastDVDnet weight-variant selection.

Motivation (RESULTS.md round 5 distillation section): the shipped
FastDVDnet checkpoints split by regime — ``weights/fastdvd.npz``
(FFDNet-iterate-distilled, wins on natural statistics: textured 34.49,
leaves 25.24, photo 24.89) vs ``weights/fastdvd_smooth.npz`` (round-2
smooth-procedural weights: smooth 40.23, everything else worse). The
reference cannot pick a checkpoint per scene at all (its drivers hardcode
one path, ``two_stage_ADMM_Online_FastDVD_Warm.py:243-247``).

Selection rule under test (``pipelines.select_prior_variables``): held-out
measurement cross-validation at the scene's fixed-weight schedule — 5% of
snapshot pixels are removed from the data term, each weight variant
solves, the one predicting the true held-out measurements better wins.

This script measures, per scene style (incl. a smooth synthetic scene,
which the six-scene suite no longer contains since Beauty moved to the
portrait stand-in): held-out residual per variant, full-schedule final
PSNR per variant (the oracle), and whether the picks agree.
CLI: ``reconstruct --denoiser fastdvd --ckpt auto``.

Usage: python scripts/ab_weight_select.py [h]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

# style -> (scene whose verbatim schedule to use, seed). The smooth row
# reuses the old Beauty schedule (its stand-in through round 4).
STYLES = {
    "smooth": ("Beauty", 42),
    "textured": ("Bosphorus", 202),
    "leaves": ("Jockey", 303),
    "photo": ("Runner", 404),
}

WEIGHTS = ("natural", "smooth")


def main(h: int = 512) -> None:
    from adaptivepnp_sci_tpu.configs.scenes import FASTDVD_SCENES
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.pipelines import holdout_cv_residuals
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm
    from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

    wdir = os.path.join(os.path.dirname(__file__), "..", "weights")
    model = FastDVDnet(dtype=jnp.bfloat16, remat=False)
    variants = {
        "natural": jax.device_put(
            load_checkpoint_variables(os.path.join(wdir, "fastdvd.npz"))),
        "smooth": jax.device_put(
            load_checkpoint_variables(
                os.path.join(wdir, "fastdvd_smooth.npz"))),
    }
    prior = fastdvd_prior(model)

    print("| style | schedule | resid natural | resid smooth | pick | "
          "full natural dB | full smooth dB | oracle | agree |")
    print("|---|---|---|---|---|---|---|---|---|")
    agree_all = True
    for style, (sched_scene, seed) in STYLES.items():
        scene = make_scene(b=8, h=h, w=h, seed=seed, style=style)
        y = jax.device_put(jnp.asarray(scene.meas, jnp.float32))
        phi = jax.device_put(jnp.asarray(scene.mask, jnp.float32))
        orig = jax.device_put(jnp.asarray(scene.orig_bayer))

        x0 = gap_tv(y, phi, GapTVConfig(iters=40)).x_bayer

        row = FASTDVD_SCENES[sched_scene][False]
        # CV strips the guard (holdout_cv_residuals); the oracle keeps it —
        # the guarded solve is the configuration users actually run
        cfg = ADMMConfig(sigma=row.sigma, iters=row.iters, denoiser="fastdvd",
                         select_best=True)
        resids = holdout_cv_residuals(
            y, phi, x0,
            [dict(config=cfg, prior=prior, variables=variants[k])
             for k in WEIGHTS],
        )
        pick = WEIGHTS[0] if resids[0] <= resids[1] else WEIGHTS[1]

        # oracle: full schedule per variant, fixed weights + the suite's
        # best-iterate guard (the configuration users actually run)
        psnrs = []
        for k in WEIGHTS:
            full = two_stage_admm(
                y, phi, cfg, prior=prior, variables=variants[k],
                x0_bayer=x0, orig_bayer=orig,
            )
            psnrs.append(float(full.psnr_per_frame.mean()))
        oracle = WEIGHTS[0] if psnrs[0] >= psnrs[1] else WEIGHTS[1]
        # agreement up to guard ties: picking either of two oracle-equal
        # variants (e.g. both guard-pinned at the warm start) is correct
        agree = psnrs[WEIGHTS.index(pick)] >= max(psnrs) - 0.01
        agree_all &= agree
        print(f"| {style} | {sched_scene} | {resids[0]:.3e} | {resids[1]:.3e} "
              f"| {pick} | {psnrs[0]:.2f} | {psnrs[1]:.2f} | {oracle} | "
              f"{'YES' if agree else 'NO'} |", flush=True)
    print(f"\nresidual pick == oracle pick on all styles: {agree_all}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
