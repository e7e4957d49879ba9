"""Evidence run for ground-truth-free demosaicker selection (Malvar vs DDnet).

Motivation (RESULTS.md round 3/4): the DDnet joint demosaicker wins on
dead-leaves statistics (+1.1 dB over Malvar) but LOSES on the real-photo
scene (-0.9 dB) — the better demosaicker is scene-dependent, and the
reference leaves the choice to a manual driver toggle
(``deep_demosaicking``, ``two_stage_ADMM_Online_FFD_Warm.py:25``).

Selection rule under test (``pipelines.select_demosaicker``): held-out
measurement cross-validation at the scene's FULL fixed-weight schedule —
5% of snapshot pixels are removed from the data term, both demosaicker
paths solve, and the one predicting the true held-out measurements better
wins. Two simpler rules were tried first and are recorded as negatives in
RESULTS.md: the plain residual (biased toward the interpolating Malvar,
which preserves measured CFA samples exactly) and held-out residuals of
SHORT single-stage probes (DDnet's advantage only materializes late in the
continuation schedule).

This script measures, per scene stand-in: held-out residual for both
demosaickers, full-schedule final PSNR for both (the oracle), and whether
the picks agree. CLI: ``reconstruct --auto-demosaic``.

Usage: python scripts/ab_demosaic_select.py [h]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

SCENES = {
    "Beauty": ("photo", 101),
    "Bosphorus": ("textured", 202),
    "Jockey": ("leaves", 303),
    "Runner": ("photo", 404),
    "ShakeNDry": ("leaves", 505),
    "Traffic": ("textured", 606),
}


def main(h: int = 512) -> None:
    from adaptivepnp_sci_tpu.configs.scenes import FFDNET_SCENES
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ddnet import DDnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.ops import bayer, physics
    from adaptivepnp_sci_tpu.pipelines import probe_demosaic_residuals
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.priors import ddnet_demosaic, ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm

    model = ffdnet_color()
    variables = jax.device_put(
        load_ffdnet("/root/reference/model_zoo/ffdnet_color.pth")
    )
    prior = ffdnet_prior(model)

    from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

    dd = DDnet(dtype=jnp.bfloat16)
    dd_vars = jax.device_put(load_checkpoint_variables(
        os.path.join(os.path.dirname(__file__), "..", "weights", "ddnet.npz")
    ))
    dm_fn = ddnet_demosaic(dd, dd_vars)

    print(f"| scene | stand-in | probe resid malvar | probe resid ddnet | "
          f"pick | full malvar dB | full ddnet dB | oracle pick | agree |")
    print("|---|---|---|---|---|---|---|---|---|")
    agree_all = True
    for name, (style, seed) in SCENES.items():
        scene = make_scene(b=8, h=h, w=h, seed=seed, style=style)
        y = jax.device_put(jnp.asarray(scene.meas, jnp.float32))
        phi = jax.device_put(jnp.asarray(scene.mask, jnp.float32))
        orig = jax.device_put(jnp.asarray(scene.orig_bayer))

        x0 = gap_tv(y, phi, GapTVConfig(iters=40)).x_bayer

        row = FFDNET_SCENES[name][False]
        row_dd = FFDNET_SCENES[name][True]
        r_m, r_d = probe_demosaic_residuals(
            y, phi, x0, prior, variables, dd, dd_vars,
            ADMMConfig(sigma=row.sigma, iters=row.iters, denoiser="ffdnet"),
            ADMMConfig(sigma=row_dd.sigma, iters=row_dd.iters,
                       denoiser="ffdnet"),
        )
        pick = "malvar" if r_m <= r_d else "ddnet"

        # oracle: full verbatim schedules, fixed weights (isolating the
        # demosaicker axis from adaptation noise)
        full_m = two_stage_admm(
            y, phi, ADMMConfig(sigma=row.sigma, iters=row.iters,
                               denoiser="ffdnet"),
            prior=prior, variables=variables, x0_bayer=x0, orig_bayer=orig,
        )
        full_d = two_stage_admm(
            y, phi, ADMMConfig(sigma=row_dd.sigma, iters=row_dd.iters,
                               denoiser="ffdnet", demosaic_method="ddnet"),
            prior=prior, variables=variables, x0_bayer=x0, orig_bayer=orig,
            demosaic_fn=dm_fn,
        )
        p_m = float(full_m.psnr_per_frame.mean())
        p_d = float(full_d.psnr_per_frame.mean())
        oracle = "malvar" if p_m >= p_d else "ddnet"
        agree = pick == oracle
        agree_all &= agree
        print(f"| {name} | {style} | {r_m:.3e} | {r_d:.3e} | {pick} "
              f"| {p_m:.2f} | {p_d:.2f} | {oracle} | {'YES' if agree else 'NO'} |",
              flush=True)
    print(f"\nresidual pick == oracle pick on all scenes: {agree_all}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
