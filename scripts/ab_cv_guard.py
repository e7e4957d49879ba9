"""A/B the best-iterate guard: raw residual vs held-out CV ranking.

Round-5 finding: every FastDVD row of the six-scene suite pinned at its
warm start even though the iterate-distilled weights beat the warm start
by several dB UNGUARDED (``scripts/eval_weights.py``: textured 34.49 vs
warm 26.90). Cause: ``ADMMConfig.select_best`` ranked iterates by the raw
measurement residual ``||A(theta)-y||^2`` with the 40-iteration GAP-TV
warm start as candidate 0 — on clean measurements the warm start's raw
residual is nearly unbeatable, so the guard discarded genuinely better
denoiser iterates. This is the same structural bias that broke plain-
residual Malvar-vs-DDnet selection (RESULTS.md round 5).

Fix under test: ``ADMMConfig.select_best_holdout`` — remove a Bernoulli
5% pixel subset from the solve's entire data term and rank iterates by
their prediction error of the TRUE measurement at the held-out pixels
(cross-validation; the warm start stays candidate 0, so pin-to-warm-start
protection is unchanged — pinning still returns the FULL-data warm
start).

Matrix: per scene style, {no guard, raw guard, CV guard} with the
distilled FastDVDnet weights, suite mode (bf16 DenBlocks), at 512^2.

Usage: python scripts/ab_cv_guard.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables


def main() -> None:
    v = jax.device_put(load_checkpoint_variables(
        os.path.join(os.path.dirname(__file__), "..", "weights",
                     "fastdvd.npz")))
    model = FastDVDnet(dtype=jnp.bfloat16, remat=False)
    prior = fastdvd_prior(model)
    adapt = AdaptConfig(lr=2e-7, update_per_iter=2, interval_iter=12,
                        initial_iter=1)
    for seed, style in ((202, "textured"), (42, "textured"),
                        (404, "photo"), (303, "leaves")):
        scene = make_scene(b=8, h=512, w=512, seed=seed, style=style)
        y, phi = jnp.asarray(scene.meas), jnp.asarray(scene.mask)
        orig = jnp.asarray(scene.orig_bayer)
        warm = gap_tv(y, phi, GapTVConfig(iters=40))
        print(f"-- seed {seed} {style}: warm "
              f"{float(metrics.psnr(orig, warm.x_bayer)):.2f} dB", flush=True)
        for tag, guard, hf in (("noguard ", False, 0.0),
                               ("rawguard", True, 0.0),
                               ("cvguard ", True, 0.05)):
            cfg = ADMMConfig(
                sigma=(12 / 255, 6 / 255), iters=(24, 12), denoiser="fastdvd",
                select_best=guard, select_best_holdout=hf, adapt=adapt,
            )
            t0 = time.time()
            r = two_stage_admm(y, phi, cfg, prior=prior, variables=v,
                               x0_bayer=warm.x_bayer, orig_bayer=orig)
            p = float(r.psnr_per_frame.mean())
            print(f"   {tag}: {p:.2f} dB ({time.time() - t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
