"""Benchmark: frames/sec reconstructing a 512x512x8 color-Bayer CACTI snapshot.

Flagship path = the reference's headline config (two_stage_ADMM_Online_FFD_Warm,
scene 'Beauty'): GAP-TV warm start (40 iters) -> two-stage ADMM with
FFDNet-color (real reference weights when present) + Malvar demosaic + online
adaptation (lr 2e-6, 2 steps every 15 iters), sigma schedule
[25,12,6]/255 x [15,6,4] iters.

Baseline for ``vs_baseline``: the north-star target from BASELINE.json — one
snapshot in 10 s (0.8 frames/s) on a single chip; the reference repo publishes
no runtime numbers (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: the ~60s XLA compile of the adaptive solver
# scan happens once per machine, not once per bench process.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main(mode: str = "flagship") -> None:
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.solvers import (
        ADMMConfig,
        GapTVConfig,
        gap_tv,
        two_stage_admm,
    )
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

    b, h, w = 8, 512, 512
    scene = make_scene(b=b, h=h, w=w, seed=42)

    model = ffdnet_color()
    ckpt = "/root/reference/model_zoo/ffdnet_color.pth"
    if os.path.exists(ckpt):
        from adaptivepnp_sci_tpu.models.convert import load_ffdnet

        variables = load_ffdnet(ckpt)
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.float32(0.1)
        )
    variables = jax.device_put(variables)
    prior = ffdnet_prior(model)

    warm_cfg = GapTVConfig(iters=40)
    if mode == "warmstart":
        # BASELINE config 1: GAP-TV warm start only
        admm_cfg = ADMMConfig(sigma=(0.0,), iters=(1,), denoiser="tv")
    elif mode == "fixed":
        # BASELINE config 2: fixed weights, no adaptation
        admm_cfg = ADMMConfig(
            sigma=(25 / 255, 12 / 255, 6 / 255), iters=(15, 6, 4),
            denoiser="ffdnet",
        )
    else:
        # flagship / BASELINE config 4: online-adaptive FFDNet
        admm_cfg = ADMMConfig(
            sigma=(25 / 255, 12 / 255, 6 / 255),
            iters=(15, 6, 4),
            denoiser="ffdnet",
            adapt=AdaptConfig(lr=2e-6, update_per_iter=2, interval_iter=15,
                              initial_iter=1),
        )

    y = jax.device_put(jnp.asarray(scene.meas))
    phi = jax.device_put(jnp.asarray(scene.mask))
    orig = jax.device_put(jnp.asarray(scene.orig_bayer))

    from adaptivepnp_sci_tpu.solvers.end_to_end import reconstruct_single_dispatch

    def reconstruct():
        # warm start + adaptive ADMM + metrics: ONE device dispatch
        return reconstruct_single_dispatch(
            y, phi, warm_cfg, admm_cfg, prior, variables, orig=orig
        )

    def finish(r):
        # On the axon tunnel block_until_ready returns before execution
        # completes; a scalar host read forces completion without paying a
        # bulk result transfer inside the timed region.
        return float(jnp.sum(r.x_rgb) + jnp.sum(r.x_bayer))

    # warmup: compile everything
    res = reconstruct()
    finish(res)

    # best-of-6: the axon tunnel adds up to ~0.4 s of dispatch jitter per
    # run (ROADMAP "Performance bounds"); RESULTS.md rows are timed the
    # same way
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        res = reconstruct()
        finish(res)
        times.append(time.perf_counter() - t0)

    sec_per_snapshot = min(times)
    fps = b / sec_per_snapshot
    baseline_fps = 0.8  # north star: 8 frames / 10 s per snapshot
    psnr = float(res.psnr_per_frame.mean())
    ssim = float(res.ssim_per_frame.mean())

    # Honest-regime quality line: the smooth synthetic scene above is an easy
    # ~50 dB regime; natural-image statistics (dead-leaves occlusion model,
    # RESULTS.md row 4c "the honest quality regime") sit near ~27 dB. Report
    # both so this artifact alone cannot overstate the quality margin.
    extra = {}
    if mode == "flagship":
        nat = make_scene(b=b, h=h, w=w, seed=42, style="leaves")
        res_nat = reconstruct_single_dispatch(
            jax.device_put(jnp.asarray(nat.meas)),
            jax.device_put(jnp.asarray(nat.mask)),
            warm_cfg, admm_cfg, prior, variables,
            orig=jax.device_put(jnp.asarray(nat.orig_bayer)),
        )
        extra = {
            "psnr_db_natural": round(float(res_nat.psnr_per_frame.mean()), 2),
            "ssim_natural": round(float(res_nat.ssim_per_frame.mean()), 4),
        }

    print(
        json.dumps(
            {
                "metric": "frames/sec reconstructed at 512x512x8 Bayer "
                          "(two-stage ADMM + FFDNet + online adaptation)",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
                "seconds_per_snapshot": round(sec_per_snapshot, 3),
                "psnr_db": round(psnr, 2),
                "ssim": round(ssim, 4),
                **extra,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "flagship")
