"""Batched-throughput scaling: how far does vmap-over-snapshots go on one chip?

RESULTS.md row 5b measures batch=4 (fixed-weight FFDNet config). This sweeps
the batch size 1/2/4/8/16 and reports frames/s (snapshots x B frames), to find
the saturation point and the HBM ceiling. Warm starts are computed inside the
timed region (same methodology as 5b: the full pipeline a user would run).

Usage: python scripts/bench_batched.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main() -> None:
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.ops import metrics
    from adaptivepnp_sci_tpu.solvers import GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        two_stage_admm_batched,
    )

    b, h, w = 8, 512, 512
    ckpt = "/root/reference/model_zoo/ffdnet_color.pth"
    variables = jax.device_put(load_ffdnet(ckpt))
    prior = ffdnet_prior(ffdnet_color())
    wcfg = GapTVConfig(iters=40)
    cfg = ADMMConfig(sigma=(25 / 255, 12 / 255, 6 / 255), iters=(15, 6, 4),
                     denoiser="ffdnet")

    for t in (1, 2, 4, 8, 16):
        scene = make_scene(b=b, h=h, w=w, seed=43, n_meas=t)
        meas = scene.meas[..., None] if scene.meas.ndim == 2 else scene.meas
        y = jax.device_put(jnp.asarray(meas.transpose(2, 0, 1)))
        phi = jax.device_put(jnp.asarray(scene.mask))
        orig = scene.orig_bayer if scene.orig_bayer.ndim == 4 \
            else scene.orig_bayer[None]
        orig = jax.device_put(jnp.asarray(orig))

        @jax.jit
        def run(y, phi, variables):
            x0 = jax.vmap(lambda yy: gap_tv(yy, phi, wcfg).x_bayer)(y)
            return two_stage_admm_batched(
                y, phi, cfg, prior=prior, variables=variables, x0_batch=x0,
            ).x_bayer

        try:
            out = run(y, phi, variables)  # compile
            float(jnp.sum(out))
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                out = run(y, phi, variables)
                float(jnp.sum(out))
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            psnr = float(jnp.mean(jax.vmap(metrics.psnr_per_frame)(out, orig)))
            print(f"batch {t:2d}: {dt:6.3f} s -> {t * b / dt:6.1f} frames/s, "
                  f"PSNR {psnr:.2f} dB", flush=True)
        except Exception as e:  # OOM at large batch is an expected outcome
            print(f"batch {t:2d}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            break


if __name__ == "__main__":
    main()
