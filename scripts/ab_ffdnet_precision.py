"""A/B FFDNet conv precision on the flagship adaptive config (512^2x8).

Modes: fp32 (shipped), mixed (bf16 interior convs, fp32 endpoint convs),
bf16 (everything reduced — rejected at -2.3 dB in round 2, re-measured
here for the record). FFDNet sits near the fp32 conv roofline on v5e
(ROADMAP "Performance bounds"), so bf16 interiors double the available
MXU rate; the question is only quality.

Usage: python scripts/ab_ffdnet_precision.py
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


def timed(fn, n=2):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers import GapTVConfig
    from adaptivepnp_sci_tpu.solvers.end_to_end import reconstruct_single_dispatch
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig

    scene = make_scene(b=8, h=512, w=512, seed=42)
    y = jax.device_put(jnp.asarray(scene.meas))
    phi = jax.device_put(jnp.asarray(scene.mask))
    orig = jax.device_put(jnp.asarray(scene.orig_bayer))
    variables = jax.device_put(
        load_ffdnet("/root/reference/model_zoo/ffdnet_color.pth"))

    wcfg = GapTVConfig(iters=40)
    cfg = ADMMConfig(
        sigma=(25 / 255, 12 / 255, 6 / 255), iters=(15, 6, 4),
        denoiser="ffdnet",
        adapt=AdaptConfig(lr=2e-6, update_per_iter=2, interval_iter=15,
                          initial_iter=1),
    )

    modes = {
        "fp32": FFDNet(in_nc=3, out_nc=3, nc=96, nb=12),
        "mixed": FFDNet(in_nc=3, out_nc=3, nc=96, nb=12,
                        interior_dtype=jnp.bfloat16),
        "bf16": FFDNet(in_nc=3, out_nc=3, nc=96, nb=12, dtype=jnp.bfloat16),
    }
    print("| mode | s/run | PSNR (dB) | SSIM |")
    print("|---|---|---|---|")
    for name, model in modes.items():
        prior = ffdnet_prior(model)
        run = lambda: reconstruct_single_dispatch(  # noqa: E731
            y, phi, wcfg, cfg, prior, variables, orig=orig)
        t = timed(lambda: run().x_bayer)
        r = run()
        print(f"| {name} | {t:.3f} | {float(r.psnr_per_frame.mean()):.2f} "
              f"| {float(r.ssim_per_frame.mean()):.4f} |")


if __name__ == "__main__":
    main()
