"""A/B DDnet U-Net precision on the joint-demosaicking config (512^2x8).

DDnet's three DenBlock U-Nets share FastDVDnet's residual structure
(fp32 center-frame skips around conv chains), where bf16 conv compute
measured PSNR-identical (RESULTS.md "FastDVD cost decomposition").
``DDnet(dtype=jnp.bfloat16)`` applies the same scheme: bf16 conv chains,
fp32 residuals/upsample/branch-mixing, fp32 params. This measures the
whole-program delta on benchmark config 5a (FFDNet denoiser + DDnet
demosaicker) and 5c (dead-leaves scene) — speed is the question; the
residual spine should hold quality.

Usage: python scripts/ab_ddnet_precision.py
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


def timed(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ddnet import DDnet
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers import GapTVConfig
    from adaptivepnp_sci_tpu.solvers.end_to_end import reconstruct_single_dispatch
    from adaptivepnp_sci_tpu.solvers.priors import ddnet_demosaic, ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig
    from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

    prior = ffdnet_prior(FFDNet(in_nc=3, out_nc=3, nc=96, nb=12))
    variables = jax.device_put(
        load_ffdnet("/root/reference/model_zoo/ffdnet_color.pth"))
    dvars = jax.device_put(load_checkpoint_variables("weights/ddnet.npz"))

    wcfg = GapTVConfig(iters=40)
    cfg = ADMMConfig(sigma=(25 / 255, 12 / 255, 6 / 255), iters=(6, 6, 4),
                     denoiser="ffdnet", demosaic_method="ddnet")

    scenes = {
        "5a smooth": make_scene(b=8, h=512, w=512, seed=42),
        "5c leaves": make_scene(b=8, h=512, w=512, seed=42, style="leaves"),
    }
    print("| scene | DDnet dtype | s/run | PSNR (dB) | SSIM |")
    print("|---|---|---|---|---|")
    for sname, scene in scenes.items():
        y = jax.device_put(jnp.asarray(scene.meas))
        phi = jax.device_put(jnp.asarray(scene.mask))
        orig = jax.device_put(jnp.asarray(scene.orig_bayer))
        for dname, dd in (("fp32", DDnet()),
                          ("bf16", DDnet(dtype=jnp.bfloat16))):
            dm = ddnet_demosaic(dd, dvars)
            run = lambda: reconstruct_single_dispatch(  # noqa: E731
                y, phi, wcfg, cfg, prior, variables, orig=orig,
                demosaic_fn=dm)
            t = timed(lambda: run().x_bayer)
            r = run()
            print(f"| {sname} | {dname} | {t:.3f} "
                  f"| {float(r.psnr_per_frame.mean()):.2f} "
                  f"| {float(r.ssim_per_frame.mean()):.4f} |")


if __name__ == "__main__":
    main()
