"""A/B measurements on the real TPU chip (VERDICT round-2 items 1b and 3):

A. Pallas fused kernels vs the plain XLA path — whole-program deltas
   (per-op microbenchmarks are meaningless over the axon tunnel; see
   ROADMAP "Performance bounds") for the three configs that touch the
   fused x-update / in-VMEM TV kernels.
B. Carried-Adam vs the reference's fresh-Adam-per-trigger adaptation
   semantics on the flagship config (and FastDVD config 3 when the
   regenerated weights are present).

Usage: python scripts/ab_pallas_adapt.py [out.md]
"""

from __future__ import annotations

import dataclasses
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
        float(jnp.sum(out[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(out_path: str = "AB_RESULTS.md") -> None:
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.solvers import GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.end_to_end import reconstruct_single_dispatch
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig

    b, h, w = 8, 512, 512
    scene = make_scene(b=b, h=h, w=w, seed=42)
    y = jax.device_put(jnp.asarray(scene.meas))
    phi = jax.device_put(jnp.asarray(scene.mask))
    orig = jax.device_put(jnp.asarray(scene.orig_bayer))

    model = ffdnet_color()
    variables = jax.device_put(
        load_ffdnet("/root/reference/model_zoo/ffdnet_color.pth"))
    prior = ffdnet_prior(model)

    lines = ["# A/B results (real TPU, 512x512x8 synthetic scene)", ""]

    # ---------------- A. Pallas on/off ----------------
    lines += ["## Pallas fused kernels vs plain XLA", "",
              "| config | s/run (XLA) | s/run (Pallas) | PSNR XLA | PSNR Pallas |",
              "|---|---|---|---|---|"]

    def row_gaptv():
        out = []
        for up in (False, True):
            cfg = GapTVConfig(iters=40, use_pallas=up)
            t = timed(lambda: (gap_tv(y, phi, cfg).x_bayer,))
            r = gap_tv(y, phi, cfg, orig_bayer=orig)
            out.append((t, float(r.psnr_per_frame.mean())))
        return out

    def row_admm(cfg_base):
        out = []
        for up in (False, True):
            cfg = dataclasses.replace(cfg_base, use_pallas=up)
            wcfg = GapTVConfig(iters=40, use_pallas=up)
            fn = lambda: (reconstruct_single_dispatch(  # noqa: E731
                y, phi, wcfg, cfg, prior, variables, orig=orig).x_bayer,)
            t = timed(fn)
            r = reconstruct_single_dispatch(y, phi, wcfg, cfg, prior,
                                            variables, orig=orig)
            out.append((t, float(r.psnr_per_frame.mean())))
        return out

    (t0, p0), (t1, p1) = row_gaptv()
    lines.append(f"| 1. GAP-TV (40 it) | {t0:.3f} | {t1:.3f} | {p0:.2f} | {p1:.2f} |")

    cfg2 = ADMMConfig(sigma=(25 / 255, 12 / 255, 6 / 255), iters=(15, 6, 4),
                      denoiser="ffdnet")
    (t0, p0), (t1, p1) = row_admm(cfg2)
    lines.append(f"| 2. ADMM+FFDNet fixed | {t0:.3f} | {t1:.3f} | {p0:.2f} | {p1:.2f} |")

    cfg4 = ADMMConfig(
        sigma=(25 / 255, 12 / 255, 6 / 255), iters=(15, 6, 4), denoiser="ffdnet",
        adapt=AdaptConfig(lr=2e-6, update_per_iter=2, interval_iter=15,
                          initial_iter=1),
    )
    (t0, p0), (t1, p1) = row_admm(cfg4)
    lines.append(f"| 4. flagship adaptive | {t0:.3f} | {t1:.3f} | {p0:.2f} | {p1:.2f} |")

    # ---------------- B. carried vs fresh Adam ----------------
    lines += ["", "## Adaptation optimizer semantics (carried vs fresh Adam)",
              "",
              "| config | s/run | PSNR (dB) | SSIM |",
              "|---|---|---|---|"]

    for fresh in (False, True):
        cfg = dataclasses.replace(
            cfg4, adapt=dataclasses.replace(cfg4.adapt,
                                            fresh_opt_per_trigger=fresh))
        wcfg = GapTVConfig(iters=40)
        fn = lambda: (reconstruct_single_dispatch(  # noqa: E731
            y, phi, wcfg, cfg, prior, variables, orig=orig).x_bayer,)
        t = timed(fn)
        r = reconstruct_single_dispatch(y, phi, wcfg, cfg, prior, variables,
                                        orig=orig)
        name = "fresh-per-trigger (reference)" if fresh else "carried (extension)"
        lines.append(f"| flagship FFDNet, {name} | {t:.3f} | "
                     f"{float(r.psnr_per_frame.mean()):.2f} | "
                     f"{float(r.ssim_per_frame.mean()):.4f} |")

    fdvd_path = "weights/fastdvd.npz"
    if os.path.exists(fdvd_path):
        from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
        from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior
        from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

        fmodel = FastDVDnet()
        fvars = jax.device_put(load_checkpoint_variables(fdvd_path))
        fprior = fastdvd_prior(fmodel)
        for fresh in (False, True):
            cfg = ADMMConfig(
                sigma=(12 / 255, 6 / 255), iters=(24, 12), denoiser="fastdvd",
                adapt=AdaptConfig(lr=2e-7, update_per_iter=2,
                                  interval_iter=12, initial_iter=1,
                                  fresh_opt_per_trigger=fresh))
            wcfg = GapTVConfig(iters=40)
            fn = lambda: (reconstruct_single_dispatch(  # noqa: E731
                y, phi, wcfg, cfg, fprior, fvars, orig=orig).x_bayer,)
            t = timed(fn)
            r = reconstruct_single_dispatch(y, phi, wcfg, cfg, fprior, fvars,
                                            orig=orig)
            name = "fresh-per-trigger (reference)" if fresh else "carried (extension)"
            lines.append(f"| FastDVD, {name} | {t:.3f} | "
                         f"{float(r.psnr_per_frame.mean()):.2f} | "
                         f"{float(r.ssim_per_frame.mean()):.4f} |")

    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "AB_RESULTS.md")
