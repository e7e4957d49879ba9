"""Run the BASELINE.md benchmark configurations on a synthetic 512x512x8
scene and write RESULTS.md.

Configs (BASELINE.json):
  1. GAP-TV warm start
  2. Two-stage ADMM + FFDNet, fixed weights
  3. Two-stage ADMM + FastDVDnet (regenerated weights when available)
  4. Online-adaptive FFDNet (flagship)
  5. DDnet joint demosaicking + batched multi-measurement throughput

Usage: python scripts/run_benchmark_suite.py [out.md]
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
import numpy as np


def timed(fn, n=2):
    fn()  # compile
    ts = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out[0]))  # force completion (scalar host pull)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main(out_path: str = "RESULTS.md") -> None:
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.ops import metrics
    from adaptivepnp_sci_tpu.solvers import GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.end_to_end import reconstruct_single_dispatch
    from adaptivepnp_sci_tpu.solvers.gap_tv import GapTVConfig
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        two_stage_admm_batched,
    )

    b, h, w = 8, 512, 512
    scene = make_scene(b=b, h=h, w=w, seed=42)
    y = jax.device_put(jnp.asarray(scene.meas))
    phi = jax.device_put(jnp.asarray(scene.mask))
    orig = jax.device_put(jnp.asarray(scene.orig_bayer))

    rows = []

    # 1. GAP-TV warm start
    wcfg = GapTVConfig(iters=40)
    t, _ = timed(lambda: (gap_tv(y, phi, wcfg).x_bayer,))
    res = gap_tv(y, phi, wcfg, orig_bayer=orig)
    rows.append(("1. GAP-TV warm start (40 it)", t,
                 float(res.psnr_per_frame.mean()),
                 float(res.ssim_per_frame.mean())))

    model = ffdnet_color()
    variables = jax.device_put(
        load_ffdnet("/root/reference/model_zoo/ffdnet_color.pth"))
    prior = ffdnet_prior(model)

    # 2. fixed-weight FFDNet
    cfg2 = ADMMConfig(sigma=(25 / 255, 12 / 255, 6 / 255), iters=(15, 6, 4),
                      denoiser="ffdnet")
    f2 = lambda: (reconstruct_single_dispatch(  # noqa: E731
        y, phi, wcfg, cfg2, prior, variables, orig=orig).x_bayer,)
    t, _ = timed(f2)
    r = reconstruct_single_dispatch(y, phi, wcfg, cfg2, prior, variables, orig=orig)
    rows.append(("2. two-stage ADMM + FFDNet (fixed)", t,
                 float(r.psnr_per_frame.mean()), float(r.ssim_per_frame.mean())))

    # 3. FastDVDnet. The benchmark scene is the SMOOTH synthetic family, so
    # use the smooth-procedural weight variant (weights/fastdvd_smooth.npz;
    # the shipped default weights/fastdvd.npz is the iterate-distilled
    # natural-statistics variant, which `--ckpt auto` would not pick here —
    # per-scene weight selection, RESULTS.md round 5).
    fdvd_path = "weights/fastdvd_smooth.npz"
    if not os.path.exists(fdvd_path):
        fdvd_path = "weights/fastdvd.npz"
    if os.path.exists(fdvd_path):
        from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
        from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior

        from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

        # bf16 conv/BN chains with fp32 residuals: measured 5.19 -> 3.55
        # s/run at identical PSNR (scripts/bench_fastdvd_bf16.py); with the
        # dense block-diagonal input conv + segmented adaptation scan this
        # is 2.8 s, and remat=False (activations fit HBM at bf16) 2.7 s
        fmodel = FastDVDnet(dtype=jnp.bfloat16, remat=False)
        fvars = jax.device_put(load_checkpoint_variables(fdvd_path))
        # shared-triplet sequence path: temp1 once per distinct circular
        # triplet (B evals, not 3B) — half the conv work and a third of the
        # temp1 activation footprint, so no window chunking needed at 512²
        fprior = fastdvd_prior(fmodel)
        # the reference FastDVD driver always adapts online (update=True)
        cfg3 = ADMMConfig(sigma=(12 / 255, 6 / 255), iters=(24, 12),
                          denoiser="fastdvd",
                          adapt=AdaptConfig(lr=2e-7, update_per_iter=2,
                                            interval_iter=12, initial_iter=1))
        f3 = lambda: (reconstruct_single_dispatch(  # noqa: E731
            y, phi, wcfg, cfg3, fprior, fvars, orig=orig).x_bayer,)
        # n=6: the adaptive-branch runs carry +-0.4 s tunnel jitter (the
        # no-adapt run is stable at 1.59 s +-0.03; measured round 3) — match
        # the 6-sample methodology of the cost decomposition
        t, _ = timed(f3, n=6)
        r = reconstruct_single_dispatch(y, phi, wcfg, cfg3, fprior, fvars, orig=orig)
        rows.append(("3. two-stage ADMM + FastDVDnet (smooth-variant wts, bf16)", t,
                     float(r.psnr_per_frame.mean()),
                     float(r.ssim_per_frame.mean())))

        # 3b. extension beyond the reference: per-stage relaxed denoiser
        # steps (damp the large-sigma stage only) — measured +0.36 dB
        import dataclasses

        cfg3b = dataclasses.replace(cfg3, denoiser_relax=(0.3, 1.0))
        f3b = lambda: (reconstruct_single_dispatch(  # noqa: E731
            y, phi, wcfg, cfg3b, fprior, fvars, orig=orig).x_bayer,)
        t, _ = timed(f3b, n=6)
        r = reconstruct_single_dispatch(y, phi, wcfg, cfg3b, fprior, fvars,
                                        orig=orig)
        rows.append(("3b. + per-stage relax (0.3, 1.0) [extension]", t,
                     float(r.psnr_per_frame.mean()),
                     float(r.ssim_per_frame.mean())))
    else:
        rows.append(("3. two-stage ADMM + FastDVDnet", float("nan"),
                     float("nan"), float("nan")))

    # 4. online-adaptive FFDNet (flagship)
    cfg4 = ADMMConfig(
        sigma=(25 / 255, 12 / 255, 6 / 255), iters=(15, 6, 4), denoiser="ffdnet",
        adapt=AdaptConfig(lr=2e-6, update_per_iter=2, interval_iter=15,
                          initial_iter=1),
    )
    f4 = lambda: (reconstruct_single_dispatch(  # noqa: E731
        y, phi, wcfg, cfg4, prior, variables, orig=orig).x_bayer,)
    t, _ = timed(f4)
    r = reconstruct_single_dispatch(y, phi, wcfg, cfg4, prior, variables, orig=orig)
    rows.append(("4. online-adaptive FFDNet (flagship)", t,
                 float(r.psnr_per_frame.mean()), float(r.ssim_per_frame.mean())))

    # 4b. flagship config on the HARD textured scene: drifting gratings +
    # hard-edged rectangles land in a realistic dB regime (the smooth-blob
    # default is an easy ~50 dB regime; real mid-scale scenes sit ~28-35 dB)
    scene_hard = make_scene(b=b, h=h, w=w, seed=42, textured=True)
    yh = jax.device_put(jnp.asarray(scene_hard.meas))
    origh = jax.device_put(jnp.asarray(scene_hard.orig_bayer))
    f4b = lambda: (reconstruct_single_dispatch(  # noqa: E731
        yh, phi, wcfg, cfg4, prior, variables, orig=origh).x_bayer,)
    t, _ = timed(f4b)
    r = reconstruct_single_dispatch(yh, phi, wcfg, cfg4, prior, variables,
                                    orig=origh)
    rows.append(("4b. flagship on hard textured scene", t,
                 float(r.psnr_per_frame.mean()), float(r.ssim_per_frame.mean())))

    # 4c. dead-leaves scene: natural-image statistics (scale-invariant
    # occlusion edges, heavy-tailed gradients) — the closest stand-in for
    # real mid-scale captures available without shipping data
    scene_nat = make_scene(b=b, h=h, w=w, seed=42, style="leaves")
    yn = jax.device_put(jnp.asarray(scene_nat.meas))
    orign = jax.device_put(jnp.asarray(scene_nat.orig_bayer))
    f4c = lambda: (reconstruct_single_dispatch(  # noqa: E731
        yn, phi, wcfg, cfg4, prior, variables, orig=orign).x_bayer,)
    t, _ = timed(f4c)
    r = reconstruct_single_dispatch(yn, phi, wcfg, cfg4, prior, variables,
                                    orig=orign)
    rows.append(("4c. flagship on dead-leaves (natural-statistics) scene", t,
                 float(r.psnr_per_frame.mean()), float(r.ssim_per_frame.mean())))

    # 4d. extension beyond the reference tables: on natural statistics the
    # stage-boundary trigger at ~10x the reference lr buys +0.4 dB
    # (RESULTS.md adaptation sweep); same program, different constants
    import dataclasses

    cfg4d = dataclasses.replace(
        cfg4, adapt=AdaptConfig(lr=2e-5, update_per_iter=2, interval_iter=15,
                                initial_iter=1))
    f4d = lambda: (reconstruct_single_dispatch(  # noqa: E731
        yn, phi, wcfg, cfg4d, prior, variables, orig=orign).x_bayer,)
    t, _ = timed(f4d)
    r = reconstruct_single_dispatch(yn, phi, wcfg, cfg4d, prior, variables,
                                    orig=orign)
    rows.append(("4d. + tuned adaptation lr 2e-5 [extension]", t,
                 float(r.psnr_per_frame.mean()), float(r.ssim_per_frame.mean())))

    # 4e. REAL photograph under global camera pan (matplotlib's bundled
    # grace_hopper.jpg) — true photographic statistics through the full
    # acquisition model; the only real-capture-statistics row available
    # in this environment (no dataset files, zero egress)
    scene_photo = make_scene(b=b, h=h, w=w, seed=42, style="photo")
    yp = jax.device_put(jnp.asarray(scene_photo.meas))
    origp = jax.device_put(jnp.asarray(scene_photo.orig_bayer))
    f4e = lambda: (reconstruct_single_dispatch(  # noqa: E731
        yp, phi, wcfg, cfg4, prior, variables, orig=origp).x_bayer,)
    t, _ = timed(f4e)
    r = reconstruct_single_dispatch(yp, phi, wcfg, cfg4, prior, variables,
                                    orig=origp)
    rows.append(("4e. flagship on real-photo scene (global pan)", t,
                 float(r.psnr_per_frame.mean()), float(r.ssim_per_frame.mean())))

    # 5. DDnet joint demosaicking (regenerated weights if present) + batched
    dd_path = "weights/ddnet.npz"
    if os.path.exists(dd_path):
        from adaptivepnp_sci_tpu.models.ddnet import DDnet
        from adaptivepnp_sci_tpu.solvers.priors import ddnet_demosaic
        from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

        # bf16 U-Nets: identical PSNR/SSIM, 21% faster (ab_ddnet_precision.py)
        dd = DDnet(dtype=jnp.bfloat16)
        dvars = jax.device_put(load_checkpoint_variables(dd_path))
        dm = ddnet_demosaic(dd, dvars)
        cfg5 = ADMMConfig(sigma=(25 / 255, 12 / 255, 6 / 255), iters=(6, 6, 4),
                          denoiser="ffdnet", demosaic_method="ddnet")
        f5 = lambda: (reconstruct_single_dispatch(  # noqa: E731
            y, phi, wcfg, cfg5, prior, variables, orig=orig,
            demosaic_fn=dm).x_bayer,)
        t, _ = timed(f5)
        r = reconstruct_single_dispatch(y, phi, wcfg, cfg5, prior, variables,
                                        orig=orig, demosaic_fn=dm)
        rows.append(("5a. FFDNet + DDnet joint demosaicking", t,
                     float(r.psnr_per_frame.mean()),
                     float(r.ssim_per_frame.mean())))

        # 5c. same config on dead-leaves: the leaves-mix DDnet demosaics
        # natural occlusion edges Malvar cannot (beats the flagship's
        # Malvar path on this scene); demosaicking is feedback-benign, so
        # natural training data helps here where it destabilizes the
        # denoiser (RESULTS.md dose-response)
        f5c = lambda: (reconstruct_single_dispatch(  # noqa: E731
            yn, phi, wcfg, cfg5, prior, variables, orig=orign,
            demosaic_fn=dm).x_bayer,)
        t, _ = timed(f5c)
        r = reconstruct_single_dispatch(yn, phi, wcfg, cfg5, prior, variables,
                                        orig=orign, demosaic_fn=dm)
        rows.append(("5c. DDnet joint demosaicking on dead-leaves", t,
                     float(r.psnr_per_frame.mean()),
                     float(r.ssim_per_frame.mean())))
    else:
        rows.append(("5a. FFDNet + DDnet joint demosaicking", float("nan"),
                     float("nan"), float("nan")))

    # 5b. batched throughput (4 snapshots, Malvar demosaic, incl. warm starts)
    scene4 = make_scene(b=b, h=h, w=w, seed=43, n_meas=4)
    y4 = jax.device_put(jnp.asarray(scene4.meas.transpose(2, 0, 1)))
    orig4 = jax.device_put(jnp.asarray(scene4.orig_bayer))
    phi4 = jax.device_put(jnp.asarray(scene4.mask))

    def run_batched():
        x0 = jnp.stack([gap_tv(y4[i], phi4, wcfg).x_bayer for i in range(4)])
        return two_stage_admm_batched(
            y4, phi4, cfg2, prior=prior, variables=variables,
            x0_batch=x0, orig_batch=orig4,
        )

    f5b = lambda: (run_batched().x_bayer,)  # noqa: E731
    t, _ = timed(f5b)
    r = run_batched()
    rows.append((f"5b. batched x4 throughput ({4*b} frames)", t,
                 float(r.psnr_per_frame.mean()), float(r.ssim_per_frame.mean())))

    # 6. scale row: 1024^2x8 (4x the flagship pixels) through the tiled
    # large-scene mode (vmap over 512^2 tiles, adaptation grads pmean-shared,
    # warm start cropped per tile) — near-linear scaling evidence
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    scene_big = make_scene(b=b, h=1024, w=1024, seed=42)
    yb = jax.device_put(jnp.asarray(scene_big.meas))
    phib = jax.device_put(jnp.asarray(scene_big.mask))
    origb = jax.device_put(jnp.asarray(scene_big.orig_bayer))

    def run_big():
        x0 = gap_tv(yb, phib, wcfg).x_bayer
        return two_stage_admm_tiled(yb, phib, cfg4, tile=512, prior=prior,
                                    variables=variables, orig_bayer=origb,
                                    x0_bayer=x0)

    f6 = lambda: (run_big().x_bayer,)  # noqa: E731
    t, _ = timed(f6)
    r = run_big()
    rows.append(("6. tiled 1024²x8 adaptive (4x pixels, 512² tiles)", t,
                 float(r.psnr_per_frame.mean()), float(r.ssim_per_frame.mean())))

    dev = str(jax.devices()[0])
    lines = [
        "# RESULTS — benchmark suite (synthetic 512x512x8 Bayer scene)",
        "",
        f"Device: {dev}. Times are best-of-N steady state (compile excluded;",
        "N=2, or 6 on the jitter-prone adaptive FastDVDnet rows), completion",
        "forced by scalar host reads. North-star budget: 10 s/snapshot",
        "(BASELINE.md).",
        "",
        "| config | s/run | frames/s | PSNR (dB) | SSIM |",
        "|---|---|---|---|---|",
    ]
    for name, t, p, s in rows:
        frames = 4 * b if name.startswith("5b") else b
        fps = frames / t if t == t and t > 0 else float("nan")
        lines.append(f"| {name} | {t:.3f} | {fps:.1f} | {p:.2f} | {s:.4f} |")
    text = "\n".join(lines) + "\n"
    # preserve the hand-written analysis sections below the table (the first
    # "## " heading onward) — only the measured table is regenerated
    if os.path.exists(out_path):
        old = open(out_path).read()
        idx = old.find("\n## ")
        if idx != -1:
            text = text + old[idx:]
    with open(out_path, "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "RESULTS.md")
