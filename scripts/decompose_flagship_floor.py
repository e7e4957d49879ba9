"""Attribute the FFDNet flagship's ~0.69 s/snapshot to its components.

The FastDVD config got this treatment in round 3 (`decompose_fastdvd_floor.py`:
5% solver / 95% HBM-bound U-Nets, fused-kernel win bounded at ~2x and
declined). The flagship — the benchmark headline — deserves the same
quantified evidence that its number sits near the hardware bound rather
than near an unexamined default. Whole-jit program timings only (the
tunnel-safe methodology, ROADMAP "Performance bounds"):

  A. denoiser-only: `lax.scan` of the 25 `ffdnet_prior.apply` calls on the
     (8,512,512,3) cube with the real sigma schedule;
  B. solver-overhead-only: GAP-TV warm start (40 it) + full two-stage ADMM
     with the prior replaced by identity — x-update, Malvar demosaic,
     theta/dual updates, per-iteration PSNR trace;
  C. fixed-weight floor (A inside B, no adaptation);
  D. flagship (C + online adaptation, lr 2e-6 x2 steps every 15 it) —
     D - C prices the adaptation gradient steps.

Also prints XLA's cost analysis for one FFDNet apply (FLOPs, HBM bytes)
to place the measured per-iteration time against the fp32 compute and
HBM roofline of the chip.

Usage: python scripts/decompose_flagship_floor.py
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


def timed(fn, n=6):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.solvers import GapTVConfig
    from adaptivepnp_sci_tpu.solvers.end_to_end import reconstruct_single_dispatch
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig

    b, h, w = 8, 512, 512
    scene = make_scene(b=b, h=h, w=w, seed=42)
    y = jax.device_put(jnp.asarray(scene.meas))
    phi = jax.device_put(jnp.asarray(scene.mask))

    model = ffdnet_color()
    variables = jax.device_put(
        load_ffdnet("/root/reference/model_zoo/ffdnet_color.pth")
    )
    prior = ffdnet_prior(model)

    wcfg = GapTVConfig(iters=40)
    fixed_cfg = ADMMConfig(sigma=(25 / 255, 12 / 255, 6 / 255),
                           iters=(15, 6, 4), denoiser="ffdnet")
    flag_cfg = ADMMConfig(
        sigma=fixed_cfg.sigma, iters=fixed_cfg.iters, denoiser="ffdnet",
        adapt=AdaptConfig(lr=2e-6, update_per_iter=2, interval_iter=15,
                          initial_iter=1),
    )
    n_iters = sum(fixed_cfg.iters)

    # XLA cost analysis: one FFDNet apply at benchmark shape
    x0 = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3), jnp.float32)
    )
    one = jax.jit(lambda v, x: prior.apply(v, x, jnp.float32(12 / 255)))
    ca = one.lower(variables, x0).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    gflop = ca.get("flops", 0.0) / 1e9
    gbytes = ca.get("bytes accessed", 0.0) / 1e9
    print(f"one FFDNet apply (8x512x512x3): {gflop:.0f} GFLOP, "
          f"{gbytes:.1f} GB accessed (XLA cost analysis)", flush=True)

    # A. denoiser-only scan with the real sigma schedule
    sigmas = jnp.concatenate(
        [jnp.full(n, s, jnp.float32)
         for s, n in zip(fixed_cfg.sigma, fixed_cfg.iters)]
    )

    @jax.jit
    def denoise_scan(v, x):
        def body(c, s):
            return prior.apply(v, c, s), None
        out, _ = jax.lax.scan(body, x, sigmas)
        return out

    t_a = timed(lambda: (denoise_scan(variables, x0),))
    print(f"A. denoiser-only scan ({n_iters} it): {t_a:.3f} s "
          f"({1e3 * t_a / n_iters:.1f} ms/it -> "
          f"{gflop * n_iters / t_a / 1e3:.1f} TF/s, "
          f"{gbytes * n_iters / t_a:.0f} GB/s)", flush=True)

    # B. solver with identity denoiser (warm start included)
    id_prior = prior._replace(apply=lambda v, x, s: x)
    t_b = timed(lambda: (reconstruct_single_dispatch(
        y, phi, wcfg, fixed_cfg, id_prior, variables).x_bayer,))
    print(f"B. warm start + solver, identity prior: {t_b:.3f} s", flush=True)

    # C. fixed-weight floor
    t_c = timed(lambda: (reconstruct_single_dispatch(
        y, phi, wcfg, fixed_cfg, prior, variables).x_bayer,))
    print(f"C. fixed-weight floor (A inside B): {t_c:.3f} s "
          f"(C-(A+B) = {t_c - t_a - t_b:+.3f} s)", flush=True)

    # D. flagship with online adaptation
    t_d = timed(lambda: (reconstruct_single_dispatch(
        y, phi, wcfg, flag_cfg, prior, variables).x_bayer,))
    print(f"D. flagship (C + adaptation): {t_d:.3f} s "
          f"(adaptation increment D-C = {t_d - t_c:+.3f} s)", flush=True)


if __name__ == "__main__":
    main()
