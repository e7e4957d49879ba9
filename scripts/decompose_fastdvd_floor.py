"""Attribute the FastDVD config's 36-iteration no-adapt solver floor.

Round-3 measured the floor at ~1.59 s (44 ms/iteration). A naive roofline
estimate for the denoiser alone (~350 GFLOP/iter bf16 at 197 TFLOP/s; ~3 GB
HBM traffic at 819 GB/s) is ~6 ms/iteration — a 7x gap worth attributing
before writing any fused kernel. This times three whole-jit programs
(the only honest methodology over the axon tunnel, ROADMAP "Performance
bounds"):

  A. denoiser-only: `lax.scan` of 36 `fastdvd_prior.apply` calls on a
     (8,512,512,3) cube — the denoiser's marginal cost inside a scan,
     including fp32<->bf16 boundary casts;
  B. solver-overhead-only: the full two-stage ADMM floor with the prior's
     apply replaced by identity — x-update, Malvar demosaic, theta/dual
     updates, per-iteration PSNR trace, warm start;
  C. the real floor (A inside B).

If C ~= A + B the program is additive and the bigger term names the
optimization target; if C >> A + B, XLA is losing something at the
composition boundary (layout thrash between solver fp32 and denoiser bf16).

Usage: python scripts/decompose_fastdvd_floor.py
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
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.solvers import GapTVConfig
    from adaptivepnp_sci_tpu.solvers.end_to_end import reconstruct_single_dispatch
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig
    from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

    b, h, w = 8, 512, 512
    scene = make_scene(b=b, h=h, w=w, seed=42)
    y = jax.device_put(jnp.asarray(scene.meas))
    phi = jax.device_put(jnp.asarray(scene.mask))

    fmodel = FastDVDnet(dtype=jnp.bfloat16, remat=False)
    fvars = jax.device_put(load_checkpoint_variables("weights/fastdvd.npz"))
    fprior = fastdvd_prior(fmodel)

    wcfg = GapTVConfig(iters=40)
    cfg = ADMMConfig(sigma=(12 / 255, 6 / 255), iters=(24, 12),
                     denoiser="fastdvd")
    n_iters = sum(cfg.iters)

    # A. denoiser-only scan
    x0 = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3), jnp.float32)
    )

    @jax.jit
    def denoise_scan(v, x):
        def body(c, s):
            return fprior.apply(v, c, s), None
        sigmas = jnp.concatenate(
            [jnp.full(n, s / 1.0, jnp.float32)
             for s, n in zip(cfg.sigma, cfg.iters)]
        )
        out, _ = jax.lax.scan(body, x, sigmas)
        return out

    t_a = timed(lambda: (denoise_scan(fvars, x0),))
    print(f"A. denoiser-only scan ({n_iters} it): {t_a:.3f} s "
          f"({1e3 * t_a / n_iters:.1f} ms/it)", flush=True)

    # B. solver with identity denoiser
    id_prior = fprior._replace(apply=lambda v, x, s: x)
    t_b = timed(lambda: (reconstruct_single_dispatch(
        y, phi, wcfg, cfg, id_prior, fvars).x_bayer,))
    print(f"B. solver floor, identity prior:   {t_b:.3f} s "
          f"({1e3 * t_b / n_iters:.1f} ms/it)", flush=True)

    # C. real floor
    t_c = timed(lambda: (reconstruct_single_dispatch(
        y, phi, wcfg, cfg, fprior, fvars).x_bayer,))
    print(f"C. real floor (A inside B):        {t_c:.3f} s "
          f"({1e3 * t_c / n_iters:.1f} ms/it)", flush=True)
    print(f"A+B = {t_a + t_b:.3f} s; composition overhead "
          f"C-(A+B) = {t_c - t_a - t_b:+.3f} s", flush=True)


if __name__ == "__main__":
    main()
