"""FastDVD config-3 speed work: bf16-with-fp32-residual DenBlocks vs fp32
(VERDICT round-2 item 5 — target <=3 s/snapshot at unchanged PSNR).

Runs the benchmark FastDVD config (512x512x8, adaptation on) with
``FastDVDnet(dtype=None)`` vs ``FastDVDnet(dtype=jnp.bfloat16)`` and prints
s/run + PSNR/SSIM for both.

Usage: python scripts/bench_fastdvd_bf16.py
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
        float(jnp.sum(out[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
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
    orig = jax.device_put(jnp.asarray(scene.orig_bayer))
    fvars = jax.device_put(load_checkpoint_variables("weights/fastdvd.npz"))

    cfg = ADMMConfig(sigma=(12 / 255, 6 / 255), iters=(24, 12),
                     denoiser="fastdvd",
                     adapt=AdaptConfig(lr=2e-7, update_per_iter=2,
                                       interval_iter=12, initial_iter=1))
    wcfg = GapTVConfig(iters=40)

    for name, dtype in (("fp32", None), ("bf16+fp32res", jnp.bfloat16)):
        fprior = fastdvd_prior(FastDVDnet(dtype=dtype))
        fn = lambda: (reconstruct_single_dispatch(  # noqa: E731
            y, phi, wcfg, cfg, fprior, fvars, orig=orig).x_bayer,)
        t = timed(fn)
        r = reconstruct_single_dispatch(y, phi, wcfg, cfg, fprior, fvars,
                                        orig=orig)
        print(f"{name:14s}: {t:.3f} s/run  "
              f"PSNR {float(r.psnr_per_frame.mean()):.2f} dB  "
              f"SSIM {float(r.ssim_per_frame.mean()):.4f}", flush=True)


if __name__ == "__main__":
    main()
