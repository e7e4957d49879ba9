"""Solver-side in-loop fidelity sweep, round 2 (VERDICT round-2 item 8).

The measured contraction/fidelity wall (RESULTS.md crop-size sweep): weight
variants that denoise BETTER standalone (96px-crop, textured) do WORSE
inside the PnP loop. Round-2's uniform `denoiser_relax` failed to rescue
them; this sweep tries the next levers on the 512x512x8 benchmark scene:

  * per-sigma-stage relax schedules (damp only the large-sigma stages where
    the denoiser moves the iterate furthest);
  * stronger/denser online adaptation (pull the high-fidelity weights
    toward measurement consistency instead of damping them).

Usage: python scripts/sweep_fidelity.py [weights_dir_96] [weights_dir_tex]
Prints one line per config; paste results into RESULTS.md.
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


def main(p96: str = "weights/fastdvd96/final",
         ptex: str = "weights/fastdvd_tex/final") -> None:
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
    wcfg = GapTVConfig(iters=40)
    # bf16 DenBlocks: measured identical PSNR at 1.5x speed
    fprior = fastdvd_prior(FastDVDnet(dtype=jnp.bfloat16))

    ref_adapt = AdaptConfig(lr=2e-7, update_per_iter=2, interval_iter=12,
                            initial_iter=1)
    strong_adapt = AdaptConfig(lr=1e-6, update_per_iter=2, interval_iter=6,
                               initial_iter=1)

    weight_sets = {}
    for name, path in (("shipped", "weights/fastdvd.npz"),
                       ("crop96", p96), ("textured", ptex)):
        if os.path.exists(path) or os.path.isdir(path):
            weight_sets[name] = jax.device_put(load_checkpoint_variables(path))
        else:
            print(f"[skip] {name}: {path} absent")

    def run(label, wname, relax=1.0, adapt=ref_adapt):
        cfg = ADMMConfig(sigma=(12 / 255, 6 / 255), iters=(24, 12),
                         denoiser="fastdvd", adapt=adapt,
                         denoiser_relax=relax)
        fvars = weight_sets[wname]
        t0 = time.perf_counter()
        r = reconstruct_single_dispatch(y, phi, wcfg, cfg, fprior, fvars,
                                        orig=orig)
        p = float(r.psnr_per_frame.mean())
        s = float(r.ssim_per_frame.mean())
        print(f"{label:44s} PSNR {p:6.2f} dB  SSIM {s:.4f} "
              f"({time.perf_counter()-t0:.0f}s incl compile)", flush=True)

    for wname in weight_sets:
        run(f"{wname}: baseline (ref adapt, relax=1)", wname)
    for wname in ("crop96", "textured"):
        if wname not in weight_sets:
            continue
        run(f"{wname}: relax (0.5, 1.0)", wname, relax=(0.5, 1.0))
        run(f"{wname}: relax (0.7, 1.0)", wname, relax=(0.7, 1.0))
        run(f"{wname}: relax (0.7, 0.9)", wname, relax=(0.7, 0.9))
        run(f"{wname}: strong adapt (lr 1e-6, int 6)", wname,
            adapt=strong_adapt)
        run(f"{wname}: strong adapt + relax (0.7, 1.0)", wname,
            relax=(0.7, 1.0), adapt=strong_adapt)


if __name__ == "__main__":
    main(*sys.argv[1:])
