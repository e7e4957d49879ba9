"""The 2048^2x8 ADAPTIVE single-chip run (VERDICT round-4 item 6).

Round 4 measured the fixed-weight 2048^2 tiled solve at 8.0 s (RESULTS row
6b) and declared the ADAPTIVE config HBM-infeasible: 16 concurrent 512^2
tile backwards need ~46 GB of stored activations. Two counter-levers:

* ``AdaptConfig.crop`` (adaptation loss on a Bayer-aligned random crop —
  an unbiased estimator of the full-frame measurement loss through the
  pixel-separable forward model): at crop=c the per-tile backward stores
  ``(c/512)^2`` of the full activations. Measured alone: crop=256 still
  RESOURCE_EXHAUSTEDs (16 x ~1 GB of concurrent backwards + solver state)
  and crop<=128 crashes the XLA compile helper outright (reproducibly) —
  the 16-tile program is beyond this chip either way.
* ``tile_chunk`` (sequential tile groups with adapted-weight carry): 4
  groups of 4 tiles are exactly four of the PROVEN 1024^2 adaptive
  programs (RESULTS row 6) run back to back — full-frame adaptation loss,
  no crop needed; group-sequential adaptation semantics (weights flow
  group -> group, the spatial analogue of the reference's reuse_model
  measurement carry).

Budget: the north star is 10 s/snapshot at 512^2; 16x the pixels gives a
160 s equivalence bound (near-linear scaling would be ~2.2 s x 16-tile
batch ~= the fixed row's 8 s plus adaptation).

Usage: python scripts/bench_2048_adaptive.py [chunk:crop ...]
       (crop empty = full-frame adaptation loss, e.g. "4:" "4:256" "16:128")
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main(combos: tuple[str, ...] = ("4:", "4:256")) -> None:
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    b, h = 8, 2048
    scene = make_scene(b=b, h=h, w=h, seed=42)
    y = jax.device_put(jnp.asarray(scene.meas, jnp.float32))
    phi = jax.device_put(jnp.asarray(scene.mask, jnp.float32))
    orig = jax.device_put(jnp.asarray(scene.orig_bayer))

    variables = jax.device_put(
        load_ffdnet("/root/reference/model_zoo/ffdnet_color.pth")
    )
    prior = ffdnet_prior(ffdnet_color())

    x0 = gap_tv(y, phi, GapTVConfig(iters=40)).x_bayer
    _ = float(jnp.sum(x0))

    print(f"{h}x{h}x{b}, 512^2 tiles, flagship adaptive config "
          "(lr 2e-6, 2 steps every 15), one chip")
    print("| tile_chunk | adapt crop | s/solve (steady) | PSNR | SSIM |")
    print("|---|---|---|---|---|")
    for combo in combos:
        cs, _, ks = combo.partition(":")
        chunk = int(cs) if cs else None
        crop = int(ks) if ks else None
        config = ADMMConfig(
            sigma=(25 / 255, 12 / 255, 6 / 255), iters=(15, 6, 4),
            denoiser="ffdnet",
            adapt=AdaptConfig(lr=2e-6, update_per_iter=2, interval_iter=15,
                              initial_iter=1, crop=crop),
        )

        def solve():
            r = two_stage_admm_tiled(
                y, phi, config, tile=512, prior=prior, variables=variables,
                orig_bayer=orig, x0_bayer=x0, tile_chunk=chunk,
            )
            _ = float(jnp.sum(r.x_bayer))  # force completion over the tunnel
            return r

        try:
            r = solve()  # compile
            t0 = time.perf_counter()
            r = solve()
            dt = time.perf_counter() - t0
            print(f"| {chunk or 16} | {crop or 'full'} | {dt:.2f} | "
                  f"{float(r.psnr_per_frame.mean()):.2f} | "
                  f"{float(r.ssim_per_frame.mean()):.4f} |", flush=True)
        except Exception as e:  # noqa: BLE001 — record OOM as a result
            msg = str(e).splitlines()[0][:120]
            print(f"| {chunk or 16} | {crop or 'full'} | FAILED: {msg} | | |",
                  flush=True)


if __name__ == "__main__":
    main(tuple(sys.argv[1:]) or ("4:", "4:256"))
