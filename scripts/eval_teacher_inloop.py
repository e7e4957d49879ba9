"""The distillation student's CEILING: run the TEACHER (real-weight FFDNet)
through the exact loop eval_weights.py scores students in (fastdvd-branch
ADMMConfig: rho=0.55, sigma=(12,6)/255, iters=(24,12), adapt lr 2e-7).

Interpretation: a student that perfectly imitated the teacher operator would
land exactly here. Below this = imitation error; the gap between this and
the shipped weights' number = the operator difference (FFDNet prior vs the
generator-inverting procedural weights).

Usage: python scripts/eval_teacher_inloop.py [--cpu] [--size 512] [styles...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

FFDNET_CKPT = "/root/reference/model_zoo/ffdnet_color.pth"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    size = 512
    if args and args[0].isdigit():
        size = int(args.pop(0))
    styles = args or ["smooth", "textured", "leaves", "photo"]

    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.solvers import GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        two_stage_admm,
    )

    prior = ffdnet_prior(ffdnet_color())
    variables = load_ffdnet(FFDNET_CKPT)
    cfg = ADMMConfig(
        sigma=(12 / 255, 6 / 255), iters=(24, 12), denoiser="fastdvd",
        adapt=AdaptConfig(lr=2e-7, update_per_iter=2, interval_iter=12,
                          initial_iter=1),
    )
    for style in styles:
        scene = make_scene(b=8, h=size, w=size, seed=42, style=style)
        y, phi = jnp.asarray(scene.meas), jnp.asarray(scene.mask)
        warm = gap_tv(y, phi, GapTVConfig(iters=40))
        r = two_stage_admm(y, phi, cfg, prior=prior, variables=variables,
                           x0_bayer=warm.x_bayer,
                           orig_bayer=jnp.asarray(scene.orig_bayer))
        print(f"teacher-in-loop@{size}/{style}: "
              f"warm={float(warm.psnr_per_frame.mean()):.2f} dB  "
              f"final={float(r.psnr_per_frame.mean()):.2f} dB")


if __name__ == "__main__":
    main()
