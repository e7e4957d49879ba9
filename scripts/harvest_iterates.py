"""Harvest the PnP loop's REAL denoiser-input distribution for distillation.

Why: operator distillation on Gaussian-noised clips transfers FFDNet's
natural-image prior across styles standalone (+9.5 dB textured) but the
student collapses in-loop (sigma_max 1.128, smooth 35.9 -> 19.9 dB @64):
the ADMM iterates leave the Gaussian-noise training manifold, and there the
imitation error is unconstrained — the same off-manifold failure as every
clean-target attempt (RESULTS.md round-3 dose-response). The fix this script
enables: train the student to match the teacher ON THE LOOP'S OWN INPUTS.

It records ``x_rgb_w`` — the exact tensor the solver hands the denoiser
(``solvers/two_stage_admm.py`` step_body: x-update -> Malvar demosaic ->
``x_rgb - w/tau``) — together with its conditioning sigma, from two
trajectory families:

  * teacher-loop: fixed-weight FFDNet as the prior (the operator the
    student should become) — the target trajectory distribution;
  * student-loop: the current student as the prior (DAgger-style) — the
    hallucinated neighborhoods the corrected operator must pull back from.

Fixed weights, clean duals, no relax/select_best — the distribution, not
the bells. rho = 0.55 (the fastdvd-branch value the target loop runs at,
``dvp…online.py:106-109``). From every iterate it samples circular 5-frame
windows x Bayer-phase-aligned 64px crops (scale-matched: crops OF 512^2
solver states, per the round-2 finding that directly-small inputs carry
mismatched feature scales).

Usage:
  python scripts/harvest_iterates.py out.npz [student_ckpt] [--cpu]
    (student_ckpt default weights/fastdvd_distill/final; '-' skips the
     student-loop half)

Output npz: clips (N,5,64,64,3) fp32 in the solver's value range,
sigmas (N,) fp32 — feed to ``train.tasks.fastdvd_distill_task`` via
``scripts/distill_iterates.py``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

FFDNET_CKPT = "/root/reference/model_zoo/ffdnet_color.pth"

# the hard-scene schedule family (Bosphorus/Runner rows): long high-sigma
# stages are where the regenerated weights hallucinate
SCHEDULE = ((50 / 255, 8), (25 / 255, 8), (12 / 255, 8), (6 / 255, 8))
STYLES = ("smooth", "textured", "leaves", "photo")
SEEDS = (11, 22)
CROPS_PER_ITER = 4          # windows x crops sampled from every iterate
SIZE = 512


def run_loop_and_harvest(y, phi, x0_packed, prior_apply, rng, crops, sigmas,
                         jnp, ops):
    """The solver's fixed-weight denoiser path (two_stage_admm.step_body,
    clean duals), recording the denoiser input at every iteration."""
    bayer, demosaic, physics = ops
    rho, alpha, tau = 0.55, 1.0, 100.0
    y_p = bayer.pack(y)
    phi_p = bayer.pack(phi)
    phi_s = physics.phi_sum(phi_p)
    n_frames = phi.shape[0]

    theta = x0_packed
    b = jnp.zeros_like(theta)
    w_dual = jnp.zeros((n_frames, SIZE, SIZE, 3), jnp.float32)
    import numpy as np

    for sigma, iters in SCHEDULE:
        for _ in range(iters):
            x = physics.admm_x_update(theta, b, y_p, phi_p, phi_s, rho, alpha)
            xb_full = bayer.unpack(x + b / rho)
            x_rgb = demosaic.malvar2004(xb_full)
            x_rgb_w = x_rgb - w_dual / tau

            # ---- record: circular 5-windows x Bayer-aligned 64px crops,
            # cropped ON DEVICE (pulling the full 25MB iterate per iteration
            # over the axon tunnel would dominate wall time)
            wins = []
            for _ in range(CROPS_PER_ITER):
                f = int(rng.integers(n_frames))
                idx = (np.arange(f - 2, f + 3)) % n_frames
                yy = 2 * int(rng.integers((SIZE - 64) // 2 + 1))
                xx = 2 * int(rng.integers((SIZE - 64) // 2 + 1))
                wins.append(x_rgb_w[idx, yy : yy + 64, xx : xx + 64])
                sigmas.append(sigma)
            crops.extend(np.asarray(jnp.stack(wins), np.float32))

            xhat = prior_apply(x_rgb_w, jnp.float32(sigma))
            theta = jnp.clip(bayer.rggb_subsample(xhat), 0.0, 1.0)
            b = b + (x - theta)
            w_dual = w_dual + (x_rgb - xhat)


def main(out: str, student_ckpt: str | None, cpu: bool) -> None:
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.ops import bayer, demosaic, physics
    from adaptivepnp_sci_tpu.solvers import GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior
    from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

    ops = (bayer, demosaic, physics)
    ffd = ffdnet_color()
    ffd_vars = jax.device_put(load_ffdnet(FFDNET_CKPT))
    ffd_apply = jax.jit(lambda x, s: ffd.apply(ffd_vars, x, s))

    priors = {"teacher": ffd_apply}
    if student_ckpt != "-":
        model = FastDVDnet(dtype=jnp.bfloat16)
        sp = fastdvd_prior(model)
        s_vars = jax.device_put(load_checkpoint_variables(student_ckpt))
        priors["student"] = jax.jit(lambda x, s: sp.apply(s_vars, x, s))

    crops: list = []
    sigmas: list = []
    rng = np.random.default_rng(7)
    for style in STYLES:
        for seed in SEEDS:
            sc = make_scene(b=8, h=SIZE, w=SIZE, seed=seed, style=style)
            y, phi = jnp.asarray(sc.meas), jnp.asarray(sc.mask)
            warm = gap_tv(y, phi, GapTVConfig(iters=40))
            x0 = bayer.pack(warm.x_bayer)  # (B, H, W) -> (B, 4, H/2, W/2)
            for name, apply in priors.items():
                n0 = len(crops)
                run_loop_and_harvest(y, phi, x0, apply, rng, crops, sigmas,
                                     jnp, ops)
                print(f"{style}/{seed}/{name}: +{len(crops) - n0} clips")

    clips = np.stack(crops)
    np.savez(out, clips=clips, sigmas=np.asarray(sigmas, np.float32))
    print(f"harvested {clips.shape} -> {out} "
          f"({clips.nbytes / 2**20:.0f} MB)")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--cpu"]
    main(
        out=argv[0] if argv else "weights/iterate_pool.npz",
        student_ckpt=argv[1] if len(argv) > 1
        else "weights/fastdvd_distill/final",
        cpu="--cpu" in sys.argv,
    )
