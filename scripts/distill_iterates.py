"""Distill FFDNet into FastDVDnet on the PnP loop's own iterate distribution.

Stage 2 of the distillation line (stage 1, ``scripts/distill_fastdvd.py``,
measured: value-matching on Gaussian-noised clips transfers the teacher's
prior standalone but the student's JACOBIAN is expansive off that manifold —
sigma_max 1.128 vs teacher 0.721 — and it collapses in-loop). This run
trains on the union of

  * harvested ADMM iterates (``scripts/harvest_iterates.py``: teacher-loop
    AND current-student-loop trajectories, 512^2 solves, Bayer-aligned 64px
    window crops) used as-is, and
  * clean synthetic clips (the shipped recipe's scale-matched mixed-style
    pool) with fresh Gaussian noise each step,

with the teacher's output as the only target, plus optional Jacobian (jvp)
matching — see ``train.tasks.fastdvd_distill_task``.

Usage:
  python scripts/distill_iterates.py pool.npz [steps] [jac_weight] [n_synth]
      [out_dir] [--cpu]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

FFDNET_CKPT = "/root/reference/model_zoo/ffdnet_color.pth"


def main(pool_path: str, steps: int = 25000, jac_weight: float = 0.0,
         n_synth: int = 2048, out_dir: str = "weights/fastdvd_distill_it",
         cpu: bool = False) -> None:
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.train import Trainer, TrainerConfig
    from adaptivepnp_sci_tpu.train.datasets import (
        paired_batch_iterator,
        synthetic_video_dataset,
    )
    from adaptivepnp_sci_tpu.train.tasks import fastdvd_distill_task

    ffd = ffdnet_color()
    ffd_vars = load_ffdnet(FFDNET_CKPT)

    def teacher(noisy_center, sigma):
        return ffd.apply(ffd_vars, noisy_center, sigma)

    with np.load(pool_path) as z:
        it_clips = z["clips"].astype(np.float32)
        it_sigmas = z["sigmas"].astype(np.float32)
    synth = synthetic_video_dataset(
        n_synth, length=5, size=64, seed=123, source_sizes=(256, 512),
        styles=("smooth", "textured", "leaves", "photos"),
    ).astype(np.float32)
    rng = np.random.default_rng(3)
    synth_sigmas = rng.uniform(5 / 255, 55 / 255, len(synth)).astype(np.float32)

    clips = np.concatenate([it_clips, synth])
    sigmas = np.concatenate([it_sigmas, synth_sigmas])
    needs_noise = np.concatenate(
        [np.zeros(len(it_clips), np.float32), np.ones(len(synth), np.float32)]
    )
    print(f"pool: {len(it_clips)} iterate probes + {len(synth)} synth clips")

    clips = jax.device_put(jnp.asarray(clips))
    sigmas = jax.device_put(jnp.asarray(sigmas))
    needs_noise = jax.device_put(jnp.asarray(needs_noise))

    model = FastDVDnet()
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, 5, 32, 32, 3)), jnp.float32(0.1))
    task = fastdvd_distill_task(model, teacher, jac_weight=jac_weight)

    spe = max(len(clips) // 32, 1)
    trainer = Trainer(
        task, variables,
        TrainerConfig(lr=1e-3, steps_per_epoch=spe,
                      milestones=(steps // spe * 2 // 3, steps // spe * 5 // 6),
                      ckpt_dir=out_dir, ckpt_every_epochs=10**9, seed=0),
    )
    losses = trainer.fit(
        paired_batch_iterator((clips, sigmas, needs_noise), 32, seed=0),
        max_steps=steps, log_every=500,
    )
    trainer.save(f"{out_dir}/final")
    print(f"distill-iterates: {trainer.step} steps, jac_weight={jac_weight}, "
          f"loss {losses[0]:.5f} -> {losses[-1]:.5f} -> {out_dir}/final")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--cpu"]
    main(
        pool_path=argv[0] if argv else "weights/iterate_pool.npz",
        steps=int(argv[1]) if len(argv) > 1 else 25000,
        jac_weight=float(argv[2]) if len(argv) > 2 else 0.0,
        n_synth=int(argv[3]) if len(argv) > 3 else 2048,
        out_dir=argv[4] if len(argv) > 4 else "weights/fastdvd_distill_it",
        cpu="--cpu" in sys.argv,
    )
