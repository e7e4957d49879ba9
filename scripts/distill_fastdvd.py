"""Distill the real-weight FFDNet into FastDVDnet.

Why: the reference's FastDVDnet checkpoint is missing from the snapshot
(``/root/reference/.MISSING_LARGE_BLOBS``) and procedural-clip MSE training
produces weights that hallucinate inside the PnP loop on non-smooth scenes
(every FastDVD SCENES.md row is guard-pinned at its warm start; ROADMAP
'Quality bounds'). The one real natural-image prior available offline is the
reference's FFDNet checkpoint (``model_zoo/ffdnet_color.pth``), whose in-loop
behavior is good on every stand-in style (all SCENES.md ffd rows improve).
Distillation trains FastDVDnet to match the FFDNet OPERATOR on a mixed-style
input pool — targets encode the teacher's natural-image prior and its
contraction behavior, not the procedural generator's inverse, so styles that
destabilize MSE-to-clean training (leaves/textured, RESULTS.md dose-response)
become usable.

Usage:
  python scripts/distill_fastdvd.py [steps] [n_clips] [styles] [w] [out] [--cpu]
    styles  comma list for synthetic_video_dataset (default
            smooth,textured,leaves,photos — the full mix)
    w       distill weight in [0,1] (1 = pure distillation; default 1)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

FFDNET_CKPT = "/root/reference/model_zoo/ffdnet_color.pth"


def main(steps: int = 25000, n_clips: int = 4096,
         styles: tuple[str, ...] = ("smooth", "textured", "leaves", "photos"),
         distill_weight: float = 1.0, out_dir: str = "weights/fastdvd_distill",
         cpu: bool = False) -> None:
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
    from adaptivepnp_sci_tpu.train import Trainer, TrainerConfig
    from adaptivepnp_sci_tpu.train.datasets import (
        batch_iterator,
        synthetic_video_dataset,
    )
    from adaptivepnp_sci_tpu.train.tasks import fastdvd_task

    ffd = ffdnet_color()
    ffd_vars = load_ffdnet(FFDNET_CKPT)

    def teacher(noisy_center, sigma):
        return ffd.apply(ffd_vars, noisy_center, sigma)

    # scale-matched mixed-style pool (64px crops of 256/512px sources) —
    # the same staging as the shipped weights, plus the styles the clean-
    # target objective could not digest
    pool = synthetic_video_dataset(n_clips, length=5, size=64, seed=123,
                                   source_sizes=(256, 512), styles=styles)
    clips = jax.device_put(jnp.asarray(pool))

    model = FastDVDnet()
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, 5, 32, 32, 3)), jnp.float32(0.1))
    task = fastdvd_task(model, demosaic_aug=True, teacher=teacher,
                        distill_weight=distill_weight)

    spe = max(len(clips) // 32, 1)
    trainer = Trainer(
        task, variables,
        TrainerConfig(lr=1e-3, steps_per_epoch=spe,
                      milestones=(steps // spe * 2 // 3, steps // spe * 5 // 6),
                      ckpt_dir=out_dir, ckpt_every_epochs=10**9, seed=0),
    )
    losses = trainer.fit(batch_iterator(clips, 32, seed=0), max_steps=steps,
                         log_every=500)
    trainer.save(f"{out_dir}/final")
    print(f"distill: {trainer.step} steps, loss "
          f"{losses[0]:.5f} -> {losses[-1]:.5f} -> {out_dir}/final")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--cpu"]
    main(
        steps=int(argv[0]) if len(argv) > 0 else 25000,
        n_clips=int(argv[1]) if len(argv) > 1 else 4096,
        styles=(tuple(argv[2].split(",")) if len(argv) > 2
                else ("smooth", "textured", "leaves", "photos")),
        distill_weight=float(argv[3]) if len(argv) > 3 else 1.0,
        out_dir=argv[4] if len(argv) > 4 else "weights/fastdvd_distill",
        cpu="--cpu" in sys.argv,
    )
