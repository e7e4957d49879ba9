"""Regenerate FastDVDnet / DDnet weights (absent from the reference snapshot,
``/root/reference/.MISSING_LARGE_BLOBS``) by offline training.

Without the DAVIS data the reference trained on (not shipped, zero egress),
training uses procedurally generated video clips from the same family as the
synthetic benchmark scenes — weights are distribution-matched to the
benchmarks here and functional stand-ins elsewhere; the converters accept
upstream checkpoints whenever real ones are available.

Usage: python scripts/regenerate_weights.py [fastdvd|ddnet] [steps] [textured] [lipschitz_weight] [spectral_weight] [out_dir] [spectral_target] [spectral_iters] [n_clips] [clip_size] [styles] [video_dir]
``styles`` is a comma-separated scene-family mix (e.g. ``smooth,leaves``)
forwarded to ``synthetic_video_dataset`` — mixing ``leaves`` (dead-leaves
natural statistics) is the procedural stand-in for DAVIS training.
Saves orbax checkpoints under weights/<name>/final.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from adaptivepnp_sci_tpu.train import Trainer, TrainerConfig
from adaptivepnp_sci_tpu.train.datasets import batch_iterator, synthetic_video_dataset
from adaptivepnp_sci_tpu.train.tasks import ddnet_task, fastdvd_task


def main(network: str, steps: int, textured: bool = False,
         lipschitz: float = 0.0, spectral: float = 0.0,
         out_dir: str | None = None, spectral_target: float = 1.0,
         spectral_iters: int = 2, n_clips: int = 0,
         clip_size: int = 64, styles: tuple[str, ...] | None = None,
         video_dir: str | None = None) -> None:
    # Data stays device-resident: per-step batch gathers run on-chip instead
    # of re-uploading ~8MB over the (possibly remote) host link every step.
    # NOTE: defaults reproduce the shipped weights. Textured data / longer
    # training improve standalone denoising but reduce PnP contractiveness
    # (see RESULTS.md); the lipschitz penalty is the experimental antidote.
    # n_clips=0 keeps the historical defaults. The destabilization of
    # longer training traces to OVERFITTING the small device-resident clip
    # pool (sigma_max holds at train points but explodes on held-out data);
    # the pool is procedural, so the principled fix is a bigger pool.
    n = n_clips or (768 if textured else 512)
    # n_clips>0 also switches to scale-matched data: random 64px crops of
    # 256/512px source videos, whose pixel statistics match the full-
    # resolution benchmark scenes (directly-generated 64px clips carry
    # 4x-8x smaller features — a scale mismatch that destabilizes the PnP
    # loop at 512px; see synthetic_video_dataset docstring)
    src = (256, 512) if n_clips else None
    if video_dir is not None:
        # REAL video data (e.g. DAVIS whenever available): the reference's
        # DALI ingestion contract via first-party cv2 decode
        if textured or styles:
            raise SystemExit(
                "video_dir supplies the training data; textured/styles "
                "configure the synthetic pool only — pass '0' and '-' for "
                "those positions when training from video files")
        from adaptivepnp_sci_tpu.data.video import video_clip_dataset

        pool = video_clip_dataset(video_dir, n, length=5, size=clip_size,
                                  seed=123)
    else:
        pool = synthetic_video_dataset(n, length=5, size=clip_size, seed=123,
                                       textured=textured, source_sizes=src,
                                       styles=styles)
    clips = jax.device_put(jnp.asarray(pool))
    key = jax.random.PRNGKey(0)
    if network == "fastdvd":
        from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet

        model = FastDVDnet()
        variables = model.init(key, jnp.zeros((1, 5, 32, 32, 3)), jnp.float32(0.1))
        task = fastdvd_task(model, demosaic_aug=True,
                            lipschitz_penalty=lipschitz,
                            spectral_penalty=spectral,
                            spectral_target=spectral_target,
                            spectral_iters=spectral_iters)
        lr = 1e-3
    elif network == "ddnet":
        from adaptivepnp_sci_tpu.models.ddnet import DDnet

        model = DDnet()
        variables = model.init(key, jnp.zeros((1, 5, 32, 32, 3)))
        task = ddnet_task(model)
        lr = 1e-3
    else:
        raise SystemExit(f"unknown network {network}")

    spe = max(len(clips) // 32, 1)
    trainer = Trainer(
        task, variables,
        TrainerConfig(lr=lr, steps_per_epoch=spe,
                      milestones=(steps // spe * 2 // 3, steps // spe * 5 // 6),
                      ckpt_dir=out_dir or f"weights/{network}", ckpt_every_epochs=10**9,
                      seed=0),
    )
    losses = trainer.fit(batch_iterator(clips, 32, seed=0), max_steps=steps,
                         log_every=200)
    trainer.save(f"{out_dir or ('weights/' + network)}/final")
    print(f"{network}: {trainer.step} steps, loss {losses[0]:.5f} -> {losses[-1]:.5f}")


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 3000,
        textured=len(sys.argv) > 3 and sys.argv[3] == "textured",
        lipschitz=float(sys.argv[4]) if len(sys.argv) > 4 else 0.0,
        spectral=float(sys.argv[5]) if len(sys.argv) > 5 else 0.0,
        out_dir=sys.argv[6] if len(sys.argv) > 6 else None,
        spectral_target=float(sys.argv[7]) if len(sys.argv) > 7 else 1.0,
        spectral_iters=int(sys.argv[8]) if len(sys.argv) > 8 else 2,
        n_clips=int(sys.argv[9]) if len(sys.argv) > 9 else 0,
        clip_size=int(sys.argv[10]) if len(sys.argv) > 10 else 64,
        # '-'/''/'none' = placeholder to reach the video_dir position
        styles=(tuple(sys.argv[11].split(","))
                if len(sys.argv) > 11 and sys.argv[11] not in ("-", "", "none")
                else None),
        video_dir=sys.argv[12] if len(sys.argv) > 12 else None,
    )
