"""Command-line entry points.

The reference is driven by editing and running three scripts; here the same
workflows are subcommands:

  python -m adaptivepnp_sci_tpu.cli warmstart  --data scene.mat --out warm.mat
  python -m adaptivepnp_sci_tpu.cli reconstruct --data scene.mat --warm warm.mat \
      --denoiser ffdnet --ckpt model_zoo/ffdnet_color.pth --out results.mat
  python -m adaptivepnp_sci_tpu.cli synth --out scene.mat --size 512 --frames 8
"""

from __future__ import annotations

import argparse

import numpy as np


def _cmd_warmstart(args) -> None:
    from adaptivepnp_sci_tpu.data.mat_io import load_cacti_mat, save_warm_start
    from adaptivepnp_sci_tpu.pipelines import run_warm_start

    scene = load_cacti_mat(args.data, name=args.name)
    prior = variables = None
    if args.denoiser == "ffdnet":
        from adaptivepnp_sci_tpu.models.convert import load_ffdnet
        from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
        from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

        if not args.ckpt:
            raise SystemExit("--denoiser ffdnet requires --ckpt <ffdnet.pth>")
        prior = ffdnet_prior(ffdnet_color())
        variables = load_ffdnet(args.ckpt)
    out = run_warm_start(
        scene, iters=args.iters, denoiser=args.denoiser,
        prior=prior, variables=variables,
    )
    save_warm_start(args.out, out.x_bayer)
    print(f"warm start PSNR {out.psnr.mean():.2f} dB -> {args.out}")


def _load_weights(path, torch_loader, init_fn, defaults=(), random_init=False):
    """Accept reference .pth (converted) or our .npz / orbax checkpoints.
    Without an explicit path, fall back to the first existing default
    checkpoint; random init ONLY with ``random_init`` (a random denoiser
    reconstructs garbage — never a silent fallback)."""
    import os

    if not path:
        if random_init:
            return init_fn()
        path = next((d for d in defaults if os.path.exists(d)), None)
        if path is None:
            raise SystemExit(
                "error: no --ckpt given and no default checkpoint found "
                f"(searched: {', '.join(defaults)}). Pass --ckpt, or "
                "--random-init for an untrained-model smoke test."
            )
    if path.endswith(".pth"):
        return torch_loader(path)
    from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

    return load_checkpoint_variables(path)


def _build_denoiser(denoiser: str, ckpt: str | None,
                    random_init: bool = False, bf16: bool = False):
    """Construct ``(model, prior, variables)`` for a CLI run (shared by
    ``reconstruct`` and ``serve``)."""
    import pathlib

    import jax
    import jax.numpy as jnp

    repo_weights = pathlib.Path(__file__).resolve().parent.parent / "weights"

    if denoiser == "ffdnet":
        from adaptivepnp_sci_tpu.models.convert import load_ffdnet
        from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
        from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

        model = ffdnet_color()
        variables = _load_weights(
            ckpt, load_ffdnet,
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                               jnp.float32(0.1)),
            defaults=("/root/reference/model_zoo/ffdnet_color.pth",
                      str(repo_weights / "ffdnet_color.pth")),
            random_init=random_init,
        )
        prior = ffdnet_prior(model)
    else:
        from adaptivepnp_sci_tpu.models.convert import load_fastdvdnet
        from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
        from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior

        # bf16: conv/BN chains in bf16 with fp32 residuals (measured
        # 1.5x faster at identical PSNR, scripts/bench_fastdvd_bf16.py);
        # bf16 activations fit HBM un-remat'd, worth another ~5% in-loop
        model = FastDVDnet(dtype=jnp.bfloat16 if bf16 else None,
                           remat=not bf16)
        variables = _load_weights(
            ckpt, load_fastdvdnet,
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 5, 64, 64, 3)), jnp.float32(0.1)),
            defaults=(str(repo_weights / "fastdvd.npz"),),
            random_init=random_init,
        )
        # shared-triplet sequence path (temp1 once per distinct triplet)
        prior = fastdvd_prior(model)
    return model, prior, variables


def _cmd_reconstruct(args) -> None:
    import jax
    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.data.mat_io import (
        load_cacti_mat,
        load_warm_start,
        save_results,
    )
    from adaptivepnp_sci_tpu.pipelines import run_reconstruction

    scene = load_cacti_mat(args.data, name=args.name)

    def load_weights(path, torch_loader, init_fn, defaults=()):
        return _load_weights(path, torch_loader, init_fn, defaults,
                             random_init=args.random_init)

    import pathlib

    repo_weights = pathlib.Path(__file__).resolve().parent.parent / "weights"

    auto_ckpt = args.ckpt == "auto"
    if auto_ckpt and args.denoiser != "fastdvd":
        raise SystemExit(
            "error: --ckpt auto selects among the shipped FastDVDnet weight "
            "variants (weights/fastdvd{,_smooth}.npz); FFDNet ships one "
            "checkpoint — pass a path instead"
        )
    _, prior, variables = _build_denoiser(
        args.denoiser, None if auto_ckpt else args.ckpt,
        random_init=args.random_init, bf16=args.bf16
    )

    if (args.dm_update or args.dm_in_scan) and not args.deep_demosaicking:
        raise SystemExit(
            "error: --dm-update/--dm-in-scan adapt the DDnet demosaicker and "
            "require --deep-demosaicking (the reference's dm_update is only "
            "reachable with model_demosaic set, dvp…online.py:192-194)"
        )
    if args.auto_demosaic and args.deep_demosaicking:
        raise SystemExit(
            "error: --auto-demosaic picks Malvar vs DDnet itself; drop "
            "--deep-demosaicking (or keep it to force DDnet)"
        )

    warm = (
        load_warm_start(args.warm, scene.n_frames) if args.warm else None
    )

    if auto_ckpt:
        # ground-truth-free weight-variant choice by held-out measurement
        # cross-validation (pipelines.select_prior_variables)
        from adaptivepnp_sci_tpu.pipelines import select_prior_variables
        from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

        candidates = {
            "natural": variables,
            "smooth": jax.device_put(load_checkpoint_variables(
                str(repo_weights / "fastdvd_smooth.npz")
            )),
        }
        pick = select_prior_variables(scene, prior, candidates,
                                      warm_start=warm)
        print(f"auto-ckpt: {pick}")
        variables = candidates[pick]

    deep_dd = args.deep_demosaicking
    demosaic_fn = dd = dd_vars = None
    if args.deep_demosaicking or args.auto_demosaic:
        from adaptivepnp_sci_tpu.models.convert import load_ddnet
        from adaptivepnp_sci_tpu.models.ddnet import DDnet
        from adaptivepnp_sci_tpu.solvers.priors import ddnet_demosaic

        # bf16 U-Net chains, fp32 residuals/mixing: measured identical
        # PSNR/SSIM and 21% faster end-to-end (scripts/ab_ddnet_precision.py)
        dd = DDnet(dtype=jnp.bfloat16 if args.bf16 else None)
        dd_vars = load_weights(
            args.ddnet_ckpt, load_ddnet,
            lambda: dd.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 64, 64, 3))),
            defaults=(str(repo_weights / "ddnet.npz"),),
        )
        if args.auto_demosaic:
            # ground-truth-free Malvar-vs-DDnet choice by held-out
            # measurement cross-validation (pipelines.select_demosaicker)
            from adaptivepnp_sci_tpu.pipelines import select_demosaicker

            pick = select_demosaicker(scene, prior, variables, dd, dd_vars,
                                      warm_start=warm)
            print(f"auto-demosaic: {pick}")
            deep_dd = pick == "ddnet"
        if deep_dd and not args.dm_update:
            demosaic_fn = ddnet_demosaic(dd, dd_vars)
        if not deep_dd:
            dd = dd_vars = None

    config = None
    adapt_flags = (args.adapt_carried_opt or args.adapt_lr
                   or args.adapt_update_per_iter or args.trainable_filter
                   or args.adapt_crop)
    solver_flags = (args.select_best is not None or args.relax
                    or args.select_holdout is not None)
    if adapt_flags or solver_flags:
        # override the per-scene table's fields
        import dataclasses

        from adaptivepnp_sci_tpu.configs.scenes import admm_config_for

        config = admm_config_for(
            scene.name, args.denoiser, deep_dd,
            not args.no_update,
        )
        if adapt_flags and config.adapt is None:
            raise SystemExit(
                "error: adaptation overrides given but the selected config "
                "has no adaptation (did you pass --no-update?)"
            )
        over = {}
        if args.adapt_carried_opt:
            over["fresh_opt_per_trigger"] = False
        if args.adapt_lr:
            lrs = tuple(float(v) for v in args.adapt_lr.split(","))
            over["lr"] = lrs[0] if len(lrs) == 1 else lrs
        if args.adapt_update_per_iter:
            ns = tuple(int(v) for v in args.adapt_update_per_iter.split(","))
            over["update_per_iter"] = ns[0] if len(ns) == 1 else ns
        if args.trainable_filter:
            over["trainable_filter"] = tuple(args.trainable_filter.split(","))
        if args.adapt_crop:
            over["crop"] = args.adapt_crop
        if over:
            config = dataclasses.replace(
                config, adapt=dataclasses.replace(config.adapt, **over)
            )
        solver_over = {}
        if args.select_best is not None:
            solver_over["select_best"] = args.select_best
        if args.select_holdout is not None:
            solver_over["select_best_holdout"] = args.select_holdout
            if args.select_holdout > 0:
                solver_over["select_best"] = True
        if args.relax:
            rs = tuple(float(v) for v in args.relax.split(","))
            solver_over["denoiser_relax"] = rs[0] if len(rs) == 1 else rs
        if solver_over:
            config = dataclasses.replace(config, **solver_over)

    out = run_reconstruction(
        scene, prior, variables,
        denoiser=args.denoiser,
        deep_demosaicking=deep_dd,
        update=not args.no_update,
        reuse_model=not args.no_reuse_model,
        warm_start=warm,
        demosaic_fn=demosaic_fn,
        config=config,
        dm_model=dd, dm_variables=dd_vars,
        dm_update=args.dm_update, dm_lr=args.dm_lr,
        dm_update_per_iter=args.dm_update_per_iter,
        dm_in_scan=args.dm_in_scan,
        dm_fresh_opt=args.dm_fresh_opt,
        tile=args.tile,
        tile_overlap=args.tile_overlap,
        tile_chunk=args.tile_chunk,
    )
    if args.out:
        save_results(
            args.out, out.x_bayer, out.x_rgb, out.psnr, out.ssim,
            out.psnr_all_iter,
            orig_real=scene.orig_real,
            meas_bayer=np.transpose(scene.meas, (1, 2, 0)) * scene.maxb,
        )
    print(
        f"{args.name or args.data}: PSNR {out.psnr.mean():.2f} dB, "
        f"SSIM {out.ssim.mean():.4f}, "
        f"{np.mean(out.seconds_per_meas):.2f}s/measurement"
    )


def _cmd_train(args) -> None:
    import jax
    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.train import Trainer, TrainerConfig
    from adaptivepnp_sci_tpu.train.datasets import (
        batch_iterator,
        load_array_dir,
        synthetic_video_dataset,
        temporal_chunks,
    )
    from adaptivepnp_sci_tpu.train.tasks import ddnet_task, fastdvd_task, ffdnet_task

    length = 1 if args.network == "ffdnet" else 5
    if args.data:
        vids = load_array_dir(args.data)
        import numpy as _np

        clips = _np.concatenate([temporal_chunks(v, length) for v in vids])
    else:
        clips = synthetic_video_dataset(256, length=length, size=args.patch,
                                        seed=args.seed)
    if args.network == "ffdnet":
        clips = clips[:, 0]

    key = jax.random.PRNGKey(args.seed)
    if args.network == "ffdnet":
        from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color

        model = ffdnet_color()
        variables = model.init(key, jnp.zeros((1, 32, 32, 3)), jnp.float32(0.1))
        task = ffdnet_task(model)
    elif args.network == "fastdvd":
        from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet

        model = FastDVDnet()
        variables = model.init(key, jnp.zeros((1, 5, 32, 32, 3)), jnp.float32(0.1))
        task = fastdvd_task(model)
    else:
        from adaptivepnp_sci_tpu.models.ddnet import DDnet

        model = DDnet()
        variables = model.init(key, jnp.zeros((1, 5, 32, 32, 3)))
        task = ddnet_task(model)

    trainer = Trainer(
        task, variables,
        TrainerConfig(lr=args.lr, steps_per_epoch=max(len(clips) // args.batch, 1),
                      ckpt_dir=args.ckpt_dir, seed=args.seed),
    )
    if args.resume:
        trainer.restore(args.resume)
    trainer.fit(batch_iterator(clips, args.batch, seed=args.seed),
                max_steps=args.steps)
    trainer.save(f"{args.ckpt_dir}/final")
    print(f"trained {args.network} for {trainer.step} steps -> {args.ckpt_dir}/final")


def _cmd_denoise(args) -> None:
    """Standalone denoiser test (the reference's per-denoiser test scripts,
    ``packages/ffdnet/test_ffdnet_ipol.py:559-692`` /
    ``packages/fastdvdnet/test_fastdvdnet.py:51-147``): load clean data, add
    gaussian noise at --sigma, denoise, report PSNR."""
    import jax
    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.ops import metrics

    rng = np.random.default_rng(args.seed)
    if args.data:
        clean = np.load(args.data).astype(np.float32)
        if clean.max() > 2.0:
            clean = clean / 255.0
    else:
        from adaptivepnp_sci_tpu.train.datasets import synthetic_video_dataset

        clean = synthetic_video_dataset(1, length=8, size=args.size,
                                        seed=args.seed)[0]
    if args.gray:
        if args.network != "ffdnet":
            raise SystemExit("error: --gray is only supported with "
                             "--network ffdnet")
        # reference gray mode loads the GRAYSCALE image first and adds
        # sigma-level noise to it (test_ffdnet_ipol.py:582) — converting
        # after the noise add would leave sigma/sqrt(3) effective noise.
        # cv2 BGR2GRAY = BT.601 weighted luma, not a plain channel mean.
        if clean.ndim == 4 and clean.shape[-1] == 3:
            luma = np.array([0.299, 0.587, 0.114], np.float32)
            clean = (clean @ luma)[..., None]
    sigma = args.sigma / 255.0
    noisy = (clean + rng.normal(0, sigma, clean.shape)).astype(np.float32)
    if args.network != "ddnet":
        # the ffdnet/fastdvd test scripts work on clipped noisy input; the
        # DDnet joint eval feeds UNCLIPPED noise to the net
        # (joint_test_fastdvdnet.py:108: seqn = seq + noise)
        noisy = np.clip(noisy, 0, 1)

    if args.network == "ffdnet":
        from adaptivepnp_sci_tpu.models.convert import load_ffdnet
        from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color, ffdnet_gray

        # gray = the reference test scripts' grayscale mode (nc=64/nb=15)
        model = ffdnet_gray() if args.gray else ffdnet_color()
        variables = load_ffdnet(args.ckpt)
        out = model.apply(variables, jnp.asarray(noisy), jnp.float32(sigma))
    elif args.network == "ddnet":
        # joint demosaick+denoise eval (the reference's standalone
        # ``packages/DDnet/joint_test_fastdvdnet.py:108-140``): mosaic every
        # NOISY frame, reconstruct RGB from the mosaics over mirror-padded
        # 5-frame windows, min-max normalize (the script's normalization,
        # `:127`), PSNR vs the clean sequence.
        from adaptivepnp_sci_tpu.models.ddnet import DDnet
        from adaptivepnp_sci_tpu.ops import bayer
        from adaptivepnp_sci_tpu.solvers.priors import window_indices_mirror
        from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

        variables = load_checkpoint_variables(args.ckpt)
        mosaics = bayer.mosaic(jnp.asarray(noisy))            # (B, H, W)
        rgb_sparse = bayer.embed_rgb(mosaics)                 # (B, H, W, 3)
        # reflect-pad spatial dims to multiples of 4 for the two U-Net
        # downsamplings, crop after (same scheme as ddnet_demosaic_param)
        hh, ww = rgb_sparse.shape[1:3]
        hp, wp = (-hh) % 4, (-ww) % 4
        inp = rgb_sparse
        if hp or wp:
            inp = jnp.pad(inp, ((0, 0), (0, hp), (0, wp), (0, 0)),
                          mode="reflect")
        idx = window_indices_mirror(inp.shape[0])
        out = DDnet().apply(variables, inp[idx])[:, :hh, :ww]
        # guard the denominator: a degenerate/constant output (broken
        # checkpoint) must not turn the printed PSNR into NaN
        out = (out - out.min()) / jnp.maximum(out.max() - out.min(), 1e-12)
        # "noisy" input for the report = the sparse-RGB mosaic (as in the
        # reference script's psnr_noisy)
        noisy = np.asarray(rgb_sparse)
    else:
        from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
        from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior
        from adaptivepnp_sci_tpu.train.trainer import load_checkpoint_variables

        variables = load_checkpoint_variables(args.ckpt)
        out = fastdvd_prior(FastDVDnet()).apply(
            variables, jnp.asarray(noisy), jnp.float32(sigma)
        )
    out = jnp.clip(out, 0, 1)
    if args.network == "ddnet":
        # the reference joint eval reports batch_psnr — MEAN of per-frame
        # PSNRs (packages/fastdvdnet/utils.py batch_psnr, used at
        # joint_test_fastdvdnet.py:133-134) — not one global-MSE PSNR.
        # psnr_noisy is computed on the UNCLIPPED noisy input (:134).
        p_in = float(metrics.psnr_per_frame(
            jnp.asarray(clean), jnp.asarray(noisy)).mean())
        p_out = float(metrics.psnr_per_frame(jnp.asarray(clean), out).mean())
    else:
        p_in = float(metrics.psnr(jnp.asarray(clean), jnp.asarray(noisy)))
        p_out = float(metrics.psnr(jnp.asarray(clean), out))
    print(f"sigma {args.sigma}: noisy {p_in:.2f} dB -> denoised {p_out:.2f} dB")
    if args.out:
        np.save(args.out, np.asarray(out))


def _cmd_synth(args) -> None:
    from adaptivepnp_sci_tpu.data.mat_io import save_results  # noqa: F401
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    import scipy.io as sio

    style = args.style or ("textured" if args.textured else "smooth")
    s = make_scene(b=args.frames, h=args.size, w=args.size, seed=args.seed,
                   n_meas=args.n_meas, style=style,
                   photo_source=args.photo_source)
    meas = s.meas if s.meas.ndim == 3 else s.meas[..., None]
    orig = s.orig_bayer if s.orig_bayer.ndim == 4 else s.orig_bayer[None]
    t, b, h, w = orig.shape
    # store 0-255-scaled like real CACTI files (the loader divides by MAXB
    # unconditionally, matching two_stage_ADMM_Online_FFD_Warm.py:245-248)
    sio.savemat(
        args.out,
        {
            "meas_bayer": meas.reshape(h, w, -1) * 255.0,
            "mask_bayer": np.transpose(s.mask, (1, 2, 0)),
            "orig_bayer": np.transpose(orig.reshape(t * b, h, w), (1, 2, 0))
            * 255.0,
            "orig": np.transpose(
                s.orig_rgb.reshape(t * b, h, w, 3), (1, 2, 3, 0)
            ) * 255.0,
        },
    )
    print(f"synthetic scene -> {args.out}")


def _cmd_eval(args) -> None:
    """Metrics report for a saved results ``.mat``.

    The reference leaves metric inspection to reading ``log.txt`` or loading
    the saved arrays in MATLAB (``two_stage_ADMM_Online_FFD_Warm.py:316-330``);
    this prints the stored per-measurement PSNR/SSIM summary and — when
    ground truth is available (``--data scene.mat``, or the ``orig_real`` key
    the results writer stores) — recomputes PSNR/SSIM from the stored
    reconstruction to verify the stored numbers. Pure host/NumPy: safe to run
    while a TPU job owns the device."""
    import scipy.io as sio

    from adaptivepnp_sci_tpu.utils.image import calculate_psnr, calculate_ssim

    res = sio.loadmat(args.results)
    psnr = np.asarray(res["psnr"], np.float64)
    ssim = np.asarray(res["ssim"], np.float64)
    # the solver stores zeros when the scene carried no ground truth (the
    # serve path prints 'PSNR n/a' for the same reason) — don't present
    # zeros as measured dB
    stored_real = bool(np.any(psnr))
    print(f"{args.results}: {psnr.shape[0]} measurement(s), "
          f"{psnr.shape[1] if psnr.ndim > 1 else 1} frame(s) each")
    if stored_real:
        for t in range(psnr.shape[0]):
            print(f"  meas {t}: PSNR {np.mean(psnr[t]):6.2f} dB  "
                  f"SSIM {np.mean(ssim[t]):.4f}")
        print(f"  mean:   PSNR {psnr.mean():6.2f} dB  SSIM {ssim.mean():.4f}")
    else:
        print("  stored PSNR/SSIM are all zero (reconstructed without "
              "ground truth)")

    # ground truth: --data when it has one, else the results' orig_real key
    h, w, tb = np.asarray(res["v_recon_bayer"]).shape
    orig_bayer = None
    if args.data:
        from adaptivepnp_sci_tpu.data.mat_io import load_cacti_mat

        orig_bayer = load_cacti_mat(args.data, name="eval").orig_bayer
    if orig_bayer is None and "orig_real" in res:
        rgb = np.asarray(res["orig_real"], np.float32) / 255.0
        rgb = _orig_real_to_tbhwc(rgb, psnr.shape[0], h, w)
        if rgb is not None:
            from adaptivepnp_sci_tpu.ops.bayer import cfa_masks

            orig_bayer = (rgb * cfa_masks(rgb.shape[-3:-1])).sum(-1)
        else:
            print(f"  orig_real layout {res['orig_real'].shape} not "
                  "recognized; skipping recompute")
    if orig_bayer is None:
        print("no ground truth available (pass --data); stored summary only")
        return

    t_n, b_n = orig_bayer.shape[:2]
    if t_n * b_n != tb:
        print(f"  ground truth ({t_n}x{b_n} frames) does not match the "
              f"reconstruction ({tb} frames); skipping recompute")
        return
    flat = np.asarray(res["v_recon_bayer"], np.float32)  # (H, W, T*B)
    x = np.transpose(flat, (2, 0, 1)).reshape(t_n, b_n, h, w)
    re_p = np.array([
        [calculate_psnr(x[t, b] * 255.0, orig_bayer[t, b] * 255.0)
         for b in range(b_n)] for t in range(t_n)
    ])
    re_s = np.array([
        [calculate_ssim(x[t, b] * 255.0, orig_bayer[t, b] * 255.0)
         for b in range(b_n)] for t in range(t_n)
    ])
    print(f"  recomputed vs ground truth: PSNR {re_p.mean():6.2f} dB  "
          f"SSIM {re_s.mean():.4f}")
    dp = abs(re_p.mean() - psnr.mean())
    if stored_real and dp > 0.5:
        print(f"  WARNING: recomputed PSNR differs from stored by "
              f"{dp:.2f} dB (different ground truth?)")


def _orig_real_to_tbhwc(rgb: np.ndarray, t_n: int, h: int,
                        w: int) -> np.ndarray | None:
    """Normalize a stored ``orig_real`` RGB ground truth to (T, B, H, W, 3).

    The key is carried VERBATIM from the input scene like the reference
    driver does (``two_stage_ADMM_Online_FFD_Warm.py:169,329``), so its
    layout depends on provenance: (T,B,H,W,3) from the pipelines/synthetic
    path, (H,W,3,T*B) from scipy-authored v5 scenes, (T*B,3,W,H) from h5py
    v7.3 scenes (MATLAB-reversed). Returns None for unrecognized layouts.
    """
    if rgb.ndim == 5 and rgb.shape[-1] == 3:
        return rgb
    if rgb.ndim == 4 and rgb.shape[:2] == (h, w) and rgb.shape[2] == 3:
        out = np.transpose(rgb, (3, 0, 1, 2))          # (T*B, H, W, 3)
    elif rgb.ndim == 4 and rgb.shape[1] == 3 and rgb.shape[2:] == (w, h):
        out = np.transpose(rgb, (0, 3, 2, 1))          # (T*B, H, W, 3)
    else:
        return None
    if t_n <= 0 or out.shape[0] % t_n:
        return None
    return out.reshape(t_n, -1, *out.shape[1:])


def _cmd_serve(args) -> None:
    """Reconstruction service: watch a directory for measurement ``.mat``
    files, reconstruct each with the standing config, write results.

    The serving story the script-driven reference lacks: one long-lived
    process keeps the compiled solver program (and the XLA compile cache)
    warm, so every same-shape measurement after the first runs at
    steady-state speed — no per-file compile, no per-file model load.
    ``--carry-weights`` additionally threads online-adapted denoiser
    weights from one file to the next (the cross-file form of the
    reference's ``reuse_model``).
    """
    import os
    import time as _time

    from adaptivepnp_sci_tpu.data.mat_io import load_cacti_mat, save_results
    from adaptivepnp_sci_tpu.pipelines import run_reconstruction

    _, prior, variables = _build_denoiser(
        args.denoiser, args.ckpt, random_init=args.random_init, bf16=args.bf16
    )
    os.makedirs(args.out, exist_ok=True)
    seen: set[str] = set()
    sizes: dict[str, int] = {}
    print(f"serving: watching {args.watch} -> {args.out} "
          f"(denoiser={args.denoiser}, scene config={args.scene})", flush=True)
    while True:
        try:
            listing = set(
                f for f in os.listdir(args.watch) if f.endswith(".mat")
            )
        except FileNotFoundError:
            raise SystemExit(f"error: watch directory {args.watch} not found")
        # forget files that left the directory (a re-created name is a new
        # file); bounds seen/sizes in a long-lived service with rotating
        # producers
        seen &= listing
        for gone in [f for f in sizes if f not in listing]:
            del sizes[gone]
        names = sorted(listing - seen)
        ready = []
        for f in names:
            # only process files whose size is stable across two polls
            # (writers may still be streaming the file)
            try:
                sz = os.path.getsize(os.path.join(args.watch, f))
            except OSError:
                sizes.pop(f, None)  # vanished mid-poll; re-listed next round
                continue
            if sizes.get(f) == sz:
                ready.append(f)
            sizes[f] = sz
        for fname in ready:
            path = os.path.join(args.watch, fname)
            dst = os.path.join(args.out, fname)
            t0 = _time.perf_counter()
            try:
                scene = load_cacti_mat(path, name=args.scene)
                out = run_reconstruction(
                    scene, prior, variables,
                    denoiser=args.denoiser,
                    update=not args.no_update,
                    reuse_model=True,
                )
                save_results(dst, out.x_bayer, out.x_rgb, out.psnr, out.ssim,
                             out.psnr_all_iter)
            except Exception as e:  # noqa: BLE001 — a bad file or a failed
                # result write must not kill the service; report and move on
                print(f"serve: {fname} FAILED: {e}", flush=True)
                seen.add(fname)
                continue
            if args.carry_weights and out.variables is not None:
                variables = out.variables
            seen.add(fname)
            # PSNR is only real when the file carries ground truth (the
            # solver returns zeros without it — don't report those as dB)
            q = (f"PSNR {out.psnr.mean():.2f} dB"
                 if scene.orig_bayer is not None else "PSNR n/a (no orig)")
            print(
                f"serve: {fname} -> {dst}  {q}  "
                f"{_time.perf_counter() - t0:.2f}s", flush=True,
            )
        if args.once and not names:
            break
        if not ready:
            _time.sleep(args.poll)


def main(argv=None) -> None:
    # JAX_PLATFORMS may name a plugin backend that fails to register in this
    # process (e.g. remote-TPU plugins that are cwd-sensitive); fall back to
    # auto-selection instead of dying.
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")

    from adaptivepnp_sci_tpu.utils import enable_compile_cache

    enable_compile_cache()

    p = argparse.ArgumentParser(prog="adaptivepnp-sci-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("warmstart", help="GAP warm start (TV or deep prior)")
    w.add_argument("--data", required=True)
    w.add_argument("--out", required=True)
    w.add_argument("--name", default="scene")
    w.add_argument("--iters", type=int, default=40)
    w.add_argument("--denoiser", choices=["tv", "ffdnet"], default="tv",
                   help="'ffdnet' selects the one-stage GAP deep branch")
    w.add_argument("--ckpt", default=None,
                   help="denoiser checkpoint for --denoiser ffdnet")
    w.set_defaults(fn=_cmd_warmstart)

    r = sub.add_parser("reconstruct", help="two-stage online-adaptive ADMM")
    r.add_argument("--data", required=True)
    r.add_argument("--name", default="Beauty",
                   help="scene name for the schedule table")
    r.add_argument("--warm", default=None)
    r.add_argument("--out", default=None)
    r.add_argument("--denoiser", choices=["ffdnet", "fastdvd"], default="ffdnet")
    r.add_argument("--ckpt", default=None,
                   help="denoiser checkpoint (.pth or .npz); defaults to the "
                        "reference model_zoo / shipped weights/ checkpoint. "
                        "With --denoiser fastdvd, 'auto' picks per scene "
                        "between the natural-statistics and smooth-procedural "
                        "weight variants, ground-truth-free (held-out "
                        "measurement cross-validation, "
                        "pipelines.select_prior_variables)")
    r.add_argument("--ddnet-ckpt", default=None)
    r.add_argument("--random-init", action="store_true",
                   help="run with untrained weights (smoke tests only)")
    r.add_argument("--deep-demosaicking", action="store_true")
    r.add_argument("--auto-demosaic", action="store_true",
                   help="pick Malvar vs DDnet per scene, ground-truth-free: "
                        "held-out measurement cross-validation of both "
                        "fixed-weight schedules on the first measurement "
                        "(pipelines.select_demosaicker; validated on all "
                        "six stand-ins, RESULTS.md round 5)")
    r.add_argument("--dm-update", action="store_true",
                   help="adapt the DDnet demosaicker online (self-consistency)")
    r.add_argument("--dm-in-scan", action="store_true",
                   help="interleave dm adaptation inside solver iterations "
                        "(reference dm_update placement) instead of "
                        "once per measurement")
    r.add_argument("--dm-lr", type=float, default=1e-6)
    r.add_argument("--dm-update-per-iter", type=int, default=1)
    r.add_argument("--dm-fresh-opt", action="store_true",
                   help="fresh Adam per dm update step (the reference's "
                        "DDnet_test.py:278-281 optimizer semantics)")
    r.add_argument("--adapt-carried-opt", action="store_true",
                   help="carry ONE Adam state through the scan and across "
                        "measurements (this framework's extension; "
                        "measured vs fresh mode in AB_RESULTS.md). Default "
                        "is the reference's fresh-Adam-per-trigger/stage "
                        "semantics (test_ffdnet_ipol.py:250-251)")
    r.add_argument("--adapt-lr", default=None,
                   help="override adaptation lr; comma-separated for the "
                        "reference's per-stage lr lists "
                        "(test_fastdvdnet.py:344-349)")
    r.add_argument("--adapt-update-per-iter", default=None,
                   help="override adaptation steps per trigger; "
                        "comma-separated per-stage list")
    r.add_argument("--trainable-filter", default=None,
                   help="comma-separated parameter-path substrings to "
                        "fine-tune (e.g. 'temp2' for the reference's fix "
                        "mode, test_fastdvdnet.py:365-373); others frozen")
    r.add_argument("--adapt-crop", type=int, default=None,
                   help="adaptation loss on a Bayer-aligned random NxN crop "
                        "(unbiased estimator at (N/H)(N/W) of the fwd+bwd "
                        "cost; measured PSNR-neutral, AB_RESULTS.md)")
    r.add_argument("--select-best", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="measurement-consistency best-iterate guard: return "
                        "the iterate (warm start included) with the lowest "
                        "||A(x)-y||^2 instead of the last one. Default: the "
                        "scene table's per-row setting (GUARDED_ROWS)")
    r.add_argument("--select-holdout", type=float, default=None,
                   help="rank the best-iterate guard by held-out "
                        "cross-validation instead of the raw residual: this "
                        "pixel fraction is removed from the whole data term "
                        "and iterates are ranked by prediction error of the "
                        "true measurement there (implies --select-best when "
                        ">0; 0 = raw ranking). Default: the scene table's "
                        "per-row setting (GUARD_HOLDOUT on guarded rows)")
    r.add_argument("--relax", default=None,
                   help="relaxed denoiser step xhat=(1-r)x+rD(x); "
                        "comma-separated for a per-sigma-stage schedule "
                        "(extension; RESULTS.md row 3b)")
    r.add_argument("--no-update", action="store_true")
    r.add_argument("--no-reuse-model", action="store_true")
    r.add_argument("--bf16", action="store_true",
                   help="FastDVDnet/DDnet DenBlocks in bf16 with fp32 "
                        "residuals (1.5x / 1.27x faster, identical PSNR "
                        "measured)")
    r.add_argument("--tile", type=int, default=None,
                   help="large-scene mode: solve as a vmap batch of NxN "
                        "tiles (warm start cropped per tile, adaptation "
                        "grads shared); use for scenes beyond ~512²")
    r.add_argument("--tile-overlap", type=int, default=0,
                   help="halo-overlap in px (even) for --tile: each tile "
                        "solves with real context across its borders and "
                        "only the core is stitched — removes seam-band "
                        "artifacts (measured ~0.8 dB at 1024², RESULTS.md) "
                        "at ~1.5x tile cost")
    r.add_argument("--tile-chunk", type=int, default=None,
                   help="process tiles in sequential groups of this size "
                        "(must divide the tile count): bounds peak HBM; "
                        "adaptation becomes group-sequential with weight "
                        "carry — the single-chip 2048² adaptive mode "
                        "(RESULTS.md round 5)")
    r.set_defaults(fn=_cmd_reconstruct)

    d = sub.add_parser("denoise", help="standalone denoiser test")
    d.add_argument("--network", choices=["ffdnet", "fastdvd", "ddnet"],
                   default="ffdnet",
                   help="ddnet = joint demosaick+denoise eval: mosaic the "
                        "noisy frames first (packages/DDnet/"
                        "joint_test_fastdvdnet.py semantics)")
    d.add_argument("--ckpt", required=True)
    d.add_argument("--gray", action="store_true",
                   help="ffdnet only: grayscale mode (luminance average, "
                        "nc=64/nb=15 network, model_zoo/ffdnet_gray.pth)")
    d.add_argument("--data", default=None, help=".npy clean frames; default synthetic")
    d.add_argument("--sigma", type=float, default=25.0)
    d.add_argument("--size", type=int, default=128)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--out", default=None)
    d.set_defaults(fn=_cmd_denoise)

    t = sub.add_parser("train", help="offline denoiser training")
    t.add_argument("--network", choices=["ffdnet", "fastdvd", "ddnet"],
                   required=True)
    t.add_argument("--data", default=None,
                   help="dir of .npy/.npz clips; default: synthetic clips")
    t.add_argument("--steps", type=int, default=2000)
    t.add_argument("--batch", type=int, default=16)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--patch", type=int, default=96)
    t.add_argument("--ckpt-dir", required=True)
    t.add_argument("--resume", default=None)
    t.add_argument("--seed", type=int, default=42)
    t.set_defaults(fn=_cmd_train)

    s = sub.add_parser("synth", help="generate a synthetic CACTI scene")
    s.add_argument("--out", required=True)
    s.add_argument("--textured", action="store_true",
                   help="overlay drifting gratings/rectangles (harder scene)")
    s.add_argument("--style",
                   choices=["smooth", "textured", "leaves", "photo", "photos"],
                   default=None,
                   help="scene statistics; 'leaves' = dead-leaves occlusion "
                        "model (natural-image statistics with motion), "
                        "'photo' = real photograph under global camera pan, "
                        "'photos' = any bundled real photograph under a "
                        "pan+zoom+roll similarity camera path")
    s.add_argument("--photo-source", choices=["hopper", "street"], default=None,
                   help="which real photograph style='photo' pans over")
    s.add_argument("--size", type=int, default=512)
    s.add_argument("--frames", type=int, default=8)
    s.add_argument("--n-meas", type=int, default=1)
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=_cmd_synth)

    e = sub.add_parser(
        "eval",
        help="metrics report for a saved results .mat (stored summary + "
             "recomputed PSNR/SSIM when ground truth is available)",
    )
    e.add_argument("results", help="results .mat written by reconstruct")
    e.add_argument("--data", default=None,
                   help="scene .mat with orig_bayer ground truth (optional; "
                        "falls back to the results' orig_real key)")
    e.set_defaults(fn=_cmd_eval)

    v = sub.add_parser(
        "serve",
        help="reconstruction service: watch a directory for .mat "
             "measurements, reconstruct, write results (compiled programs "
             "stay warm across files)",
    )
    v.add_argument("--watch", required=True, help="directory to poll for .mat files")
    v.add_argument("--out", required=True, help="directory for result .mat files")
    v.add_argument("--denoiser", choices=["ffdnet", "fastdvd"], default="ffdnet")
    v.add_argument("--ckpt", default=None)
    v.add_argument("--random-init", action="store_true")
    v.add_argument("--bf16", action="store_true")
    v.add_argument("--scene", default="Beauty",
                   help="per-scene schedule table to serve with "
                        "(configs/scenes.py; default Beauty = flagship)")
    v.add_argument("--no-update", action="store_true",
                   help="disable online adaptation")
    v.add_argument("--carry-weights", action="store_true",
                   help="thread adapted denoiser weights across files "
                        "(cross-file reuse_model)")
    v.add_argument("--poll", type=float, default=2.0,
                   help="poll interval in seconds")
    v.add_argument("--once", action="store_true",
                   help="process the current backlog and exit")
    v.set_defaults(fn=_cmd_serve)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
