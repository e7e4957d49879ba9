"""Six-scene reproduction run: the reference's full experiment, end to end.

The reference's workflow is ``python ADMM_TV_Warm_Start_save.py`` followed by
``python two_stage_ADMM_Online_FFD_Warm.py`` (and/or the FastDVD driver,
each with ``deep_demosaicking`` on or off) — six mid-scale 512x512x8 color
Bayer scenes (Beauty, Bosphorus, Jockey, Runner, ShakeNDry, Traffic), each
with its own hand-tuned sigma-schedule / iteration / adaptation table
(``two_stage_ADMM_Online_FFD_Warm.py:62-151``,
``two_stage_ADMM_Online_FastDVD_Warm.py:61-166``). The real ``.mat``
captures are not shipped in this environment, so each scene gets a
deterministic synthetic stand-in with distinct statistics (smooth /
textured / dead-leaves / real-photo-pan), and the driver then runs the
EXACT reference pipeline per scene through the library surface the CLI
uses:

  GAP-TV warm start (40 iters, ``WARM_START_ITERS``)
    -> warm-start ``.mat`` contract (written + reloaded, like the two
       reference scripts hand off through ``results/savedmat/``)
    -> two-stage online-adaptive ADMM with the scene's VERBATIM config row
       (``configs/scenes.py``; resolved by (scene, denoiser,
       deep_demosaicking))
    -> results ``.mat`` with the reference's keys + SCENES.md summary table.

Two measurements per scene exercise the refined-weight carry-over
(``reuse_model``, FFD driver :270-275).

Modes (= the reference's driver/toggle combinations):
  ffd         two_stage_ADMM_Online_FFD_Warm.py (FFDNet + Malvar)
  fastdvd     two_stage_ADMM_Online_FastDVD_Warm.py (bf16 DenBlocks)
  ffd-dd      FFD driver with deep_demosaicking=True (DDnet)
  fastdvd-dd  FastDVD driver with deep_demosaicking=True

Usage: python scripts/run_all_scenes.py [out_dir] [mode|all]
       (defaults: results/scenes, ffd)
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

import numpy as np

# scene -> (style, seed): distinct deterministic statistics per stand-in.
# Styles chosen to roughly echo each capture's character (Beauty is a face
# close-up -> the real-portrait photo pan; Bosphorus/Traffic carry hard edges
# and repeated texture; Jockey/ShakeNDry are chaotic natural content; Runner
# is camera motion over real-world detail). Beauty was the smooth synthetic
# scene through round 4, but its GAP-TV warm start exceeded 60 dB — above any
# denoiser prior's ceiling — so all four Beauty rows pinned at the warm start
# and measured nothing; the portrait stand-in puts every row in a regime the
# two-stage solver can actually improve.
SCENE_STANDINS: dict[str, tuple[str, int]] = {
    "Beauty": ("photo", 101),
    "Bosphorus": ("textured", 202),
    "Jockey": ("leaves", 303),
    "Runner": ("photo", 404),
    "ShakeNDry": ("leaves", 505),
    "Traffic": ("textured", 606),
}

#: mode -> (denoiser, deep_demosaicking)
MODES: dict[str, tuple[str, bool]] = {
    "ffd": ("ffdnet", False),
    "fastdvd": ("fastdvd", False),
    "ffd-dd": ("ffdnet", True),
    "fastdvd-dd": ("fastdvd", True),
}


def _make_scene_data(name: str, b: int, h: int, w: int, n_meas: int):
    from adaptivepnp_sci_tpu.data.mat_io import SceneData
    from adaptivepnp_sci_tpu.data.synthetic import make_scene

    style, seed = SCENE_STANDINS[name]
    syn = make_scene(b=b, h=h, w=w, seed=seed, n_meas=n_meas, style=style)
    # make_scene drops the T axis when n_meas == 1
    meas = syn.meas[..., None] if syn.meas.ndim == 2 else syn.meas
    orig_b = syn.orig_bayer[None] if syn.orig_bayer.ndim == 3 \
        else syn.orig_bayer
    orig_rgb = syn.orig_rgb[None] if syn.orig_rgb.ndim == 4 else syn.orig_rgb
    return style, SceneData(
        name=name,
        meas=np.transpose(meas, (2, 0, 1)).astype(np.float32),
        mask=syn.mask,
        orig_bayer=orig_b.astype(np.float32),
        orig_real=(orig_rgb * 255.0).astype(np.float32),
    )


def main(out_dir: str = "results/scenes", mode: str = "ffd", b: int = 8,
         h: int = 512, w: int = 512, n_meas: int = 2,
         scenes: list[str] | None = None,
         random_init: bool = False) -> list[tuple]:
    """Run the six-scene experiment for one mode (or ``mode='all'``); small
    shapes + ``random_init`` allow a CPU smoke test (tests/test_pipelines)."""
    from adaptivepnp_sci_tpu.cli import _build_denoiser
    from adaptivepnp_sci_tpu.configs.scenes import admm_config_for
    from adaptivepnp_sci_tpu.data.mat_io import (
        load_warm_start,
        save_results,
        save_warm_start,
    )
    from adaptivepnp_sci_tpu.pipelines import run_reconstruction, run_warm_start

    os.makedirs(out_dir, exist_ok=True)
    modes = list(MODES) if mode == "all" else [mode]

    priors: dict[str, tuple] = {}   # denoiser -> (prior, variables)
    for m in modes:
        d = MODES[m][0]
        if d not in priors:
            _, prior, variables = _build_denoiser(
                d, None, random_init=random_init, bf16=(d == "fastdvd")
            )
            priors[d] = (prior, jax.device_put(variables))

    dd = dd_vars = None
    if any(MODES[m][1] for m in modes):
        from adaptivepnp_sci_tpu.cli import _load_weights
        from adaptivepnp_sci_tpu.models.convert import load_ddnet
        from adaptivepnp_sci_tpu.models.ddnet import DDnet

        import jax.numpy as jnp
        import pathlib

        # bf16 U-Nets: identical PSNR/SSIM, 21% faster (ab_ddnet_precision.py)
        dd = DDnet(dtype=jnp.bfloat16)
        dd_vars = _load_weights(
            None, load_ddnet,
            lambda: dd.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 5, 64, 64, 3))),
            defaults=(str(pathlib.Path(__file__).resolve().parent.parent /
                          "weights" / "ddnet.npz"),),
            random_init=random_init,
        )

    rows = []
    for name in SCENE_STANDINS:
        if scenes is not None and name not in scenes:
            continue
        style, scene = _make_scene_data(name, b, h, w, n_meas)

        warm = run_warm_start(scene)
        # steady-state: the first measurement pays XLA program load (cache
        # deserialization ~10 s/process); min over measurements is the
        # per-measurement cost a multi-measurement run actually sees
        warm_s = min(warm.seconds_per_meas)
        warm_path = os.path.join(out_dir, f"_Admm_tv_{name}8.mat")
        save_warm_start(warm_path, warm.x_bayer)
        # reload through the .mat contract, exactly like the FFD driver
        # (two_stage_ADMM_Online_FFD_Warm.py:171-176) consumes stage 1
        x0 = load_warm_start(warm_path, scene.n_frames)

        for m in modes:
            denoiser, deep_dd = MODES[m]
            prior, variables = priors[denoiser]
            demosaic_fn = None
            if deep_dd:
                from adaptivepnp_sci_tpu.solvers.priors import ddnet_demosaic

                demosaic_fn = ddnet_demosaic(dd, dd_vars)
            # resolve the scene's table row once and pass it through, so the
            # SCENES.md schedule columns and the run share one config object
            cfg = admm_config_for(name, denoiser, deep_dd, True)
            out = run_reconstruction(
                scene, prior, variables, denoiser=denoiser,
                deep_demosaicking=deep_dd, warm_start=x0, config=cfg,
                demosaic_fn=demosaic_fn,
            )
            save_results(
                os.path.join(out_dir, f"{name}8_online_{m}.mat"),
                out.x_bayer, out.x_rgb, out.psnr, out.ssim,
                out.psnr_all_iter,
                orig_real=scene.orig_real,
                meas_bayer=np.transpose(scene.meas, (1, 2, 0)) * scene.maxb,
            )
            rows.append(
                (name, m, style,
                 "/".join(f"{int(round(s * 255))}" for s in cfg.sigma),
                 "/".join(str(i) for i in cfg.iters),
                 float(warm.psnr.mean()), float(out.psnr.mean()),
                 float(out.ssim.mean()), warm_s,
                 min(out.seconds_per_meas))
            )
            print(f"{name:10s} [{m:10s}|{style:8s}] "
                  f"warm {rows[-1][5]:.2f} dB -> final {rows[-1][6]:.2f} dB "
                  f"/ {rows[-1][7]:.4f} SSIM, {rows[-1][9]:.2f}s/meas",
                  flush=True)

    lines = [
        "# SCENES — six-scene reproduction run (synthetic stand-ins)",
        "",
        "The reference's full two-script experiment (`ADMM_TV_Warm_Start_save.py`",
        "-> `two_stage_ADMM_Online_{FFD,FastDVD}_Warm.py`, with and without",
        "`deep_demosaicking`) run end-to-end per scene with each scene's",
        "VERBATIM schedule table (`configs/scenes.py`), on deterministic",
        "synthetic stand-ins (real captures unavailable here). Two measurements",
        "per scene; refined weights carry across measurements (`reuse_model`).",
        "Produced by `scripts/run_all_scenes.py results/scenes all`; warm-start",
        "and result `.mat` files land in `results/scenes/` with the reference's",
        "keys. Timing columns are steady-state (first measurement additionally",
        "pays one-time XLA program load).",
        "",
        "Reading the numbers: FFDNet uses the reference's real checkpoint and",
        "delivers the expected two-stage gain on every stand-in. FastDVDnet",
        "runs weights DISTILLED from the real-weight FFDNet on harvested ADMM",
        "iterates (upstream checkpoint missing, ROADMAP.md 'Quality bounds';",
        "RESULTS.md round-5 distillation section); DDnet weights are",
        "regenerated on procedural clips. FastDVD rows run the held-out-CV",
        "best-iterate guard (`configs/scenes.GUARDED_ROWS` ->",
        "`ADMMConfig.select_best` + `select_best_holdout`, ground-truth-",
        "free): a 5% pixel subset is held out of the whole data term and",
        "the returned iterate best predicts the true measurement there,",
        "the warm start included as a fairly-ranked candidate 0 — so no",
        "row can finish below its warm start, and the guard returns the",
        "trajectory's PEAK rather than its endpoint (A/B matrix:",
        "AB_RESULTS.md round 5, `scripts/ab_cv_guard.py`).",
        "",
        "| scene | mode | stand-in | sigma/255 | iters | warm dB | final dB |"
        " SSIM | warm s/meas | recon s/meas (steady) |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} | {r[5]:.2f} "
            f"| {r[6]:.2f} | {r[7]:.4f} | {r[8]:.3f} | {r[9]:.3f} |"
        )
    lines.append("")
    if scenes is None and (h, w) == (512, 512) and mode == "all":
        with open("SCENES.md", "w") as f:
            f.write("\n".join(lines))
        print("wrote SCENES.md")
    return rows


if __name__ == "__main__":
    main(*sys.argv[1:3])  # CLI form takes [out_dir] [mode|all] only
