"""Sweep `denoiser_relax` (+ select_best) on the FastDVDnet scene rows.

Round-3 SCENES.md showed the FastDVD configs *degrading* hard scenes below
their own GAP-TV warm start (Bosphorus 26.90 -> 20.35 dB, Traffic 22.74 ->
16.32 dB, ...) — the regenerated (non-DAVIS) weights hallucinate on
textured/photo content and the plain PnP step amplifies it over 15-36
iterations. This sweep measures the two in-repo counter-levers on every
failing row at full 512x512x8 scale:

  * `denoiser_relax` r: averaged-operator step xhat = (1-r)x + r D(x)
    (RESULTS.md row 3b measured +0.36 dB at r=0.5 on the benchmark scene);
  * `select_best`: measurement-consistency best-iterate fallback.

Usage: python scripts/sweep_fastdvd_relax.py [scene ...]
Writes a markdown table to stdout; feed the winner into configs/scenes.py.
"""

from __future__ import annotations

import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from run_all_scenes import SCENE_STANDINS, _make_scene_data

RELAXES = (1.0, 0.5, 0.3, 0.15)


def main(scenes: list[str]) -> None:
    from adaptivepnp_sci_tpu.cli import _build_denoiser
    from adaptivepnp_sci_tpu.configs.scenes import admm_config_for
    from adaptivepnp_sci_tpu.pipelines import run_reconstruction, run_warm_start

    _, prior, variables = _build_denoiser("fastdvd", None, bf16=True)
    variables = jax.device_put(variables)

    print("| scene | stand-in | warm dB | " +
          " | ".join(f"r={r}" for r in RELAXES) +
          " | best r + select_best |")
    print("|---" * (len(RELAXES) + 4) + "|")
    for name in scenes:
        style, scene = _make_scene_data(name, 8, 512, 512, 1)
        warm = run_warm_start(scene)
        row = [f"| {name} | {style} | {warm.psnr.mean():.2f} "]
        results = {}
        for r in RELAXES:
            # select_best=False: the relax arms must measure the UNGUARDED
            # baseline (admm_config_for injects the guard for FastDVD rows
            # via GUARDED_ROWS since round 4)
            cfg = replace(admm_config_for(name, "fastdvd", False, True),
                          denoiser_relax=r, select_best=False)
            out = run_reconstruction(
                scene, prior, variables, denoiser="fastdvd",
                warm_start=warm.x_bayer, config=cfg,
            )
            results[r] = float(out.psnr.mean())
            row.append(f"| {results[r]:.2f} ")
            print(f"  {name} r={r}: {results[r]:.2f} dB", flush=True)
        best_r = max(results, key=results.get)
        cfg = replace(admm_config_for(name, "fastdvd", False, True),
                      denoiser_relax=best_r, select_best=True)
        out = run_reconstruction(
            scene, prior, variables, denoiser="fastdvd",
            warm_start=warm.x_bayer, config=cfg,
        )
        row.append(f"| r={best_r}+sb: {float(out.psnr.mean()):.2f} |")
        print("".join(row), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(SCENE_STANDINS))
