"""Generate the 512x512x8 north-star parity golden (VERDICT r3 item 2).

Runs the independent NumPy+torch oracle of the reference solver
(`tests/oracle_reference.py`, semantics of `/root/reference/
dvp_linear_inv_2_stage_ADMM_tensor_online.py:40-324`) ONCE at the benchmark
shape — 512x512, B=8, textured stand-in, GAP-TV warm start, the full
verbatim Beauty schedule sigma=(25,12,6)/255 iters=(15,6,4) — in both the
fixed-weight and online-adaptive (lr=2e-6, 2 Adam steps, interval 15)
configurations, with the real `model_zoo/ffdnet_color.pth`.

The shared warm start and the oracle outputs are stored float16 (the warm
start is quantized BEFORE either side consumes it, so the stored file
regenerates both runs bit-identically); final PSNRs are stored from the
full-precision oracle outputs. `tests/test_reference_parity.py::
test_fullscale_512_parity_golden` replays our solver against this file.

Single-core CPU torch: takes ~1-2 h. Run once, commit the .npz.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

H = W = 512
B = 8
SEED = 9
STYLE = "textured"
SIGMAS = [25 / 255, 12 / 255, 6 / 255]
ITERS = [15, 6, 4]
LR, UPI, INIT_IT, INTERVAL = 2e-6, 2, 1, 15  # Beauty ffd row (scenes.py:45)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "fullscale_512_parity.npz")


def main() -> None:
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models import convert
    from adaptivepnp_sci_tpu.solvers.gap_tv import GapTVConfig, gap_tv
    from tests.oracle_reference import (
        oracle_two_stage_ffdnet,
        oracle_two_stage_ffdnet_adaptive,
        psnr,
    )

    sd = convert.load_torch_state_dict(
        "/root/reference/model_zoo/ffdnet_color.pth")
    sc = make_scene(b=B, h=H, w=W, seed=SEED, style=STYLE)

    t0 = time.time()
    ws = gap_tv(jnp.asarray(sc.meas), jnp.asarray(sc.mask),
                GapTVConfig(iters=40))
    # quantize the shared warm start so the committed fp16 file regenerates
    # the oracle inputs exactly
    x0 = np.asarray(ws.x_bayer).astype(np.float16).astype(np.float32)
    orig = np.transpose(sc.orig_bayer, (1, 2, 0))
    print(f"warm start: {psnr(orig, np.transpose(x0, (1, 2, 0))):.3f} dB "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    xb_fixed, _ = oracle_two_stage_ffdnet(
        sc.meas, sc.mask, sd, SIGMAS, ITERS, x0_bayer=x0,
        emulate_aliasing=True,
    )
    p_fixed = psnr(orig, xb_fixed)
    print(f"oracle fixed: {p_fixed:.4f} dB ({time.time() - t0:.0f}s)",
          flush=True)

    t0 = time.time()
    xb_adapt, _ = oracle_two_stage_ffdnet_adaptive(
        sc.meas, sc.mask, sd, SIGMAS, ITERS, lr=LR, update_per_iter=UPI,
        initial_iter=INIT_IT, interval_iter=INTERVAL, x0_bayer=x0,
        emulate_aliasing=True,
    )
    p_adapt = psnr(orig, xb_adapt)
    print(f"oracle adaptive: {p_adapt:.4f} dB ({time.time() - t0:.0f}s)",
          flush=True)

    np.savez_compressed(
        OUT,
        x0=x0.astype(np.float16),
        ref_fixed=xb_fixed.astype(np.float16),      # (H, W, B)
        ref_adaptive=xb_adapt.astype(np.float16),   # (H, W, B)
        psnr_fixed=np.float64(p_fixed),
        psnr_adaptive=np.float64(p_adapt),
        meta=np.array([H, W, B, SEED]),
        meas_checksum=np.float64(np.asarray(sc.meas, np.float64).sum()),
    )
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
