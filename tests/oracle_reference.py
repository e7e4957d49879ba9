"""Independent NumPy+torch oracle of the reference's full two-stage ADMM loop.

Reproduces ``twoStageAdmm_denoise_bayer``
(``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:40-324``)
iterate-for-iterate for the fixed-weight ``ffdnet_color`` + Malvar path:
x-update (:128-140), Bayer scatter (:170-172), Malvar demosaic (:186-191),
FFDNet denoise (``packages/ffdnet/test_ffdnet_ipol.py:344-358``), RGGB
theta-update (:206-209), clip (:265) and dual updates (:267,271).

Built only from published equations + the reference's *behavior* (no code
copied); physics in float64-free NumPy, the denoiser through the raw torch
functional oracle in ``tests/test_ffdnet.py``.

Faithfulness note (aliasing artifact): the reference binds ``xall``,
``theta_all`` and ``x0all`` to the SAME tensor (``dvp…online.py:87-89``), and
the theta-update writes through that alias (:206-209) before ``torch.clip``
rebinds ``theta_all`` (:265). Consequence: in the FIRST iteration only, the
dual update ``ball += xall - theta_all`` (:267) sees ``xall`` already
overwritten with the *pre-clip* theta, so ``b_1 = clip_residual ~ 0`` instead
of ``x_1 - theta_1``. ``emulate_aliasing`` reproduces this exactly.
"""

from __future__ import annotations

import numpy as np

OFFS = [(0, 0), (0, 1), (1, 0), (1, 1)]  # RGGB


def pack4(full):
    """(H, W[, ...]) full-res Bayer -> (H/2, W/2[, ...], 4) planes."""
    return np.stack([full[a::2, b::2] for a, b in OFFS], -1)


def scatter4(planes, h, w):
    """(H/2, W/2, B, 4) -> (H, W, B) full-res mosaic."""
    out = np.zeros((h, w) + planes.shape[2:-1], planes.dtype)
    for ib, (a, b) in enumerate(OFFS):
        out[a::2, b::2] = planes[..., ib]
    return out


def rggb_subsample(rgb_hw3b):
    """(H, W, 3, B) RGB -> (H/2, W/2, B, 4) packed planes (dvp:206-209)."""
    return np.stack(
        [
            rgb_hw3b[0::2, 0::2, 0],
            rgb_hw3b[0::2, 1::2, 1],
            rgb_hw3b[1::2, 0::2, 1],
            rgb_hw3b[1::2, 1::2, 2],
        ],
        -1,
    )


def oracle_two_stage_ffdnet(
    y,
    phi,
    state_dict,
    sigmas,
    iters,
    x0_bayer=None,
    emulate_aliasing=True,
    record=False,
):
    """Run the reference two-stage ADMM (ffdnet_color, malvar2004, fixed
    weights, rho=1 alpha=1 tau=100) and return the final full-res Bayer cube
    ``(H, W, B)`` plus optional per-iteration snapshots.

    Args:
      y:    (H, W) snapshot.
      phi:  (B, H, W) masks.
      state_dict: the KAIR FFDNet checkpoint (numpy-convertible tensors).
      sigmas/iters: continuation schedule lists.
      x0_bayer: optional (B, H, W) warm start.
      emulate_aliasing: reproduce the reference's iteration-1 dual artifact.
      record: also return per-iteration (theta, b, x) snapshots.
    """
    from tests.test_demosaic import numpy_malvar
    from tests.test_ffdnet import torch_ffdnet_forward

    h, w = y.shape
    nb = phi.shape[0]
    phi_hwb = np.transpose(np.asarray(phi, np.float32), (1, 2, 0))
    yall = pack4(np.asarray(y, np.float32))         # (H2, W2, 4)
    phiall = pack4(phi_hwb)                          # (H2, W2, B, 4)
    phisum = phiall.sum(2)
    phisum[phisum == 0] = 1.0

    if x0_bayer is None:
        x0 = phiall * yall[:, :, None, :]            # At_(y, Phi)
    else:
        x0 = pack4(np.transpose(np.asarray(x0_bayer, np.float32), (1, 2, 0)))

    rho, alpha, tau = 1.0, 1.0, 100.0
    theta = x0.copy()
    ball = np.zeros_like(x0)
    w_dual = np.zeros((h, w, 3, nb), np.float32)
    snaps = []
    k = 0

    for nsig, ni in zip(sigmas, iters):
        for _ in range(ni):
            # stage-1 x-update, all 4 channels (dvp:128-140)
            p = theta - ball / rho
            yb = (p * phiall).sum(2)
            tc = (yall - yb) / (alpha * rho + phisum)
            x = p + phiall * tc[:, :, None, :]

            xb = x + ball / rho
            x_bayer = scatter4(xb, h, w)             # (H, W, B)

            x_rgb = np.stack(
                [numpy_malvar(x_bayer[:, :, m]) for m in range(nb)], -1
            ).astype(np.float32)                     # (H, W, 3, B)

            x_rgb_w = x_rgb - w_dual / tau

            # per-frame FFDNet (test_ffdnet_ipol.py:344-358)
            frames = np.transpose(x_rgb_w, (3, 2, 0, 1)).astype(np.float32)
            den = np.stack(
                [
                    torch_ffdnet_forward(
                        state_dict, frames[m : m + 1], np.float32(nsig)
                    )[0]
                    for m in range(nb)
                ],
                0,
            )                                        # (B, 3, H, W)
            xbgr3 = np.transpose(den, (2, 3, 1, 0))  # (H, W, 3, B)

            theta_pre = rggb_subsample(xbgr3)
            theta_new = np.clip(theta_pre, 0.0, 1.0)
            if emulate_aliasing and k == 0:
                # dvp:206-209 wrote theta through the x-alias before clip
                x_for_dual = theta_pre
            else:
                x_for_dual = x
            ball = ball + (x_for_dual - theta_new)
            w_dual = w_dual + (x_rgb - xbgr3)
            theta = theta_new
            k += 1
            if record:
                snaps.append(
                    {"theta": theta.copy(), "b": ball.copy(), "x": x.copy(),
                     "xbgr3": xbgr3.copy()}
                )

    x_bayer_out = scatter4(theta, h, w)
    rgb_out = np.transpose(xbgr3, (3, 0, 1, 2))      # (B, H, W, 3)
    if record:
        return x_bayer_out, rgb_out, snaps
    return x_bayer_out, rgb_out


def oracle_gap_ffdnet(y, phi, state_dict, sigmas, iters, x0_bayer=None):
    """One-stage GAP + FFDNet warm-start loop (clean duals): semantics of
    ``admm_denoise_bayer_demosaic_pre(denoiser='ffdnet_color')``
    (``dvp…online.py:389-391,439-472,505-507``). Returns final ``(H, W, B)``
    Bayer cube (taken from x, matching the reference's :544-546)."""
    from tests.test_demosaic import numpy_malvar
    from tests.test_ffdnet import torch_ffdnet_forward

    h, w = y.shape
    nb = phi.shape[0]
    phi_hwb = np.transpose(np.asarray(phi, np.float32), (1, 2, 0))
    yall = pack4(np.asarray(y, np.float32))
    phiall = pack4(phi_hwb)
    phisum = phiall.sum(2)
    phisum[phisum == 0] = 1.0

    if x0_bayer is None:
        x0 = phiall * yall[:, :, None, :]
    else:
        x0 = pack4(np.transpose(np.asarray(x0_bayer, np.float32), (1, 2, 0)))

    lam, gamma = 1.0, 0.01
    theta = x0.copy()
    ball = np.zeros_like(x0)
    for nsig, ni in zip(sigmas, iters):
        for _ in range(ni):
            p = theta + ball
            yb = (p * phiall).sum(2)
            x = p + lam * phiall * ((yall - yb) / (phisum + gamma))[:, :, None, :]

            x_bayer = scatter4(x - ball, h, w)
            x_rgb = np.stack(
                [numpy_malvar(x_bayer[:, :, m]) for m in range(nb)], -1
            ).astype(np.float32)
            frames = np.transpose(x_rgb, (3, 2, 0, 1)).astype(np.float32)
            den = np.stack(
                [
                    torch_ffdnet_forward(
                        state_dict, frames[m : m + 1], np.float32(nsig)
                    )[0]
                    for m in range(nb)
                ],
                0,
            )
            xbgr3 = np.transpose(den, (2, 3, 1, 0))
            theta = np.clip(rggb_subsample(xbgr3), 0.0, 1.0)
            ball = ball - (x - theta)
    return scatter4(x, h, w)


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / mse)
