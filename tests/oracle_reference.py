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


class TorchFFDNetTrainable:
    """Differentiable torch twin of the KAIR FFDNet checkpoint for the
    adaptive oracle: weights live as ``torch.nn.Parameter`` so a real
    ``torch.optim.Adam`` can step them — the reference's update branch
    (``packages/ffdnet/test_ffdnet_ipol.py:248-301``) constructs a FRESH Adam
    per trigger and runs ``update_per_iter`` steps on
    ``MSE(sum(xall*Phiall, dim=2), yall)``."""

    def __init__(self, state_dict):
        import torch

        self.torch = torch
        self.params = {
            k: torch.nn.Parameter(
                torch.from_numpy(np.asarray(v, np.float32).copy())
            )
            for k, v in state_dict.items()
        }
        self.conv_ids = sorted({int(k.split(".")[1]) for k in state_dict})

    def denoise(self, x_nchw, sigma):
        """Differentiable forward: replication pad -> pixel_unshuffle ->
        sigma-map concat -> conv/relu chain -> pixel_shuffle (the KAIR
        architecture, ``models/network_ffdnet.py:27-69``)."""
        torch, F = self.torch, self.torch.nn.functional
        x = x_nchw
        n, c, h, w = x.shape
        x = F.pad(x, (0, w % 2, 0, h % 2), mode="replicate")
        x = F.pixel_unshuffle(x, 2)
        m = torch.full((n, 1, x.shape[2], x.shape[3]), float(sigma),
                       dtype=x.dtype)
        x = torch.cat([x, m], dim=1)
        for i, sid in enumerate(self.conv_ids):
            x = F.conv2d(x, self.params[f"model.{sid}.weight"],
                         self.params[f"model.{sid}.bias"], padding=1)
            if i < len(self.conv_ids) - 1:
                x = torch.relu(x)
        x = F.pixel_shuffle(x, 2)
        return x[..., :h, :w]

    def denoise_cube(self, x_rgb_hw3b, sigma, grad=False):
        """(H, W, 3, B) numpy or tensor -> (H, W, 3, B) per-frame denoise
        (reference loops frames, :263-272; batching is equivalent)."""
        torch = self.torch
        if not torch.is_tensor(x_rgb_hw3b):
            x_rgb_hw3b = torch.from_numpy(np.asarray(x_rgb_hw3b, np.float32))
        x = x_rgb_hw3b.permute(3, 2, 0, 1)  # (B, 3, H, W)
        if grad:
            out = self.denoise(x, sigma)
        else:
            with torch.no_grad():
                out = self.denoise(x, sigma)
        return out.permute(2, 3, 1, 0)  # (H, W, 3, B)

    def export_numpy(self):
        return {k: v.detach().numpy().copy() for k, v in self.params.items()}


def torch_rggb_subsample(rgb_hw3b):
    """torch twin of :func:`rggb_subsample` (dvp:206-209 / ipol:275-278)."""
    import torch

    return torch.stack(
        [
            rgb_hw3b[0::2, 0::2, 0],
            rgb_hw3b[0::2, 1::2, 1],
            rgb_hw3b[1::2, 0::2, 1],
            rgb_hw3b[1::2, 1::2, 2],
        ],
        -1,
    )


def oracle_two_stage_ffdnet_adaptive(
    y,
    phi,
    state_dict,
    sigmas,
    iters,
    lr,
    update_per_iter=2,
    initial_iter=1,
    interval_iter=5,
    update_times=-1,
    x0_bayer=None,
    emulate_aliasing=True,
    record=False,
):
    """The reference's FULL flagship loop including ONLINE ADAPTATION:
    ``twoStageAdmm_denoise_bayer`` with ``update_=True``
    (``dvp…online.py:200-203``) calling the ``updata_`` branch of
    ``ffdnet_rgb_denoise_full_tensor``
    (``packages/ffdnet/test_ffdnet_ipol.py:248-301``):

    on trigger iterations (``k > initial_iter and k % interval_iter == 0``,
    capped by ``update_times``): construct a FRESH ``torch.optim.Adam`` over
    the model parameters, run ``update_per_iter`` steps of — denoise all B
    frames (current weights), RGGB-subsample, ``loss = MSE(sum(xall*Phiall,
    dim=2), yall)``, backward, step — then re-denoise with the UPDATED
    weights (:303-315). Non-trigger iterations denoise with the carried
    (possibly adapted) weights. Weights persist across iterations; Adam
    moments do NOT (fresh optimizer each trigger).

    Returns ``(x_bayer (H,W,B), rgb (B,H,W,3)[, snaps])``.
    """
    import torch

    net = TorchFFDNetTrainable(state_dict)
    mse = torch.nn.MSELoss()

    h, w = y.shape
    nb = phi.shape[0]
    phi_hwb = np.transpose(np.asarray(phi, np.float32), (1, 2, 0))
    yall = pack4(np.asarray(y, np.float32))
    phiall = pack4(phi_hwb)
    phisum = phiall.sum(2)
    phisum[phisum == 0] = 1.0
    yall_t = torch.from_numpy(yall)
    phiall_t = torch.from_numpy(phiall)

    if x0_bayer is None:
        x0 = phiall * yall[:, :, None, :]
    else:
        x0 = pack4(np.transpose(np.asarray(x0_bayer, np.float32), (1, 2, 0)))

    from tests.test_demosaic import numpy_malvar

    rho, alpha, tau = 1.0, 1.0, 100.0
    theta = x0.copy()
    ball = np.zeros_like(x0)
    w_dual = np.zeros((h, w, 3, nb), np.float32)
    snaps = []
    k = 0
    fired = 0

    for nsig, ni in zip(sigmas, iters):
        for _ in range(ni):
            p = theta - ball / rho
            yb = (p * phiall).sum(2)
            tc = (yall - yb) / (alpha * rho + phisum)
            x = p + phiall * tc[:, :, None, :]

            xb = x + ball / rho
            x_bayer = scatter4(xb, h, w)
            x_rgb = np.stack(
                [numpy_malvar(x_bayer[:, :, m]) for m in range(nb)], -1
            ).astype(np.float32)
            x_rgb_w = x_rgb - w_dual / tau

            fire = (
                k > initial_iter
                and k % interval_iter == 0
                and (update_times < 0 or fired < update_times)
            )
            if fire:
                fired += 1
                # fresh Adam per trigger (test_ffdnet_ipol.py:250-251)
                optimizer = torch.optim.Adam(net.params.values(), lr=lr)
                x_in = torch.from_numpy(x_rgb_w)
                for _step in range(update_per_iter):
                    den = net.denoise_cube(x_in, nsig, grad=True)
                    xall_t = torch_rggb_subsample(den)
                    up_meas = torch.sum(xall_t * phiall_t, dim=2)
                    loss = mse(up_meas, yall_t)
                    optimizer.zero_grad()
                    loss.backward()
                    optimizer.step()

            den = net.denoise_cube(x_rgb_w, nsig, grad=False)
            xbgr3 = den.numpy()                      # (H, W, 3, B)

            theta_pre = rggb_subsample(xbgr3)
            theta_new = np.clip(theta_pre, 0.0, 1.0)
            if emulate_aliasing and k == 0:
                x_for_dual = theta_pre
            else:
                x_for_dual = x
            ball = ball + (x_for_dual - theta_new)
            w_dual = w_dual + (x_rgb - xbgr3)
            theta = theta_new
            k += 1
            if record:
                snaps.append(
                    {"theta": theta.copy(), "b": ball.copy(),
                     "xbgr3": xbgr3.copy(), "fired": fire}
                )

    x_bayer_out = scatter4(theta, h, w)
    rgb_out = np.transpose(xbgr3, (3, 0, 1, 2))
    if record:
        return x_bayer_out, rgb_out, snaps, net
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


def _fastdvd_seqdenoise(torch_model, frames_fchw, sigma):
    """torch twin of ``fastdvdnet_seqdenoise``
    (``packages/fastdvdnet/fastdvdnet.py:82-146``): per-frame CIRCULAR
    5-window denoise, eval/no-grad. ``frames_fchw``: (B, 3, H, W) tensor.
    H/W must be multiples of 4 (the reference reflect-pads otherwise; test
    scenes avoid that branch)."""
    import torch

    n, c, h, w = frames_fchw.shape
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    noise_map = torch.full((1, 1, h, w), float(sigma))
    out = torch.empty((n, c, h, w))
    with torch.no_grad():
        for f in range(n):
            idx = [(f + j - 2) % n for j in range(5)]
            seq = frames_fchw[idx].reshape(1, -1, h, w)
            out[f] = torch_model(seq, noise_map)
    return out


def oracle_two_stage_fastdvd(
    y,
    phi,
    torch_model,
    sigmas,
    iters,
    x0_bayer=None,
    emulate_aliasing=True,
    record=False,
    adapt=None,
):
    """The reference's ``fastdvd_color`` two-stage branch
    (``dvp…online.py:214-259``): rho=0.55 (:106-109), alpha=1, tau=100,
    Malvar demosaic, CIRCULAR 5-window FastDVDnet denoise
    (``fastdvdnet_seqdenoise``), RGGB theta-update, clip, duals — same
    skeleton as the FFDNet path with the fastdvd-specific pieces swapped in.

    ``adapt`` (dict with lr / update_per_iter / initial_iter / interval_iter /
    update_times / noise_std) enables the ``updata_`` branch of
    ``fastdvdnet_denoiser_full_tensor_v2``
    (``packages/fastdvdnet/test_fastdvdnet.py:344-470``): per trigger —
    gaussian noise added ONCE to the input (:359; ``noise_std=0`` disables it
    for deterministic parity runs), BatchNorm modules frozen in eval mode
    (:374-379), then per lr STAGE a FRESH ``torch.optim.Adam`` (:383-385)
    runs ``n_update_iter[stage]`` steps of: circular-window denoise of the
    noisy input (:406-419), ``loss = MSE(sum(mosaic(out)*Phi_1ch, dim=2),
    y_1ch)`` against the 1-channel Bayer measurement (:428-431), backward,
    step; finally a clean no-grad ``fastdvdnet_seqdenoise`` pass with the
    updated weights (:454-458). ``lr``/``update_per_iter`` may be lists
    (per-stage, :344-349).

    ``torch_model`` must be an eval-mode ``(seq_15ch, noise_map) -> frame``
    module (e.g. ``tests/test_fastdvdnet._TorchFastDVDnet``).
    """
    import torch

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

    from tests.test_demosaic import numpy_malvar

    rho, alpha, tau = 0.55, 1.0, 100.0
    theta = x0.copy()
    ball = np.zeros_like(x0)
    w_dual = np.zeros((h, w, 3, nb), np.float32)
    snaps = []
    k = 0
    fired = 0

    if adapt is not None:
        lrs = adapt["lr"] if isinstance(adapt["lr"], (list, tuple)) else [adapt["lr"]]
        ns = (
            adapt["update_per_iter"]
            if isinstance(adapt["update_per_iter"], (list, tuple))
            else [adapt["update_per_iter"]]
        )
        if len(lrs) == 1 and len(ns) > 1:
            lrs = list(lrs) * len(ns)
        if len(ns) == 1 and len(lrs) > 1:
            ns = list(ns) * len(lrs)
        noise_std = adapt.get("noise_std", 5.0 / 255.0)
        mse = torch.nn.MSELoss()
        # full-res 1-channel mosaic versions (fourCh2OneCh, :362-363)
        phi_1ch_t = torch.from_numpy(phi_hwb.copy())       # (H, W, B)
        y_1ch_t = torch.from_numpy(np.asarray(y, np.float32))

    for nsig, ni in zip(sigmas, iters):
        for _ in range(ni):
            p = theta - ball / rho
            yb = (p * phiall).sum(2)
            tc = (yall - yb) / (alpha * rho + phisum)
            x = p + phiall * tc[:, :, None, :]

            xb = x + ball / rho
            x_bayer = scatter4(xb, h, w)
            x_rgb = np.stack(
                [numpy_malvar(x_bayer[:, :, m]) for m in range(nb)], -1
            ).astype(np.float32)
            x_rgb_w = x_rgb - w_dual / tau

            frames = torch.from_numpy(
                np.ascontiguousarray(np.transpose(x_rgb_w, (3, 2, 0, 1)))
            )  # (B, 3, H, W)

            fire = (
                adapt is not None
                and k > adapt["initial_iter"]
                and k % adapt["interval_iter"] == 0
                and (
                    adapt.get("update_times", -1) < 0
                    or fired < adapt["update_times"]
                )
            )
            if fire:
                fired += 1
                torch_model.train()
                for m in torch_model.modules():
                    if isinstance(m, torch.nn.BatchNorm2d):
                        m.eval()  # BN-freeze (:374-379)
                noisy = frames + noise_std * torch.randn_like(frames)
                noise_map = torch.full((1, 1, h, w), float(nsig))
                for lr_i, n_i in zip(lrs, ns):
                    optimizer = torch.optim.Adam(
                        (p_ for p_ in torch_model.parameters()
                         if p_.requires_grad),
                        lr=lr_i,
                    )  # fresh per stage (:383-385)
                    for _step in range(n_i):
                        outs = []
                        for f in range(nb):
                            idx = [(f + j - 2) % nb for j in range(5)]
                            seq = noisy[idx].reshape(1, -1, h, w)
                            outs.append(torch_model(seq, noise_map)[0])
                        outv = torch.stack(outs)  # (B, 3, H, W)
                        out_hw3b = outv.permute(2, 3, 1, 0)
                        # gen_bayer_img(outv, 1): full-res 1-ch mosaic
                        mosaic = torch.zeros((h, w, nb))
                        mosaic[0::2, 0::2] = out_hw3b[0::2, 0::2, 0]
                        mosaic[0::2, 1::2] = out_hw3b[0::2, 1::2, 1]
                        mosaic[1::2, 0::2] = out_hw3b[1::2, 0::2, 1]
                        mosaic[1::2, 1::2] = out_hw3b[1::2, 1::2, 2]
                        up_meas = torch.sum(mosaic * phi_1ch_t, dim=2)
                        loss = mse(up_meas, y_1ch_t)
                        optimizer.zero_grad()
                        loss.backward()
                        optimizer.step()

            # clean-input circular-window pass (fixed branch :478-489, or
            # the post-update pass :454-458 — both no-grad on the clean
            # input with the current weights)
            den = _fastdvd_seqdenoise(torch_model, frames, nsig)
            xbgr3 = den.permute(2, 3, 1, 0).numpy()  # (H, W, 3, B)

            theta_pre = rggb_subsample(xbgr3)
            theta_new = np.clip(theta_pre, 0.0, 1.0)
            if emulate_aliasing and k == 0:
                x_for_dual = theta_pre
            else:
                x_for_dual = x
            ball = ball + (x_for_dual - theta_new)
            w_dual = w_dual + (x_rgb - xbgr3)
            theta = theta_new
            k += 1
            if record:
                snaps.append(
                    {"theta": theta.copy(), "b": ball.copy(),
                     "xbgr3": xbgr3.copy()}
                )

    x_bayer_out = scatter4(theta, h, w)
    rgb_out = np.transpose(xbgr3, (3, 0, 1, 2))
    if record:
        return x_bayer_out, rgb_out, snaps
    return x_bayer_out, rgb_out


def _ddnet_seqdenoise(torch_ddnet, frames_fchw, grad=False):
    """torch twin of ``ddnet_seqdenoise``
    (``packages/DDnet/DDnet_test.py:166-204``): per-frame CIRCULAR 5-window
    joint demosaic+denoise, no noise map. ``frames_fchw``: (B, 3, H, W)
    sparse-CFA tensor. H/W must be multiples of 4 (the reference
    reflect-pads otherwise; test scenes avoid that branch)."""
    import torch

    n, c, h, w = frames_fchw.shape
    assert h % 4 == 0 and w % 4 == 0, (h, w)

    def run():
        outs = []
        for f in range(n):
            idx = [(f + j - 2) % n for j in range(5)]
            seq = frames_fchw[idx].reshape(1, -1, h, w)
            outs.append(torch_ddnet(seq)[0])
        return torch.stack(outs)  # (B, 3, H, W)

    if grad:
        return run()
    with torch.no_grad():
        return run()


def _sparse_cfa(rgb_fchw):
    """torch twin of ``gen_bayer_img`` (``DDnet_test.py:207-215``): zero a
    (B, 3, H, W) RGB cube everywhere except each channel's RGGB CFA sites."""
    import torch

    out = torch.zeros_like(rgb_fchw)
    out[:, 0, 0::2, 0::2] = rgb_fchw[:, 0, 0::2, 0::2]
    out[:, 1, 0::2, 1::2] = rgb_fchw[:, 1, 0::2, 1::2]
    out[:, 1, 1::2, 0::2] = rgb_fchw[:, 1, 1::2, 0::2]
    out[:, 2, 1::2, 1::2] = rgb_fchw[:, 2, 1::2, 1::2]
    return out


def oracle_two_stage_ffdnet_ddnet_dm(
    y,
    phi,
    ffdnet_sd,
    torch_ddnet,
    sigmas,
    iters,
    dm_lr=1e-6,
    dm_update_per_iter=1,
    dm_update=True,
    x0_bayer=None,
    emulate_aliasing=True,
):
    """The reference's deep-demosaicking branch with in-scan ``dm_update``
    (``dvp…online.py:192-194`` calling ``test_ddnet``,
    ``packages/DDnet/DDnet_test.py:218-321``): every ADMM iteration, the
    demosaic step (a) runs ``dm_update_per_iter`` self-consistency Adam
    steps on the DDnet — circular-window denoise of the sparse-CFA input
    with grad (:263-267), ``loss = MSE(vnoisy, gen_bayer_img(out))``
    (:270-275), and a FRESH ``torch.optim.Adam`` constructed INSIDE every
    step (:278-281: bias-corrected step-1 semantics, optimizer state never
    carried) — then (b) demosaics with the refined weights in a no-grad
    pass (:284-288). Denoiser: fixed-weight FFDNet (rho=1, alpha=1,
    tau=100), isolating dm-adaptation parity.

    Returns ``(x_bayer (H, W, B), dm_state_dict_numpy)`` — the adapted
    DDnet weights are part of the contract (drivers carry them across
    measurements).
    """
    import torch

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

    rho, alpha, tau = 1.0, 1.0, 100.0
    theta = x0.copy()
    ball = np.zeros_like(x0)
    w_dual = np.zeros((h, w, 3, nb), np.float32)
    mse = torch.nn.MSELoss()
    k = 0

    for nsig, ni in zip(sigmas, iters):
        for _ in range(ni):
            p = theta - ball / rho
            yb = (p * phiall).sum(2)
            tc = (yall - yb) / (alpha * rho + phisum)
            x = p + phiall * tc[:, :, None, :]

            xb = x + ball / rho
            x_bayer = scatter4(xb, h, w)             # (H, W, B)

            # oneCh2ThreeCh (utils/utils_image.py:150-160): sparse-CFA RGB
            vnoisy = _sparse_cfa(
                torch.from_numpy(
                    np.ascontiguousarray(
                        np.broadcast_to(
                            np.transpose(x_bayer, (2, 0, 1))[:, None],
                            (nb, 3, h, w),
                        )
                    )
                )
            )

            if dm_update:
                torch_ddnet.train()
                for _step in range(dm_update_per_iter):
                    outv = _ddnet_seqdenoise(torch_ddnet, vnoisy, grad=True)
                    loss = mse(vnoisy, _sparse_cfa(outv))
                    optimizer = torch.optim.Adam(
                        torch_ddnet.parameters(), lr=dm_lr
                    )  # fresh INSIDE every step (DDnet_test.py:278-281)
                    optimizer.zero_grad()
                    loss.backward()
                    optimizer.step()

            outv = _ddnet_seqdenoise(torch_ddnet, vnoisy, grad=False)
            xbgr3 = outv.permute(2, 3, 1, 0).numpy()  # (H, W, 3, B)
            x_rgb = xbgr3

            x_rgb_w = x_rgb - w_dual / tau

            frames = np.transpose(x_rgb_w, (3, 2, 0, 1)).astype(np.float32)
            den = np.stack(
                [
                    torch_ffdnet_forward(
                        ffdnet_sd, frames[m : m + 1], np.float32(nsig)
                    )[0]
                    for m in range(nb)
                ],
                0,
            )
            den_hw3b = np.transpose(den, (2, 3, 1, 0))

            theta_pre = rggb_subsample(den_hw3b)
            theta_new = np.clip(theta_pre, 0.0, 1.0)
            if emulate_aliasing and k == 0:
                x_for_dual = theta_pre
            else:
                x_for_dual = x
            ball = ball + (x_for_dual - theta_new)
            w_dual = w_dual + (x_rgb - den_hw3b)
            theta = theta_new
            k += 1

    dm_state = {kk: v.detach().numpy() for kk, v in torch_ddnet.state_dict().items()}
    return scatter4(theta, h, w), dm_state


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / mse)
