"""Composed-loop parity for the FastDVD two-stage branch vs an independent
NumPy+torch oracle (``oracle_reference.oracle_two_stage_fastdvd``).

The fastdvd path differs from the oracle-verified FFDNet path in four
load-bearing ways — rho=0.55 (``dvp…online.py:106-109``), CIRCULAR 5-window
denoising with a final clean no-grad pass (``packages/fastdvdnet/
fastdvdnet.py:82-146``, ``test_fastdvdnet.py:454-458``), the 1-channel
mosaic adaptation loss (``test_fastdvdnet.py:428-431``), and fresh-Adam-per-
lr-stage adaptation with BN freeze (``:374-385``). These tests pin each
against the reference semantics with a random-weight torch twin (the real
FastDVDnet checkpoint is absent from the reference snapshot).
"""

import copy

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from adaptivepnp_sci_tpu.adapt.online import AdaptConfig  # noqa: E402
from adaptivepnp_sci_tpu.data.synthetic import make_scene  # noqa: E402
from adaptivepnp_sci_tpu.models import convert  # noqa: E402
from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet  # noqa: E402
from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm  # noqa: E402
from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior  # noqa: E402

from tests.oracle_reference import oracle_two_stage_fastdvd, psnr  # noqa: E402
from tests.test_fastdvdnet import _TorchFastDVDnet  # noqa: E402


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    m = _TorchFastDVDnet().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    variables = convert.fastdvdnet_variables(sd)
    return m, variables


def _run_mine(scene, variables, sigmas, iters, adapt=None, prior=None,
              faithful=False):
    cfg = ADMMConfig(
        sigma=tuple(sigmas), iters=tuple(iters), denoiser="fastdvd",
        use_pallas=False, adapt=adapt, faithful_aliasing=faithful,
    )
    assert cfg.rho == 0.55  # the fastdvd-specific penalty (dvp:106-109)
    res = two_stage_admm(
        jnp.asarray(scene.meas), jnp.asarray(scene.mask), cfg,
        prior=prior if prior is not None else fastdvd_prior(FastDVDnet()),
        variables=variables,
    )
    return np.transpose(np.asarray(res.x_bayer), (1, 2, 0)), res


def test_fixed_weight_iterate_parity(twin):
    """theta matches the clean-dual oracle iterate-for-iterate through the
    sigma-stage boundary (rho=0.55, circular windows, shared-triplet path)."""
    m, variables = twin
    sc = make_scene(b=4, h=32, w=32, seed=3)
    sigmas, iters = [25 / 255, 12 / 255], [3, 2]

    _, _, snaps = oracle_two_stage_fastdvd(
        sc.meas, sc.mask, m, sigmas, iters, emulate_aliasing=False,
        record=True,
    )
    from tests.oracle_reference import scatter4

    prefixes = [([sigmas[0]], [2]), (sigmas, [3, 2])]
    for snap_i, (ps, pi) in zip((1, 4), prefixes):
        mine, _ = _run_mine(sc, variables, ps, pi)
        want = scatter4(snaps[snap_i]["theta"], 32, 32)
        np.testing.assert_allclose(mine, want, atol=1e-4, rtol=1e-3)


def test_fixed_weight_final_psnr_budget(twin):
    """Final PSNR vs the FAITHFUL oracle (iteration-1 aliasing included)
    stays within the +-0.1 dB north-star budget."""
    m, variables = twin
    sc = make_scene(b=4, h=32, w=32, seed=5)
    sigmas, iters = [25 / 255, 12 / 255], [4, 3]

    xb_ref, _ = oracle_two_stage_fastdvd(
        sc.meas, sc.mask, m, sigmas, iters, emulate_aliasing=True,
    )
    mine, _ = _run_mine(sc, variables, sigmas, iters)
    orig = np.transpose(sc.orig_bayer, (1, 2, 0))
    p_ref = psnr(orig, xb_ref)
    p_mine = psnr(orig, mine)
    assert abs(p_mine - p_ref) <= 0.1, (p_mine, p_ref)

    # faithful_aliasing replays the reference's iteration-1 dual artifact
    # (same flag as the FFDNet path): residual collapses
    mine_f, _ = _run_mine(sc, variables, sigmas, iters, faithful=True)
    p_mine_f = psnr(orig, mine_f)
    assert abs(p_mine_f - p_ref) <= 0.02, (p_mine_f, p_ref)


def test_adaptive_parity_lr_stages(twin):
    """The updata_ branch — fresh Adam per lr STAGE, BN frozen, 1-channel
    mosaic loss, clean final pass — vs the solver with
    fresh_opt_per_trigger + lr/update lists. Adaptation noise disabled on
    both sides (it is i.i.d. gaussian, unmatchable across RNGs; the
    deterministic structure is what parity can pin)."""
    m_ref, variables = twin
    m = copy.deepcopy(m_ref)  # adaptation mutates the twin
    sc = make_scene(b=4, h=32, w=32, seed=7)
    sigmas, iters = [25 / 255, 12 / 255], [4, 3]
    lrs, ns = (1e-4, 5e-5), (1, 1)
    init_it, interval = 1, 2

    xb_ref, _ = oracle_two_stage_fastdvd(
        sc.meas, sc.mask, m, sigmas, iters, emulate_aliasing=False,
        adapt=dict(lr=list(lrs), update_per_iter=list(ns),
                   initial_iter=init_it, interval_iter=interval,
                   noise_std=0.0),
    )

    prior = fastdvd_prior(FastDVDnet())._replace(adapt_noise_std=0.0)
    mine, res = _run_mine(
        sc, variables, sigmas, iters,
        adapt=AdaptConfig(lr=lrs, update_per_iter=ns, initial_iter=init_it,
                          interval_iter=interval,
                          fresh_opt_per_trigger=True),
        prior=prior,
    )
    # adaptation must have moved the result...
    fixed, _ = _run_mine(sc, variables, sigmas, iters)
    assert np.abs(fixed - xb_ref).max() > 5 * np.abs(mine - xb_ref).max(), (
        np.abs(fixed - xb_ref).max(), np.abs(mine - xb_ref).max(),
    )
    # ...and the solver must track the oracle through it
    np.testing.assert_allclose(mine, xb_ref, atol=5e-4, rtol=1e-2)

    # adapted weights the solver returns match the oracle's updated torch
    # parameters (cross-measurement carry parity)
    sd_after = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    want_vars = convert.fastdvdnet_variables(sd_after)
    import jax

    # tolerance note: a bias-corrected FIRST Adam step is lr*g/(|g|+eps) —
    # for eps-scale gradients a ~1e-8 fp32 backward difference (JAX vs torch
    # conv algorithms) moves the update by O(lr), so a handful of elements
    # may deviate by up to ~1 lr-step; the bulk must agree far tighter
    devs = np.concatenate([
        (np.asarray(pa) - np.asarray(pb)).ravel()
        for pa, pb in zip(
            jax.tree_util.tree_leaves(res.variables["params"]),
            jax.tree_util.tree_leaves(want_vars["params"]),
        )
    ])
    assert np.abs(devs).max() < 2.5 * max(lrs), np.abs(devs).max()
    assert np.abs(devs).mean() < 1e-7, np.abs(devs).mean()
    assert np.quantile(np.abs(devs), 0.999) < 2e-5


@pytest.mark.slow
def test_scaled_parity_beauty_fastdvd_schedule(twin):
    """Scale canary for the FASTDVD branch (the FFDNet one lives in
    ``test_reference_parity.py``): toy-scale parity must not grow with
    size/iteration count. 128x128x8 frames with the reference's FastDVD
    Beauty schedule sigma=(12,6)/255, iters=(21,2)
    (``two_stage_ADMM_Online_FastDVD_Warm.py:61-80``), GAP-TV warm start —
    23 composed rho=0.55 iterations through circular-window denoising."""
    from adaptivepnp_sci_tpu.solvers.gap_tv import gap_tv

    m, variables = twin
    sc = make_scene(b=8, h=128, w=128, seed=17)
    ws = gap_tv(jnp.asarray(sc.meas), jnp.asarray(sc.mask))
    x0 = np.asarray(ws.x_bayer)
    sigmas, iters = [12 / 255, 6 / 255], [21, 2]

    xb_ref, _ = oracle_two_stage_fastdvd(
        sc.meas, sc.mask, copy.deepcopy(m), sigmas, iters, x0_bayer=x0,
        emulate_aliasing=True,
    )
    cfg = ADMMConfig(sigma=tuple(sigmas), iters=tuple(iters),
                     denoiser="fastdvd", use_pallas=False,
                     faithful_aliasing=True)
    res = two_stage_admm(
        jnp.asarray(sc.meas), jnp.asarray(sc.mask), cfg,
        prior=fastdvd_prior(FastDVDnet()), variables=variables,
        x0_bayer=jnp.asarray(x0),
    )
    mine = np.transpose(np.asarray(res.x_bayer), (1, 2, 0))
    orig = np.transpose(sc.orig_bayer, (1, 2, 0))
    p_ref, p_mine = psnr(orig, xb_ref), psnr(orig, mine)
    # random-weight twin: reconstruction quality is meaningless, PARITY is
    # the assertion — both sides must land within the north-star budget
    assert abs(p_mine - p_ref) <= 0.1, (p_mine, p_ref)
