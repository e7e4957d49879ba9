"""North-star parity: the composed two-stage ADMM loop vs an independent
NumPy+torch oracle of the reference solver (``tests/oracle_reference.py``).

Component parity (FFDNet/demosaic/TV vs their own oracles) is covered
elsewhere; these tests pin the *composed* semantics — x-update -> demosaic ->
denoise -> RGGB theta-update -> duals over the full sigma-continuation
schedule (``/root/reference/dvp_linear_inv_2_stage_ADMM_tensor_online.py:
121-271``) — iterate-for-iterate and dB-for-dB.

Reference faithfulness: the reference carries an iteration-1 aliasing artifact
in its dual update (see ``oracle_reference.py`` docstring). Our solver
implements the clean semantics; ``test_final_psnr_within_north_star_budget``
bounds the resulting delta against the *faithful* oracle at <= 0.1 dB.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from adaptivepnp_sci_tpu.data.synthetic import make_scene
from adaptivepnp_sci_tpu.models import convert
from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_color
from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm
from adaptivepnp_sci_tpu.solvers.gap_tv import gap_tv
from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

from tests.oracle_reference import oracle_two_stage_ffdnet, psnr

CKPT = "/root/reference/model_zoo/ffdnet_color.pth"
pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference ckpt absent"
)


@pytest.fixture(scope="module")
def ffdnet_setup():
    sd = convert.load_torch_state_dict(CKPT)
    variables = convert.ffdnet_params(sd)
    prior = ffdnet_prior(ffdnet_color())
    return sd, variables, prior


def _run_mine(scene, variables, prior, sigmas, iters, x0=None,
              faithful=False):
    cfg = ADMMConfig(
        sigma=tuple(sigmas), iters=tuple(iters), denoiser="ffdnet",
        use_pallas=False, faithful_aliasing=faithful,
    )
    res = two_stage_admm(
        jnp.asarray(scene.meas), jnp.asarray(scene.mask), cfg, prior=prior,
        variables=variables,
        x0_bayer=None if x0 is None else jnp.asarray(x0),
    )
    return np.transpose(np.asarray(res.x_bayer), (1, 2, 0))  # (H, W, B)


def test_iterate_level_parity(ffdnet_setup):
    """theta after every iteration matches the oracle to fp32 tolerance,
    including across the sigma-stage boundary."""
    sd, variables, prior = ffdnet_setup
    sc = make_scene(b=4, h=32, w=32, seed=3)
    sigmas, iters = [25 / 255, 12 / 255], [2, 2]

    _, _, snaps = oracle_two_stage_ffdnet(
        sc.meas, sc.mask, sd, sigmas, iters,
        emulate_aliasing=False, record=True,
    )
    # prefix schedules: 1 and 2 iters in stage 1; 2+1 crossing into stage 2
    prefixes = [([sigmas[0]], [1]), ([sigmas[0]], [2]), (sigmas, [2, 1]),
                (sigmas, [2, 2])]
    for snap, (ps, pi) in zip(snaps, prefixes):
        mine = _run_mine(sc, variables, prior, ps, pi)
        from tests.oracle_reference import scatter4

        want = scatter4(snap["theta"], 32, 32)
        np.testing.assert_allclose(mine, want, atol=5e-5, rtol=1e-4)


def test_final_psnr_within_north_star_budget(ffdnet_setup):
    """Final PSNR delta vs the FAITHFUL reference loop (aliasing artifact
    included) stays within the +-0.1 dB north-star budget, in the realistic
    GAP-TV warm-start regime."""
    sd, variables, prior = ffdnet_setup
    sc = make_scene(b=4, h=48, w=48, seed=5)
    ws = gap_tv(jnp.asarray(sc.meas), jnp.asarray(sc.mask))
    x0 = np.asarray(ws.x_bayer)
    sigmas, iters = [25 / 255, 12 / 255, 6 / 255], [4, 4, 2]

    xb_ref, _ = oracle_two_stage_ffdnet(
        sc.meas, sc.mask, sd, sigmas, iters, x0_bayer=x0,
        emulate_aliasing=True,
    )
    mine = _run_mine(sc, variables, prior, sigmas, iters, x0=x0)
    orig = np.transpose(sc.orig_bayer, (1, 2, 0))

    p_ref = psnr(orig, xb_ref)
    p_mine = psnr(orig, mine)
    assert abs(p_mine - p_ref) <= 0.1, (p_mine, p_ref)
    # and in this regime both sides must actually reconstruct
    assert p_ref > 25 and p_mine > 25

    # faithful_aliasing replays the reference's iteration-1 artifact: the
    # residual budget collapses by an order of magnitude
    mine_f = _run_mine(scene=sc, variables=variables, prior=prior,
                       sigmas=sigmas, iters=iters, x0=x0, faithful=True)
    p_mine_f = psnr(orig, mine_f)
    assert abs(p_mine_f - p_ref) <= 0.02, (p_mine_f, p_ref)


@pytest.mark.slow
def test_scaled_parity_full_beauty_schedule(ffdnet_setup):
    """Scale canary: the 0.04 dB toy-scale parity must not grow with
    size/iteration count. 128x128x8 frames, the full Beauty schedule
    sigma=(25,12,6)/255, iters=(15,6,4) (``two_stage_ADMM_Online_FFD_Warm.py:
    62-73``), GAP-TV warm start — 25 composed iterations, the benchmark
    regime's schedule at quarter resolution (pure NumPy/torch-CPU oracle)."""
    sd, variables, prior = ffdnet_setup
    sc = make_scene(b=8, h=128, w=128, seed=9)
    ws = gap_tv(jnp.asarray(sc.meas), jnp.asarray(sc.mask))
    x0 = np.asarray(ws.x_bayer)
    sigmas, iters = [25 / 255, 12 / 255, 6 / 255], [15, 6, 4]

    xb_ref, _ = oracle_two_stage_ffdnet(
        sc.meas, sc.mask, sd, sigmas, iters, x0_bayer=x0,
        emulate_aliasing=True,
    )
    mine = _run_mine(sc, variables, prior, sigmas, iters, x0=x0)
    orig = np.transpose(sc.orig_bayer, (1, 2, 0))
    p_ref = psnr(orig, xb_ref)
    p_mine = psnr(orig, mine)
    assert abs(p_mine - p_ref) <= 0.1, (p_mine, p_ref)
    assert p_ref > 28 and p_mine > 28


@pytest.mark.slow
def test_fullscale_512_parity_golden(ffdnet_setup):
    """NORTH-STAR parity at the benchmark shape (VERDICT r3 item 2):
    512x512, B=8, textured stand-in, GAP-TV warm start, the FULL verbatim
    Beauty schedule sigma=(25,12,6)/255 iters=(15,6,4) — fixed-weight AND
    online-adaptive (lr=2e-6, 2 Adam steps, interval 15) — against the
    committed output of the NumPy+torch oracle
    (``scripts/gen_fullscale_parity_golden.py`` — the reference loop of
    ``dvp_linear_inv_2_stage_ADMM_tensor_online.py:40-324`` at the shape
    that matters). Budget: final PSNR within +-0.1 dB, iterate max delta
    bounded (fp16 golden storage contributes <=5e-4 of the bound)."""
    golden_path = os.path.join(os.path.dirname(__file__), "goldens",
                               "fullscale_512_parity.npz")
    blob = np.load(golden_path)
    h, w, b, seed = (int(v) for v in blob["meta"])
    sc = make_scene(b=b, h=h, w=w, seed=seed, style="textured")
    # the stand-in regenerated bit-identically (guards numpy RNG drift)
    np.testing.assert_allclose(
        np.asarray(sc.meas, np.float64).sum(), float(blob["meas_checksum"]),
        rtol=1e-12)
    x0 = blob["x0"].astype(np.float32)        # (B, H, W), fp16-quantized
    orig = np.transpose(sc.orig_bayer, (1, 2, 0))

    sd, variables, prior = ffdnet_setup
    sigmas, iters = [25 / 255, 12 / 255, 6 / 255], [15, 6, 4]

    # fixed-weight
    mine = _run_mine(sc, variables, prior, sigmas, iters, x0=x0,
                     faithful=True)
    p_ref = float(blob["psnr_fixed"])
    p_mine = psnr(orig, mine)
    assert abs(p_mine - p_ref) <= 0.1, (p_mine, p_ref)
    d = np.abs(mine - blob["ref_fixed"].astype(np.float32))
    assert d.max() < 2e-2 and d.mean() < 1e-3, (d.max(), d.mean())

    # online-adaptive (the flagship semantic) — Beauty row cadence
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig

    cfg = ADMMConfig(
        sigma=tuple(sigmas), iters=tuple(iters), denoiser="ffdnet",
        use_pallas=False, faithful_aliasing=True,
        adapt=AdaptConfig(lr=2e-6, update_per_iter=2, initial_iter=1,
                          interval_iter=15, fresh_opt_per_trigger=True),
    )
    res = two_stage_admm(
        jnp.asarray(sc.meas), jnp.asarray(sc.mask), cfg, prior=prior,
        variables=variables, x0_bayer=jnp.asarray(x0),
    )
    mine_a = np.transpose(np.asarray(res.x_bayer), (1, 2, 0))
    p_ref_a = float(blob["psnr_adaptive"])
    p_mine_a = psnr(orig, mine_a)
    assert abs(p_mine_a - p_ref_a) <= 0.1, (p_mine_a, p_ref_a)
    d = np.abs(mine_a - blob["ref_adaptive"].astype(np.float32))
    assert d.max() < 2e-2 and d.mean() < 1e-3, (d.max(), d.mean())
    # both regimes genuinely reconstruct (warm start is ~29.9 dB)
    assert p_mine > 35 and p_mine_a > 35


class TestAdaptiveParity:
    """The flagship semantic — ONLINE ADAPTATION — vs the reference's
    fresh-Adam-per-trigger update branch
    (``packages/ffdnet/test_ffdnet_ipol.py:248-301`` called from
    ``dvp…online.py:200-203``), oracled end-to-end with a real
    ``torch.optim.Adam`` stepping the actual checkpoint weights."""

    def _run_mine_adaptive(self, scene, variables, prior, sigmas, iters,
                           adapt, x0=None, faithful=False):
        cfg = ADMMConfig(
            sigma=tuple(sigmas), iters=tuple(iters), denoiser="ffdnet",
            use_pallas=False, adapt=adapt, faithful_aliasing=faithful,
        )
        res = two_stage_admm(
            jnp.asarray(scene.meas), jnp.asarray(scene.mask), cfg,
            prior=prior, variables=variables,
            x0_bayer=None if x0 is None else jnp.asarray(x0),
        )
        return np.transpose(np.asarray(res.x_bayer), (1, 2, 0)), res

    def test_adaptive_iterate_parity(self, ffdnet_setup):
        """Aggressive-lr adaptation (so weight drift dominates fp32 noise):
        the solver in fresh_opt_per_trigger mode tracks the oracle's final
        Bayer cube through 3 triggers x 2 Adam steps."""
        from tests.oracle_reference import oracle_two_stage_ffdnet_adaptive

        sd, variables, prior = ffdnet_setup
        sc = make_scene(b=4, h=32, w=32, seed=3)
        sigmas, iters = [25 / 255, 12 / 255], [4, 3]
        lr, upi, init_it, interval = 1e-4, 2, 1, 2

        xb_ref, _ = oracle_two_stage_ffdnet_adaptive(
            sc.meas, sc.mask, sd, sigmas, iters, lr=lr,
            update_per_iter=upi, initial_iter=init_it,
            interval_iter=interval, emulate_aliasing=False,
        )
        from adaptivepnp_sci_tpu.adapt.online import AdaptConfig

        mine, _ = self._run_mine_adaptive(
            sc, variables, prior, sigmas, iters,
            AdaptConfig(lr=lr, update_per_iter=upi, initial_iter=init_it,
                        interval_iter=interval, fresh_opt_per_trigger=True),
        )
        # Discrimination (measured, recorded in RESULTS.md): at this lr the
        # FIXED-weight trajectory sits ~0.5 max / ~0.11 mean from the
        # adaptive oracle — and so does CARRIED-Adam mode (~0.54/0.10) —
        # while fresh-per-trigger tracks it at ~6e-4 max. The residual is
        # fp32 chaos through bias-corrected step-1 Adam (lr*g/(|g|+eps) is
        # O(0.1 lr)-sensitive to 1e-8 gradient differences), amplified by
        # the denoiser over 7 iterations.
        mine_fixed = _run_mine(sc, variables, prior, sigmas, iters)
        d_fixed = np.abs(mine_fixed - xb_ref)
        d_mine = np.abs(mine - xb_ref)
        assert d_fixed.max() > 50 * d_mine.max(), (d_fixed.max(), d_mine.max())
        assert d_mine.max() < 2.5e-3, d_mine.max()
        assert d_mine.mean() < 5e-4, d_mine.mean()

    def test_adaptive_final_psnr_budget(self, ffdnet_setup):
        """Reference-realistic regime (GAP-TV warm start, Beauty-like
        cadence, lr=2e-6): final PSNR within the +-0.1 dB north-star budget
        of the faithful (aliasing-emulating) adaptive oracle."""
        from tests.oracle_reference import oracle_two_stage_ffdnet_adaptive

        sd, variables, prior = ffdnet_setup
        sc = make_scene(b=4, h=48, w=48, seed=5)
        ws = gap_tv(jnp.asarray(sc.meas), jnp.asarray(sc.mask))
        x0 = np.asarray(ws.x_bayer)
        sigmas, iters = [25 / 255, 12 / 255, 6 / 255], [4, 4, 2]
        lr, upi, init_it, interval = 2e-6, 2, 1, 3

        xb_ref, _ = oracle_two_stage_ffdnet_adaptive(
            sc.meas, sc.mask, sd, sigmas, iters, lr=lr,
            update_per_iter=upi, initial_iter=init_it,
            interval_iter=interval, x0_bayer=x0, emulate_aliasing=True,
        )
        from adaptivepnp_sci_tpu.adapt.online import AdaptConfig

        adapt_cfg = AdaptConfig(lr=lr, update_per_iter=upi,
                                initial_iter=init_it,
                                interval_iter=interval,
                                fresh_opt_per_trigger=True)
        orig = np.transpose(sc.orig_bayer, (1, 2, 0))
        p_ref = psnr(orig, xb_ref)

        # clean-dual solver vs the faithful reference: the reference's
        # iteration-1 aliasing artifact amplified through adaptation costs
        # ~0.14 dB at this scale — outside the 0.1 dB budget, which is why
        # ADMMConfig.faithful_aliasing exists
        mine_clean, _ = self._run_mine_adaptive(
            sc, variables, prior, sigmas, iters, adapt_cfg, x0=x0)
        p_clean = psnr(orig, mine_clean)
        assert abs(p_clean - p_ref) <= 0.3, (p_clean, p_ref)

        # faithful mode replays the artifact: inside the budget with margin
        mine, _ = self._run_mine_adaptive(
            sc, variables, prior, sigmas, iters, adapt_cfg, x0=x0,
            faithful=True)
        p_mine = psnr(orig, mine)
        assert abs(p_mine - p_ref) <= 0.1, (p_mine, p_ref)
        assert p_ref > 25 and p_mine > 25

    def test_adapted_weights_match_oracle(self, ffdnet_setup):
        """Not just the image: the ADAPTED WEIGHTS the solver returns (which
        drivers carry to the next measurement) match the oracle's
        post-adaptation torch parameters."""
        from tests.oracle_reference import oracle_two_stage_ffdnet_adaptive

        sd, variables, prior = ffdnet_setup
        sc = make_scene(b=4, h=32, w=32, seed=11)
        sigmas, iters = [25 / 255], [4]
        lr = 1e-4

        *_, net = oracle_two_stage_ffdnet_adaptive(
            sc.meas, sc.mask, sd, sigmas, iters, lr=lr, update_per_iter=2,
            initial_iter=0, interval_iter=2, emulate_aliasing=False,
            record=True,
        )
        ref_params = net.export_numpy()

        from adaptivepnp_sci_tpu.adapt.online import AdaptConfig

        _, res = self._run_mine_adaptive(
            sc, variables, prior, sigmas, iters,
            AdaptConfig(lr=lr, update_per_iter=2, initial_iter=0,
                        interval_iter=2, fresh_opt_per_trigger=True),
        )
        import jax

        want_vars = convert.ffdnet_params(ref_params)
        devs = np.concatenate([
            (np.asarray(pa) - np.asarray(pb)).ravel()
            for pa, pb in zip(
                jax.tree_util.tree_leaves(res.variables["params"]),
                jax.tree_util.tree_leaves(want_vars["params"]),
            )
        ])
        # a bias-corrected first Adam step is lr*g/(|g|+eps): eps-scale
        # gradients make a few elements sensitive at O(0.1 lr) to fp32
        # backward differences between JAX and torch; bulk must be tight
        assert np.abs(devs).max() < 0.5 * lr, np.abs(devs).max()
        assert np.abs(devs).mean() < 1e-8, np.abs(devs).mean()


class TestDmUpdateParity:
    """In-scan DDnet ``dm_update`` — the third and last adaptation path —
    vs the reference's interleaving (``dvp…online.py:192-194`` +
    ``packages/DDnet/DDnet_test.py:218-321``), oracled end-to-end with a
    real ``torch.optim.Adam`` constructed fresh inside every update step
    (the reference's ``DDnet_test.py:278-281`` optimizer semantics =
    ``dm_fresh_opt``/``DmSpec.fresh_opt``)."""

    @pytest.fixture()
    def dm_setup(self, ffdnet_setup):
        import torch

        from tests.test_ddnet import TDDnet

        torch.manual_seed(4)
        tm = TDDnet()
        with torch.no_grad():
            tm.weight_tensor_in.normal_(1.0, 0.1)
            tm.weight_tensor_in2.normal_(1.0, 0.1)
            tm.weight_tensor_out.normal_(0.5, 0.1)
        sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
        dm_vars = convert.ddnet_variables(sd)
        return tm, dm_vars

    def _run_mine_dm(self, scene, variables, prior, dm_vars, sigmas, iters,
                     dm_lr, dm_upi, fresh_opt=True):
        from adaptivepnp_sci_tpu.models.ddnet import DDnet
        from adaptivepnp_sci_tpu.solvers.two_stage_admm import make_dm_spec

        spec = make_dm_spec(DDnet(), lr=dm_lr, update_per_iter=dm_upi,
                            fresh_opt=fresh_opt)
        cfg = ADMMConfig(sigma=tuple(sigmas), iters=tuple(iters),
                         denoiser="ffdnet", use_pallas=False)
        res = two_stage_admm(
            jnp.asarray(scene.meas), jnp.asarray(scene.mask), cfg,
            prior=prior, variables=variables,
            dm_spec=spec, dm_variables=dm_vars,
            dm_opt_state=spec.optimizer.init(dm_vars),
        )
        return np.transpose(np.asarray(res.x_bayer), (1, 2, 0)), res

    def test_dm_update_iterate_parity(self, ffdnet_setup, dm_setup):
        """Aggressive dm_lr (weight drift dominates fp32 noise): the in-scan
        dm-adapted solver tracks the oracle's final Bayer cube through
        4 iterations x 2 fresh-Adam steps, and a no-dm-update run does NOT
        (discrimination)."""
        from tests.oracle_reference import oracle_two_stage_ffdnet_ddnet_dm

        sd, variables, prior = ffdnet_setup
        tm, dm_vars = dm_setup
        sc = make_scene(b=4, h=32, w=32, seed=13)
        sigmas, iters = [25 / 255], [4]
        dm_lr, dm_upi = 1e-4, 2

        xb_ref, dm_state_ref = oracle_two_stage_ffdnet_ddnet_dm(
            sc.meas, sc.mask, sd, tm, sigmas, iters,
            dm_lr=dm_lr, dm_update_per_iter=dm_upi,
            emulate_aliasing=False,
        )
        want = np.transpose(xb_ref, (0, 1, 2))  # already (H, W, B)

        mine, res = self._run_mine_dm(
            sc, variables, prior, dm_vars, sigmas, iters, dm_lr, dm_upi)

        # discrimination: freezing the demosaicker (lr=0) must diverge from
        # the adaptive oracle far more than the adaptive solver does
        mine_fixed, _ = self._run_mine_dm(
            sc, variables, prior, dm_vars, sigmas, iters, 0.0, dm_upi)
        d_fixed = np.abs(mine_fixed - want)
        d_mine = np.abs(mine - want)
        assert d_fixed.max() > 20 * d_mine.max(), (d_fixed.max(), d_mine.max())
        assert d_mine.max() < 5e-3, d_mine.max()
        assert d_mine.mean() < 5e-4, d_mine.mean()

        # the ADAPTED DEMOSAICKER WEIGHTS (carried across measurements by
        # drivers) match the oracle's post-adaptation torch parameters
        import jax

        want_vars = convert.ddnet_variables(dm_state_ref)
        devs = np.concatenate([
            (np.asarray(pa) - np.asarray(pb)).ravel()
            for pa, pb in zip(
                jax.tree_util.tree_leaves(res.dm_variables["params"]),
                jax.tree_util.tree_leaves(want_vars["params"]),
            )
        ])
        # 8 fresh step-1 Adam steps (lr*g/(|g|+eps)): elements with
        # eps-scale gradients are O(lr)-sensitive per step to fp32 backward
        # differences between JAX and torch; bulk must be tight
        assert np.abs(devs).max() < 2.0 * dm_lr, np.abs(devs).max()
        assert np.abs(devs).mean() < 1e-7, np.abs(devs).mean()


def test_exact_match_against_clean_semantics(ffdnet_setup):
    """Against the clean-dual oracle the match is numerically tight (<1e-4
    max abs after 10 composed iterations) — solver-drift canary."""
    sd, variables, prior = ffdnet_setup
    sc = make_scene(b=4, h=32, w=32, seed=7)
    sigmas, iters = [25 / 255, 12 / 255], [6, 4]

    xb_clean, _ = oracle_two_stage_ffdnet(
        sc.meas, sc.mask, sd, sigmas, iters, emulate_aliasing=False,
    )
    mine = _run_mine(sc, variables, prior, sigmas, iters)
    assert np.abs(mine - xb_clean).max() < 1e-4
