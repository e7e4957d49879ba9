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


def _run_mine(scene, variables, prior, sigmas, iters, x0=None):
    cfg = ADMMConfig(
        sigma=tuple(sigmas), iters=tuple(iters), denoiser="ffdnet",
        use_pallas=False,
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
