"""One-stage GAP + deep-prior warm-start solver (reference
``admm_denoise_bayer_demosaic_pre`` deep branches, ``dvp…online.py:439-496``)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
from adaptivepnp_sci_tpu.data.synthetic import make_scene
from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
from adaptivepnp_sci_tpu.models.ffdnet import FFDNet, ffdnet_color
from adaptivepnp_sci_tpu.solvers import GapDeepConfig, gap_deep
from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior, ffdnet_prior

CKPT = "/root/reference/model_zoo/ffdnet_color.pth"


@pytest.fixture(scope="module")
def scene():
    return make_scene(b=4, h=32, w=32, seed=11)


def test_gap_deep_ffdnet_branch(scene):
    model = FFDNet(in_nc=3, out_nc=3, nc=16, nb=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.float32(0.1)
    )
    res = gap_deep(
        scene.meas, scene.mask,
        GapDeepConfig(sigma=(25 / 255, 12 / 255), iters=(3, 2)),
        prior=ffdnet_prior(model), variables=variables,
        orig_bayer=scene.orig_bayer,
    )
    assert res.x_rgb.shape == scene.orig_rgb.shape
    assert res.x_bayer.shape == scene.orig_bayer.shape
    assert np.isfinite(np.asarray(res.x_bayer)).all()


def test_gap_deep_fastdvd_branch(scene):
    model = FastDVDnet()
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 5, 8, 8, 3)), jnp.float32(0.1)
    )
    res = gap_deep(
        scene.meas, scene.mask,
        GapDeepConfig(sigma=(25 / 255,), iters=(3,), denoiser="fastdvd"),
        prior=fastdvd_prior(model), variables=variables,
        orig_bayer=scene.orig_bayer,
    )
    assert res.x_rgb.shape == scene.orig_rgb.shape
    assert np.isfinite(np.asarray(res.x_bayer)).all()


def test_gap_deep_adaptation_updates_params(scene):
    """The reference 'PPP' branch: scheduled FFDNet adaptation inside GAP."""
    model = FFDNet(in_nc=3, out_nc=3, nc=16, nb=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.float32(0.1)
    )
    cfg = GapDeepConfig(
        sigma=(25 / 255,), iters=(5,),
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2,
                          initial_iter=1),
    )
    res = gap_deep(
        scene.meas, scene.mask, cfg,
        prior=ffdnet_prior(model), variables=variables,
    )
    before = jax.tree_util.tree_leaves(variables["params"])
    after = jax.tree_util.tree_leaves(res.variables["params"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_gap_deep_matches_reference_oracle(scene):
    """Composed-loop parity vs the independent NumPy+torch GAP oracle."""
    from adaptivepnp_sci_tpu.models import convert
    from tests.oracle_reference import oracle_gap_ffdnet

    sd = convert.load_torch_state_dict(CKPT)
    variables = convert.ffdnet_params(sd)
    sigmas, iters = [25 / 255, 12 / 255], [3, 2]

    want = oracle_gap_ffdnet(scene.meas, scene.mask, sd, sigmas, iters)
    res = gap_deep(
        scene.meas, scene.mask,
        GapDeepConfig(sigma=tuple(sigmas), iters=tuple(iters)),
        prior=ffdnet_prior(ffdnet_color()), variables=variables,
    )
    mine = np.transpose(np.asarray(res.x_bayer), (1, 2, 0))
    np.testing.assert_allclose(mine, want, atol=5e-5, rtol=1e-4)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_gap_deep_reconstructs_with_real_weights(scene):
    from adaptivepnp_sci_tpu.models import convert

    variables = convert.load_ffdnet(CKPT)
    res = gap_deep(
        scene.meas, scene.mask,
        GapDeepConfig(sigma=(50 / 255, 25 / 255, 12 / 255), iters=(10, 10, 10)),
        prior=ffdnet_prior(ffdnet_color()), variables=variables,
        orig_bayer=scene.orig_bayer,
    )
    assert float(res.psnr_per_frame.mean()) > 28.0
