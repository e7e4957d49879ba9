"""DDnet online adaptation (dm_update): consistency loss descends and the
pipeline threads adapted demosaicker weights."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.adapt.ddnet_online import (
    dm_consistency_loss,
    make_dm_adapt_fn,
)
from adaptivepnp_sci_tpu.data.synthetic import make_scene
from adaptivepnp_sci_tpu.models.ddnet import DDnet


def _tiny_ddnet():
    model = DDnet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))
    return model, variables


def test_dm_adapt_reduces_consistency_loss():
    model, variables = _tiny_ddnet()
    scene = make_scene(b=8, h=16, w=16, seed=21)
    frames = jnp.asarray(scene.orig_bayer)

    adapt = make_dm_adapt_fn(model, lr=1e-3, update_per_iter=3)
    opt = adapt.init_opt(variables)
    before = float(dm_consistency_loss(model, variables, frames))
    variables2, opt, loss = adapt(variables, opt, frames)
    after = float(dm_consistency_loss(model, variables2, frames))
    assert after < before


def test_pipeline_dm_update():
    from adaptivepnp_sci_tpu.data.mat_io import SceneData
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.pipelines import run_reconstruction
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig

    s = make_scene(b=8, h=16, w=16, seed=22)
    scene = SceneData("synth", s.meas[None], s.mask, s.orig_bayer[None])

    den = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    den_vars = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.float32(0.1))
    dm_model, dm_vars = _tiny_ddnet()

    out = run_reconstruction(
        scene, ffdnet_prior(den), den_vars,
        config=ADMMConfig(sigma=(25 / 255,), iters=(2,), denoiser="ffdnet",
                          demosaic_method="ddnet"),
        warm_start=s.orig_bayer[None],
        dm_model=dm_model, dm_variables=dm_vars, dm_update=True, dm_lr=1e-4,
    )
    assert np.isfinite(out.x_bayer).all()
