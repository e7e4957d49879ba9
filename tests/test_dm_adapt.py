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


def test_dm_adapt_fresh_opt_ignores_incoming_state():
    """fresh_opt=True (reference DDnet_test.py:278-281: new Adam inside every
    step) must give identical weights from a pristine vs momentum-laden
    optimizer state; the default carried mode must not."""
    model, variables = _tiny_ddnet()
    scene = make_scene(b=8, h=16, w=16, seed=22)
    frames = jnp.asarray(scene.orig_bayer)

    adapt_f = make_dm_adapt_fn(model, lr=1e-3, update_per_iter=2,
                               fresh_opt=True)
    clean = adapt_f.init_opt(variables)
    # fabricate a dirty state by running two carried updates
    adapt_c = make_dm_adapt_fn(model, lr=1e-3, update_per_iter=2)
    _, dirty, _ = adapt_c(variables, clean, frames)

    v1, _, _ = adapt_f(variables, clean, frames)
    v2, _, _ = adapt_f(variables, dirty, frames)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    v3, _, _ = adapt_c(variables, clean, frames)
    v4, _, _ = adapt_c(variables, dirty, frames)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(v3),
                        jax.tree_util.tree_leaves(v4))
    )


def test_in_scan_dm_update_changes_trajectory():
    """Interleaved (in-scan) dm adaptation must produce a different solver
    trajectory than fixed-weight DDnet demosaicking AND than pipeline-level
    (once-before-solve) adaptation, and must return refined dm variables."""
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers.priors import ddnet_demosaic, ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        make_dm_spec,
        two_stage_admm,
    )

    s = make_scene(b=8, h=16, w=16, seed=23)
    den = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    den_vars = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.float32(0.1))
    dm_model, dm_vars = _tiny_ddnet()
    cfg = ADMMConfig(sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
                     demosaic_method="ddnet")
    prior = ffdnet_prior(den)

    # fixed-weight DDnet demosaic
    fixed = two_stage_admm(
        s.meas, s.mask, cfg, prior=prior, variables=den_vars,
        x0_bayer=s.orig_bayer, demosaic_fn=ddnet_demosaic(dm_model, dm_vars),
    )
    # in-scan adaptation (large lr so 3 iterations visibly move the weights)
    spec = make_dm_spec(dm_model, lr=1e-3, update_per_iter=1)
    inscan = two_stage_admm(
        s.meas, s.mask, cfg, prior=prior, variables=den_vars,
        x0_bayer=s.orig_bayer, dm_spec=spec, dm_variables=dm_vars,
    )
    # pipeline-level: adapt once before the solve, then fixed weights
    adapt = make_dm_adapt_fn(dm_model, lr=1e-3, update_per_iter=1)
    pre_vars, _, _ = adapt(dm_vars, adapt.init_opt(dm_vars),
                           jnp.asarray(s.orig_bayer))
    prelevel = two_stage_admm(
        s.meas, s.mask, cfg, prior=prior, variables=den_vars,
        x0_bayer=s.orig_bayer, demosaic_fn=ddnet_demosaic(dm_model, pre_vars),
    )

    assert np.isfinite(np.asarray(inscan.x_bayer)).all()
    assert not np.allclose(np.asarray(inscan.x_bayer), np.asarray(fixed.x_bayer))
    assert not np.allclose(np.asarray(inscan.x_bayer),
                           np.asarray(prelevel.x_bayer))
    # refined dm weights returned and different from the input weights
    leaf_in = jax.tree_util.tree_leaves(dm_vars)[0]
    leaf_out = jax.tree_util.tree_leaves(inscan.dm_variables)[0]
    assert leaf_out.shape == leaf_in.shape
    assert not np.allclose(np.asarray(leaf_out), np.asarray(leaf_in))


def test_in_scan_dm_update_reduces_consistency_loss():
    """The carried dm weights should fit the scene better than the initial
    ones under the self-consistency objective they were adapted on."""
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        make_dm_spec,
        two_stage_admm,
    )

    s = make_scene(b=8, h=16, w=16, seed=24)
    den = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    den_vars = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.float32(0.1))
    dm_model, dm_vars = _tiny_ddnet()
    cfg = ADMMConfig(sigma=(25 / 255,), iters=(4,), denoiser="ffdnet",
                     demosaic_method="ddnet")
    spec = make_dm_spec(dm_model, lr=1e-3, update_per_iter=2)
    res = two_stage_admm(
        s.meas, s.mask, cfg, prior=ffdnet_prior(den), variables=den_vars,
        x0_bayer=s.orig_bayer, dm_spec=spec, dm_variables=dm_vars,
    )
    frames = jnp.asarray(s.orig_bayer)
    before = float(dm_consistency_loss(dm_model, dm_vars, frames))
    after = float(dm_consistency_loss(dm_model, res.dm_variables, frames))
    assert after < before


def test_sequence_carries_dm_state():
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        make_dm_spec,
        two_stage_admm_sequence,
    )

    s = make_scene(b=4, h=16, w=16, seed=25)
    den = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    den_vars = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.float32(0.1))
    dm_model, dm_vars = _tiny_ddnet()
    cfg = ADMMConfig(sigma=(25 / 255,), iters=(2,), denoiser="ffdnet",
                     demosaic_method="ddnet")
    spec = make_dm_spec(dm_model, lr=1e-3, update_per_iter=1)
    y_seq = jnp.stack([jnp.asarray(s.meas)] * 2)
    res = two_stage_admm_sequence(
        y_seq, s.mask, cfg, prior=ffdnet_prior(den), variables=den_vars,
        x0_seq=jnp.stack([jnp.asarray(s.orig_bayer)] * 2),
        dm_spec=spec, dm_variables=dm_vars,
    )
    assert np.isfinite(np.asarray(res.x_bayer)).all()
    leaf_in = jax.tree_util.tree_leaves(dm_vars)[0]
    leaf_out = jax.tree_util.tree_leaves(res.dm_variables)[0]
    assert not np.allclose(np.asarray(leaf_out), np.asarray(leaf_in))


def test_pipeline_dm_in_scan():
    from adaptivepnp_sci_tpu.data.mat_io import SceneData
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.pipelines import run_reconstruction
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig

    s = make_scene(b=8, h=16, w=16, seed=26)
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
        dm_in_scan=True,
    )
    assert np.isfinite(out.x_bayer).all()


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


def test_dm_spec_invalid_configs_raise():
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        make_dm_spec,
        two_stage_admm,
    )

    s = make_scene(b=4, h=16, w=16, seed=27)
    den = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    den_vars = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.float32(0.1))
    dm_model, dm_vars = _tiny_ddnet()
    spec = make_dm_spec(dm_model, lr=1e-3)

    import pytest

    with pytest.raises(ValueError, match="closed_form"):
        two_stage_admm(
            s.meas, s.mask,
            ADMMConfig(sigma=(0.1,), iters=(1,), denoiser="ffdnet",
                       closed_form_demosaic=True),
            prior=ffdnet_prior(den), variables=den_vars,
            dm_spec=spec, dm_variables=dm_vars,
        )
    with pytest.raises(ValueError, match="TV solver"):
        two_stage_admm(
            s.meas, s.mask,
            ADMMConfig(sigma=(0.1,), iters=(1,), denoiser="tv"),
            dm_spec=spec, dm_variables=dm_vars,
        )


def test_tiled_dm_in_scan_matches_single_tile_on_identical_tiles():
    """Tiled + in-scan dm adaptation (VERDICT r3 item 3): dm gradients are
    pmean-shared over the tile axis, so on a scene of 4 identical tiles the
    pmean is a no-op and the tiled run must reproduce the single-tile run —
    refined dm weights AND the reconstruction, tile for tile."""
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        make_dm_spec,
        two_stage_admm,
        two_stage_admm_tiled,
    )

    s = make_scene(b=4, h=16, w=16, seed=31)
    den = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    den_vars = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.float32(0.1))
    dd, dd_vars = _tiny_ddnet()
    spec = make_dm_spec(dd, lr=1e-3, update_per_iter=1)
    config = ADMMConfig(sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
                        use_pallas=False)

    y2 = np.tile(np.asarray(s.meas), (2, 2))
    phi2 = np.tile(np.asarray(s.mask), (1, 2, 2))

    tiled = two_stage_admm_tiled(
        y2, phi2, config, tile=16, prior=ffdnet_prior(den),
        variables=den_vars, dm_spec=spec, dm_variables=dd_vars,
    )
    single = two_stage_admm(
        s.meas, s.mask, config, prior=ffdnet_prior(den), variables=den_vars,
        dm_spec=spec, dm_variables=dd_vars,
    )
    # refined dm weights: single shared copy == the untiled trajectory
    got = jax.tree_util.tree_leaves(tiled.dm_variables)
    want = jax.tree_util.tree_leaves(single.dm_variables)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a.shape == b.shape  # collapsed, not tile-stacked
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # adaptation fired (weights moved off the init)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(got, jax.tree_util.tree_leaves(dd_vars))
    )
    # and each tile reproduces the single-tile reconstruction
    np.testing.assert_allclose(
        np.asarray(tiled.x_bayer[:, :16, :16]), np.asarray(single.x_bayer),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tiled.x_bayer[:, 16:, 16:]), np.asarray(single.x_bayer),
        rtol=1e-4, atol=1e-5,
    )


def test_tiled_dm_sequence_carry_through_pipeline():
    """run_reconstruction(tile=..., dm_in_scan=True): the tiled flagship +
    deep-demosaicking mode runs over a 2-measurement scene with the refined
    dm weights carried across measurements (reuse_model)."""
    from adaptivepnp_sci_tpu.data.mat_io import SceneData
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.pipelines import run_reconstruction
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig

    s = make_scene(b=4, h=32, w=32, seed=32, n_meas=2)
    scene = SceneData(
        name="seqcarry",
        meas=np.transpose(np.asarray(s.meas), (2, 0, 1)).astype(np.float32),
        mask=np.asarray(s.mask, np.float32),
        orig_bayer=np.asarray(s.orig_bayer, np.float32),
    )
    den = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    den_vars = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.float32(0.1))
    dd, dd_vars = _tiny_ddnet()
    config = ADMMConfig(
        sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
        use_pallas=False,
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2,
                          initial_iter=0),
    )
    out = run_reconstruction(
        scene, ffdnet_prior(den), den_vars, config=config,
        dm_model=dd, dm_variables=dd_vars, dm_update=True, dm_in_scan=True,
        dm_lr=1e-3, tile=16,
    )
    assert out.x_bayer.shape == (2, 4, 32, 32)
    assert np.isfinite(out.x_bayer).all()
    # dm weights refined through BOTH measurements (carry alive)
    assert out.dm_variables is not None
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(out.dm_variables),
                        jax.tree_util.tree_leaves(dd_vars))
    )
