"""End-to-end solver tests on synthetic CACTI scenes (CPU, small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptivepnp_sci_tpu.adapt.online import AdaptConfig, make_schedule
from adaptivepnp_sci_tpu.data.synthetic import make_scene
from adaptivepnp_sci_tpu.ops import metrics, physics, bayer
from adaptivepnp_sci_tpu.solvers import ADMMConfig, GapTVConfig, gap_tv, two_stage_admm
from adaptivepnp_sci_tpu.solvers.priors import Prior, ffdnet_prior
from adaptivepnp_sci_tpu.models.ffdnet import FFDNet


@pytest.fixture(scope="module")
def scene():
    return make_scene(b=4, h=32, w=32, seed=7)


def test_gap_tv_improves_over_adjoint(scene):
    res = gap_tv(
        scene.meas, scene.mask, GapTVConfig(iters=20), orig_bayer=scene.orig_bayer
    )
    # baseline: normalized adjoint
    phi_p = bayer.pack(jnp.asarray(scene.mask))
    y_p = bayer.pack(jnp.asarray(scene.meas))
    x_adj = bayer.unpack(physics.adjoint(y_p / physics.phi_sum(phi_p), phi_p))
    psnr_adj = float(metrics.psnr(jnp.asarray(scene.orig_bayer), x_adj))
    psnr_tv = float(res.psnr_per_frame.mean())
    assert psnr_tv > psnr_adj + 3.0, (psnr_tv, psnr_adj)
    assert psnr_tv > 20.0


def test_gap_tv_trace_monotone_tail(scene):
    res = gap_tv(
        scene.meas, scene.mask, GapTVConfig(iters=30), orig_bayer=scene.orig_bayer
    )
    trace = np.asarray(res.psnr_trace)
    assert trace.shape == (30,)
    assert trace[-1] >= trace[4]  # converging, not diverging


def test_make_schedule_replays_reference_counter():
    sig, mask = make_schedule(
        (0.1, 0.05), (6, 4), AdaptConfig(interval_iter=3, initial_iter=1, update_times=2)
    )
    assert sig.shape == (10,)
    np.testing.assert_allclose(sig[:6], 0.1)
    np.testing.assert_allclose(sig[6:], 0.05)
    # fires at k=3, 6 (cap 2); k=9 capped away
    assert list(np.nonzero(mask)[0]) == [3, 6]


def test_two_stage_admm_tv_denoiser(scene):
    config = ADMMConfig(sigma=(0.0,), iters=(10,), denoiser="tv")
    res = two_stage_admm(
        scene.meas, scene.mask, config, orig_bayer=scene.orig_bayer
    )
    assert float(res.psnr_per_frame.mean()) > 18.0
    assert res.x_bayer.shape == scene.orig_bayer.shape


@pytest.fixture(scope="module")
def tiny_ffdnet():
    model = FFDNet(in_nc=3, out_nc=3, nc=16, nb=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.float32(0.1)
    )
    return model, variables


def test_two_stage_admm_ffdnet_runs(scene, tiny_ffdnet):
    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=10))
    config = ADMMConfig(sigma=(25 / 255, 12 / 255), iters=(3, 2), denoiser="ffdnet")
    res = two_stage_admm(
        scene.meas, scene.mask, config, prior=prior, variables=variables,
        x0_bayer=warm.x_bayer, orig_bayer=scene.orig_bayer,
    )
    assert res.x_rgb.shape == scene.orig_rgb.shape
    assert np.isfinite(np.asarray(res.psnr_trace)).all()


def test_two_stage_admm_online_adaptation_updates_params(scene, tiny_ffdnet):
    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    config = ADMMConfig(
        sigma=(25 / 255,), iters=(6,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2, initial_iter=1),
    )
    res = two_stage_admm(
        scene.meas, scene.mask, config, prior=prior, variables=variables,
        orig_bayer=scene.orig_bayer,
    )
    before = jax.tree_util.tree_leaves(variables["params"])
    after = jax.tree_util.tree_leaves(res.variables["params"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed, "online adaptation must modify denoiser params"


def test_two_stage_admm_adaptation_reduces_measurement_loss(scene, tiny_ffdnet):
    """Adaptation optimizes MSE(A(mosaic(denoise(x))), y): verify descent."""
    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    y_p = bayer.pack(jnp.asarray(scene.meas))
    phi_p = bayer.pack(jnp.asarray(scene.mask))
    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=10))
    from adaptivepnp_sci_tpu.ops.demosaic import malvar2004

    rgb_in = malvar2004(jnp.asarray(warm.x_bayer))

    def meas_loss(v):
        xhat = prior.apply(v, rgb_in, jnp.float32(25 / 255))
        pred = physics.forward(bayer.rggb_subsample(xhat), phi_p)
        return float(jnp.mean((pred - y_p) ** 2))

    config = ADMMConfig(
        sigma=(25 / 255,), iters=(8,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-3, update_per_iter=2, interval_iter=2, initial_iter=0),
    )
    res = two_stage_admm(
        scene.meas, scene.mask, config, prior=prior, variables=variables,
        x0_bayer=warm.x_bayer,
    )
    assert meas_loss(res.variables) < meas_loss(variables)


def test_two_stage_admm_closed_form_demosaic(scene, tiny_ffdnet):
    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    config = ADMMConfig(
        sigma=(25 / 255,), iters=(4,), denoiser="ffdnet", closed_form_demosaic=True
    )
    res = two_stage_admm(
        scene.meas, scene.mask, config, prior=prior, variables=variables,
        orig_bayer=scene.orig_bayer,
    )
    assert np.isfinite(np.asarray(res.x_rgb)).all()


def test_two_stage_admm_batched(scene, tiny_ffdnet):
    """Throughput mode: vmap over measurements matches per-measurement runs."""
    import numpy as np

    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_batched

    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    config = ADMMConfig(sigma=(25 / 255,), iters=(3,), denoiser="ffdnet")

    y2 = jnp.stack([jnp.asarray(scene.meas)] * 2)
    orig2 = jnp.stack([jnp.asarray(scene.orig_bayer)] * 2)
    res = two_stage_admm_batched(
        y2, scene.mask, config, prior=prior, variables=variables,
        orig_batch=orig2,
    )
    assert res.x_bayer.shape == (2,) + scene.orig_bayer.shape
    # both batch entries identical inputs -> identical outputs
    np.testing.assert_allclose(
        np.asarray(res.x_bayer[0]), np.asarray(res.x_bayer[1]), rtol=1e-6
    )
    single = two_stage_admm(
        scene.meas, scene.mask, config, prior=prior, variables=variables,
        orig_bayer=scene.orig_bayer,
    )
    np.testing.assert_allclose(
        np.asarray(res.x_bayer[0]), np.asarray(single.x_bayer), rtol=1e-4, atol=1e-6
    )


def test_end_to_end_single_dispatch(scene, tiny_ffdnet):
    from adaptivepnp_sci_tpu.solvers.end_to_end import reconstruct_single_dispatch
    from adaptivepnp_sci_tpu.solvers.gap_tv import GapTVConfig

    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    cfg = ADMMConfig(sigma=(25 / 255,), iters=(3,), denoiser="ffdnet")
    res = reconstruct_single_dispatch(
        scene.meas, scene.mask, GapTVConfig(iters=5), cfg, prior, variables,
        orig=scene.orig_bayer,
    )
    # must match the two-call pipeline
    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=5))
    ref = two_stage_admm(
        scene.meas, scene.mask, cfg, prior=prior, variables=variables,
        x0_bayer=warm.x_bayer, orig_bayer=scene.orig_bayer,
    )
    np.testing.assert_allclose(
        np.asarray(res.x_bayer), np.asarray(ref.x_bayer), rtol=1e-4, atol=1e-6
    )
    assert float(res.psnr_per_frame.mean()) == pytest.approx(
        float(ref.psnr_per_frame.mean()), abs=1e-3
    )


def test_two_stage_admm_tiled_matches_exact_for_tv(scene):
    """Tiling is exact for the TV path (prox and x-update are tile-local)."""
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    config = ADMMConfig(sigma=(0.0,), iters=(5,), denoiser="tv")
    whole = two_stage_admm(scene.meas, scene.mask, config,
                           orig_bayer=scene.orig_bayer)
    tiled = two_stage_admm_tiled(scene.meas, scene.mask, config, tile=16,
                                 orig_bayer=scene.orig_bayer)
    assert tiled.x_bayer.shape == whole.x_bayer.shape
    # the TV prox couples pixels across tile borders, so tiling perturbs the
    # solution; reconstruction quality must stay comparable
    assert float(tiled.psnr_per_frame.mean()) > float(whole.psnr_per_frame.mean()) - 1.5


def test_two_stage_admm_tiled_warm_start(scene):
    """x0_bayer warm-starts each tile with its crop of the full-size GAP-TV
    result — tile-local x-updates make this exact for the TV path, so the
    warm-started tiled solve must match the warm-started whole solve where
    the whole solve equals its own tiling (and beat the adjoint cold
    start, which stalls near init)."""
    from adaptivepnp_sci_tpu.solvers import GapTVConfig, gap_tv
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=10)).x_bayer
    config = ADMMConfig(sigma=(0.0,), iters=(4,), denoiser="tv")
    whole = two_stage_admm(scene.meas, scene.mask, config,
                           orig_bayer=scene.orig_bayer, x0_bayer=warm)
    tiled = two_stage_admm_tiled(scene.meas, scene.mask, config, tile=16,
                                 orig_bayer=scene.orig_bayer, x0_bayer=warm)
    cold = two_stage_admm_tiled(scene.meas, scene.mask, config, tile=16,
                                orig_bayer=scene.orig_bayer)
    assert float(tiled.psnr_per_frame.mean()) > \
        float(whole.psnr_per_frame.mean()) - 1.5
    assert float(tiled.psnr_per_frame.mean()) > \
        float(cold.psnr_per_frame.mean()) + 3.0


def test_two_stage_admm_tiled_ffdnet_shapes(scene, tiny_ffdnet):
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    model, variables = tiny_ffdnet
    config = ADMMConfig(sigma=(25 / 255,), iters=(2,), denoiser="ffdnet")
    res = two_stage_admm_tiled(
        scene.meas, scene.mask, config, tile=16,
        prior=ffdnet_prior(model), variables=variables,
        orig_bayer=scene.orig_bayer,
    )
    assert res.x_rgb.shape == scene.orig_rgb.shape
    assert np.isfinite(np.asarray(res.x_rgb)).all()


def test_two_stage_admm_tiled_adapt_shares_weights(scene, tiny_ffdnet):
    """Tiled + adaptation: grads are pmean-synced over the tile axis, so all
    tiles share ONE weight copy. On a scene of 4 identical tiles the pmean is
    a no-op and tiled adaptation must equal single-tile adaptation exactly."""
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    config = ADMMConfig(
        sigma=(25 / 255,), iters=(4,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2,
                          initial_iter=0),
    )
    # 2x2-tile scene of identical 16x16 tiles
    y = np.tile(scene.meas[:16, :16], (2, 2))
    phi = np.tile(scene.mask[:, :16, :16], (1, 2, 2))

    tiled = two_stage_admm_tiled(
        y, phi, config, tile=16, prior=prior, variables=variables,
    )
    single = two_stage_admm(
        scene.meas[:16, :16], scene.mask[:, :16, :16], config, prior=prior,
        variables=variables,
        key=jax.random.split(jax.random.PRNGKey(0), 4)[0],
    )
    # returned weights are the single shared copy (same treedef/shapes as in)
    for got, want in zip(
        jax.tree_util.tree_leaves(tiled.variables["params"]),
        jax.tree_util.tree_leaves(single.variables["params"]),
    ):
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    # and adaptation actually fired
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(variables["params"]),
            jax.tree_util.tree_leaves(tiled.variables["params"]),
        )
    )
    assert changed


def test_two_stage_admm_tiled_chunked(scene, tiny_ffdnet):
    """tile_chunk (sequential tile groups bounding peak HBM): fixed-weight
    chunked equals unchunked exactly (same per-tile programs, concatenated);
    with adaptation the groups run sequentially with weight carry and still
    return ONE un-stacked weight copy."""
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    fixed = ADMMConfig(sigma=(25 / 255,), iters=(2,), denoiser="ffdnet")
    kw = dict(tile=16, prior=prior, variables=variables,
              orig_bayer=scene.orig_bayer)
    full = two_stage_admm_tiled(scene.meas, scene.mask, fixed, **kw)
    chunked = two_stage_admm_tiled(scene.meas, scene.mask, fixed,
                                   tile_chunk=2, **kw)
    np.testing.assert_allclose(np.asarray(chunked.x_bayer),
                               np.asarray(full.x_bayer), atol=1e-6)
    np.testing.assert_allclose(np.asarray(chunked.x_rgb),
                               np.asarray(full.x_rgb), atol=1e-6)
    with pytest.raises(ValueError):
        two_stage_admm_tiled(scene.meas, scene.mask, fixed, tile_chunk=3,
                             **kw)
    adapt_cfg = ADMMConfig(
        sigma=(25 / 255,), iters=(4,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2,
                          initial_iter=0),
    )
    res = two_stage_admm_tiled(scene.meas, scene.mask, adapt_cfg,
                               tile_chunk=2, **kw)
    # single weight copy out (not tile- or group-stacked) and adaptation
    # actually fired through the group carry
    changed = False
    for got, want in zip(
        jax.tree_util.tree_leaves(res.variables["params"]),
        jax.tree_util.tree_leaves(variables["params"]),
    ):
        assert got.shape == want.shape
        changed = changed or not np.allclose(np.asarray(got),
                                             np.asarray(want))
    assert changed
    assert np.isfinite(np.asarray(res.x_bayer)).all()


def test_two_stage_admm_tiled_on_data_mesh(scene, tiny_ffdnet):
    """Docstring claim: the tile axis composes with a ('data',) mesh."""
    from adaptivepnp_sci_tpu.parallel import make_mesh
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    config = ADMMConfig(
        sigma=(25 / 255,), iters=(2,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=1,
                          initial_iter=0),
    )
    from adaptivepnp_sci_tpu.solvers import GapTVConfig, gap_tv

    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=5)).x_bayer
    mesh = make_mesh(data=4, frame=1)
    sharded = two_stage_admm_tiled(
        scene.meas, scene.mask, config, tile=16, prior=prior,
        variables=variables, orig_bayer=scene.orig_bayer, mesh=mesh,
        x0_bayer=warm,
    )
    local = two_stage_admm_tiled(
        scene.meas, scene.mask, config, tile=16, prior=prior,
        variables=variables, orig_bayer=scene.orig_bayer, x0_bayer=warm,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.x_bayer), np.asarray(local.x_bayer),
        rtol=1e-5, atol=1e-6,
    )


def test_crop_overlapping_cores_roundtrip():
    """Window cores tile the unpadded image exactly (crop_overlapping
    contract)."""
    from adaptivepnp_sci_tpu.ops.patches import crop_overlapping, stitch_patches

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 32, 48, 3), np.float32))
    halo, patch = 4, 16
    xp = jnp.pad(x, ((0, 0), (halo, halo), (halo, halo), (0, 0)),
                 mode="reflect")
    wins, grid = crop_overlapping(xp, patch, halo)
    assert wins.shape == (2 * 3, 2, patch + 2 * halo, patch + 2 * halo, 3)
    back = stitch_patches(
        wins[:, :, halo:halo + patch, halo:halo + patch, :], grid
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_two_stage_admm_tiled_overlap(scene):
    """Halo-overlap tiles: result has the right shape, and on the TV path
    (whose prox couples pixels across borders) carrying real context across
    tile borders must not lose quality vs hard-bordered tiles."""
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    config = ADMMConfig(sigma=(0.0,), iters=(5,), denoiser="tv")
    hard = two_stage_admm_tiled(scene.meas, scene.mask, config, tile=16,
                                orig_bayer=scene.orig_bayer)
    soft = two_stage_admm_tiled(scene.meas, scene.mask, config, tile=16,
                                orig_bayer=scene.orig_bayer, overlap=4)
    assert soft.x_bayer.shape == hard.x_bayer.shape
    assert np.isfinite(np.asarray(soft.x_bayer)).all()
    assert float(soft.psnr_per_frame.mean()) >= \
        float(hard.psnr_per_frame.mean()) - 0.05


def test_two_stage_admm_tiled_select_best_global(scene, tiny_ffdnet):
    """select_best composes with tiling via a pmean-ed residual: with a
    garbage (random-init) denoiser, candidate 0 (the warm start) wins
    GLOBALLY, so every tile returns exactly its warm-start crop — per-tile
    selection could stitch different iterations across a seam."""
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    model, variables = tiny_ffdnet
    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=10)).x_bayer
    config = ADMMConfig(sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
                        select_best=True)
    res = two_stage_admm_tiled(
        scene.meas, scene.mask, config, tile=16, prior=ffdnet_prior(model),
        variables=variables, x0_bayer=warm, orig_bayer=scene.orig_bayer,
    )
    np.testing.assert_allclose(np.asarray(res.x_bayer), np.asarray(warm),
                               atol=1e-5)


def test_two_stage_admm_batched_passthrough(scene, tiny_ffdnet):
    """key/opt_state/dm state reach the batched entry point: an adaptation
    input-noise prior must produce key-dependent results, and dm_spec
    returns per-measurement stacked demosaicker state."""
    from adaptivepnp_sci_tpu.models.ddnet import DDnet
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        make_dm_spec,
        two_stage_admm_batched,
    )

    model, variables = tiny_ffdnet
    # give the FFDNet prior FastDVD-style adaptation input noise so the
    # PRNG key is load-bearing
    prior = ffdnet_prior(model)._replace(adapt_noise_std=0.1)
    y2 = np.stack([scene.meas, scene.meas])
    config = ADMMConfig(
        sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2,
                          initial_iter=0),
    )
    dd = DDnet()
    dd_vars = dd.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 32, 32, 3)))
    spec = make_dm_spec(dd, lr=1e-6)
    r1 = two_stage_admm_batched(
        y2, scene.mask, config, prior=prior, variables=variables,
        key=jax.random.PRNGKey(5), dm_spec=spec, dm_variables=dd_vars,
    )
    r2 = two_stage_admm_batched(
        y2, scene.mask, config, prior=prior, variables=variables,
        key=jax.random.PRNGKey(9), dm_spec=spec, dm_variables=dd_vars,
    )
    assert r1.x_bayer.shape == (2,) + scene.orig_bayer.shape
    assert not np.array_equal(np.asarray(r1.x_bayer), np.asarray(r2.x_bayer))
    # dm state returned stacked over the T axis
    leaf = jax.tree_util.tree_leaves(r1.dm_variables)[0]
    assert leaf.shape[0] == 2


def test_two_stage_admm_sequence_carries_weights(scene, tiny_ffdnet):
    """Fused lax.scan over measurements: matches the sequential driver loop."""
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_sequence

    model, variables = tiny_ffdnet
    prior = ffdnet_prior(model)
    config = ADMMConfig(
        sigma=(25 / 255,), iters=(4,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2,
                          initial_iter=0),
    )
    y2 = jnp.stack([jnp.asarray(scene.meas)] * 2)
    orig2 = jnp.stack([jnp.asarray(scene.orig_bayer)] * 2)

    seq = two_stage_admm_sequence(y2, scene.mask, config, prior=prior,
                                  variables=variables, orig_seq=orig2)
    assert seq.x_bayer.shape == (2,) + scene.orig_bayer.shape

    # oracle: explicit python loop threading variables/opt_state (same keys)
    v, o = variables, None
    outs = []
    for i in range(2):
        r = two_stage_admm(
            scene.meas, scene.mask, config, prior=prior, variables=v,
            orig_bayer=scene.orig_bayer, opt_state=o,
            key=jax.random.split(jax.random.PRNGKey(0), 2)[i],
        )
        v, o = r.variables, r.opt_state
        outs.append(np.asarray(r.x_bayer))
    np.testing.assert_allclose(np.asarray(seq.x_bayer), np.stack(outs),
                               rtol=1e-4, atol=1e-6)
    # weights actually adapted across the sequence
    before = jax.tree_util.tree_leaves(variables["params"])
    after = jax.tree_util.tree_leaves(seq.variables["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_input_validation_errors(scene):
    with pytest.raises(ValueError, match="matching spatial dims"):
        two_stage_admm(scene.meas[:-2], scene.mask,
                       ADMMConfig(sigma=(0.0,), iters=(1,), denoiser="tv"))
    with pytest.raises(ValueError, match="requires a prior"):
        two_stage_admm(scene.meas, scene.mask,
                       ADMMConfig(sigma=(0.1,), iters=(1,), denoiser="ffdnet"))


def test_fastdvd_adapt_mask_changes_adaptation(scene):
    """The reference's optional masked-input ablation (gen_masked_data 'b')
    during FastDVDnet adaptation must alter the adapted weights, not crash."""
    import optax

    from adaptivepnp_sci_tpu.adapt.online import make_adapt_fn
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior

    model = FastDVDnet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)),
                           jnp.float32(0.1))
    y = jnp.asarray(scene.meas)
    phi = jnp.asarray(scene.mask)
    from adaptivepnp_sci_tpu.ops import bayer

    y_p, phi_p = bayer.pack(y), bayer.pack(phi)
    rgb = jnp.asarray(scene.orig_rgb)
    opt = optax.adam(1e-3)

    def run(prior):
        fn = make_adapt_fn(prior, opt, AdaptConfig(update_per_iter=1))
        v, _, _ = fn(variables, opt.init(variables["params"]),
                     jax.random.PRNGKey(1), rgb, jnp.float32(0.1),
                     y_p, phi_p, y, phi)
        return jax.tree_util.tree_leaves(v["params"])[0]

    plain = run(fastdvd_prior(model))
    masked = run(fastdvd_prior(model, adapt_mask=("b", 0.1)))
    assert np.isfinite(np.asarray(masked)).all()
    assert not np.allclose(np.asarray(plain), np.asarray(masked))


def test_solver_with_menon_demosaic(scene, tiny_ffdnet):
    """demosaic_method='menon2007' path compiles and reconstructs."""
    model, variables = tiny_ffdnet
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

    cfg = ADMMConfig(sigma=(25 / 255,), iters=(2,), denoiser="ffdnet",
                     demosaic_method="menon2007")
    res = two_stage_admm(scene.meas, scene.mask, cfg,
                         prior=ffdnet_prior(model), variables=variables,
                         x0_bayer=scene.orig_bayer,
                         orig_bayer=scene.orig_bayer)
    assert np.isfinite(np.asarray(res.x_bayer)).all()
    assert res.x_rgb.shape == scene.orig_bayer.shape + (3,)


def test_denoiser_relax(scene, tiny_ffdnet):
    """relax=1 is the reference step; relax<1 averages toward the input
    and changes the trajectory."""
    model, variables = tiny_ffdnet
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

    base = ADMMConfig(sigma=(25 / 255,), iters=(3,), denoiser="ffdnet")
    same = ADMMConfig(sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
                      denoiser_relax=1.0)
    relaxed = ADMMConfig(sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
                         denoiser_relax=0.5)
    kw = dict(prior=ffdnet_prior(model), variables=variables,
              x0_bayer=scene.orig_bayer)
    a = two_stage_admm(scene.meas, scene.mask, base, **kw)
    b = two_stage_admm(scene.meas, scene.mask, same, **kw)
    c = two_stage_admm(scene.meas, scene.mask, relaxed, **kw)
    np.testing.assert_array_equal(np.asarray(a.x_bayer), np.asarray(b.x_bayer))
    assert not np.allclose(np.asarray(a.x_bayer), np.asarray(c.x_bayer))
    assert np.isfinite(np.asarray(c.x_bayer)).all()


def test_denoiser_relax_per_stage(scene, tiny_ffdnet):
    """A per-sigma-stage relax tuple: an all-ones tuple equals the scalar
    reference step bitwise; damping only stage 1 changes the trajectory; a
    wrong-length tuple errors."""
    model, variables = tiny_ffdnet
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

    kw = dict(prior=ffdnet_prior(model), variables=variables,
              x0_bayer=scene.orig_bayer)
    mk = lambda r: ADMMConfig(  # noqa: E731
        sigma=(25 / 255, 12 / 255), iters=(2, 2), denoiser="ffdnet",
        denoiser_relax=r)
    a = two_stage_admm(scene.meas, scene.mask, mk(1.0), **kw)
    b = two_stage_admm(scene.meas, scene.mask, mk((1.0, 1.0)), **kw)
    c = two_stage_admm(scene.meas, scene.mask, mk((0.5, 1.0)), **kw)
    np.testing.assert_array_equal(np.asarray(a.x_bayer), np.asarray(b.x_bayer))
    assert not np.allclose(np.asarray(a.x_bayer), np.asarray(c.x_bayer))
    with pytest.raises(ValueError, match="relax stages"):
        two_stage_admm(scene.meas, scene.mask, mk((0.5,)), **kw)


def test_select_best_never_below_warm_start(scene):
    """The measurement-consistency fallback (ADMMConfig.select_best): with a
    RANDOM-INIT denoiser that actively destroys the iterate, the returned
    estimate stays at the warm start's quality (candidate 0), while the plain
    reference semantics degrade far below it."""
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior

    model = FastDVDnet()
    variables = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 5, 8, 8, 3)), jnp.float32(0.1)
    )
    prior = fastdvd_prior(model)
    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=20),
                  orig_bayer=scene.orig_bayer)
    warm_db = float(warm.psnr_per_frame.mean())
    kw = dict(prior=prior, variables=variables, x0_bayer=warm.x_bayer,
              orig_bayer=scene.orig_bayer)
    plain = two_stage_admm(
        scene.meas, scene.mask,
        ADMMConfig(sigma=(30 / 255,), iters=(6,), denoiser="fastdvd"), **kw)
    guarded = two_stage_admm(
        scene.meas, scene.mask,
        ADMMConfig(sigma=(30 / 255,), iters=(6,), denoiser="fastdvd",
                   select_best=True), **kw)
    assert float(plain.psnr_per_frame.mean()) < warm_db - 3.0
    assert float(guarded.psnr_per_frame.mean()) >= warm_db - 0.05
    # the guarded RGB output matches the selected Bayer iterate
    np.testing.assert_allclose(
        np.asarray(bayer.rggb_subsample(jnp.clip(guarded.x_rgb, 0, 1))),
        np.asarray(bayer.pack(jnp.asarray(guarded.x_bayer))), atol=1e-5)


def test_select_best_tv_path(scene):
    """select_best on the TV branch: finite, and at least warm-start grade."""
    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=20),
                  orig_bayer=scene.orig_bayer)
    res = two_stage_admm(
        scene.meas, scene.mask,
        ADMMConfig(sigma=(0.0,), iters=(8,), denoiser="tv", select_best=True),
        x0_bayer=warm.x_bayer, orig_bayer=scene.orig_bayer)
    assert float(res.psnr_per_frame.mean()) >= \
        float(warm.psnr_per_frame.mean()) - 0.5


def test_select_best_holdout_protection(scene):
    """The held-out CV guard (select_best_holdout) keeps the raw guard's
    pin-to-warm-start protection: with a random-init denoiser destroying the
    iterate, the returned estimate stays at warm-start quality (the warm
    start is still candidate 0 and is itself computed from FULL data)."""
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior

    model = FastDVDnet()
    variables = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 5, 8, 8, 3)), jnp.float32(0.1)
    )
    prior = fastdvd_prior(model)
    warm = gap_tv(scene.meas, scene.mask, GapTVConfig(iters=20),
                  orig_bayer=scene.orig_bayer)
    guarded = two_stage_admm(
        scene.meas, scene.mask,
        ADMMConfig(sigma=(30 / 255,), iters=(6,), denoiser="fastdvd",
                   select_best=True, select_best_holdout=0.1),
        prior=prior, variables=variables, x0_bayer=warm.x_bayer,
        orig_bayer=scene.orig_bayer)
    assert float(guarded.psnr_per_frame.mean()) >= \
        float(warm.psnr_per_frame.mean()) - 0.05


def test_select_best_holdout_excludes_pixels_from_data_term(scene):
    """Mechanism check: with select_best_holdout, the held-out pixels must
    be OUT of the solve's data term — corrupting y at exactly those pixels
    may change which iterate is selected (they drive the ranking) but must
    not change the iterates themselves (identical per-iteration trace)."""
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior

    model = FastDVDnet()
    variables = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 5, 8, 8, 3)), jnp.float32(0.1)
    )
    prior = fastdvd_prior(model)
    cfg = ADMMConfig(sigma=(30 / 255,), iters=(4,), denoiser="fastdvd",
                     select_best=True, select_best_holdout=0.25,
                     select_best_seed=7)
    hold = np.asarray(jax.random.bernoulli(
        jax.random.PRNGKey(7), 0.25, scene.meas.shape)).astype(np.float32)
    assert hold.sum() > 0
    y_corrupt = np.asarray(scene.meas) + hold * 0.37
    kw = dict(prior=prior, variables=variables,
              x0_bayer=scene.orig_bayer * 0.9, orig_bayer=scene.orig_bayer)
    a = two_stage_admm(scene.meas, scene.mask, cfg, **kw)
    b = two_stage_admm(y_corrupt, scene.mask, cfg, **kw)
    np.testing.assert_allclose(np.asarray(a.psnr_trace),
                               np.asarray(b.psnr_trace), atol=1e-5)
    # ...while with holdout OFF the same corruption changes the iterates
    cfg_raw = ADMMConfig(sigma=(30 / 255,), iters=(4,), denoiser="fastdvd",
                         select_best=True)
    c = two_stage_admm(scene.meas, scene.mask, cfg_raw, **kw)
    d = two_stage_admm(y_corrupt, scene.mask, cfg_raw, **kw)
    assert not np.allclose(np.asarray(c.psnr_trace), np.asarray(d.psnr_trace),
                           atol=1e-5)


def test_tiled_no_adapt_returns_unstacked_variables(scene, tiny_ffdnet):
    """With adaptation OFF the tiled solver must still return ONE weight
    copy (vmap would otherwise broadcast a tile-stacked pytree, which
    run_reconstruction carries into the next measurement and crashes the
    denoiser apply)."""
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import two_stage_admm_tiled

    model, variables = tiny_ffdnet
    config = ADMMConfig(sigma=(25 / 255,), iters=(2,), denoiser="ffdnet")
    res = two_stage_admm_tiled(
        scene.meas, scene.mask, config, tile=16,
        prior=ffdnet_prior(model), variables=variables,
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(res.variables["params"]),
        jax.tree_util.tree_leaves(variables["params"]),
    ):
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
