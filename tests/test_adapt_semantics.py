"""Reference-faithful optimizer semantics for online adaptation.

The reference constructs a FRESH torch Adam at every trigger
(``/root/reference/packages/ffdnet/test_ffdnet_ipol.py:250-251``), per lr
stage for FastDVDnet (``packages/fastdvdnet/test_fastdvdnet.py:383-385``
with per-stage ``lr_all``/``n_update_iter`` lists, ``:344-349``) and per
update STEP for DDnet (``packages/DDnet/DDnet_test.py:278-281``); its dormant
``fix`` mode scopes FastDVDnet fine-tuning to ``temp2`` only
(``test_fastdvdnet.py:365-373``). These tests pin the repo's encodings of
each against manual optax ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from adaptivepnp_sci_tpu.adapt.online import (
    AdaptConfig,
    default_adam,
    first_lr,
    make_adapt_fn,
    resolve_stages,
)
from adaptivepnp_sci_tpu.data.synthetic import make_scene
from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
from adaptivepnp_sci_tpu.ops import bayer
from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior


@pytest.fixture(scope="module")
def scene():
    return make_scene(b=4, h=32, w=32, seed=7)


@pytest.fixture(scope="module")
def setup(scene):
    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=4)
    rgb = jnp.asarray(scene.orig_rgb)
    variables = model.init(jax.random.PRNGKey(0), rgb, jnp.float32(0.1))
    y = jnp.asarray(scene.meas)
    phi = jnp.asarray(scene.mask)
    args = dict(
        rgb=rgb,
        y_p=bayer.pack(y),
        phi_p=bayer.pack(phi),
        y=y,
        phi=phi,
        sigma=jnp.float32(0.1),
    )
    return model, variables, args


def _call(fn, variables, opt_state, args):
    return fn(
        variables,
        opt_state,
        jax.random.PRNGKey(1),
        args["rgb"],
        args["sigma"],
        args["y_p"],
        args["phi_p"],
        args["y"],
        args["phi"],
    )


def _leaves(v):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(v["params"])]


def test_resolve_stages_broadcast_and_errors():
    assert resolve_stages(AdaptConfig(lr=2e-6, update_per_iter=2)) == ((2e-6, 2),)
    assert resolve_stages(
        AdaptConfig(lr=(1e-3, 1e-4), update_per_iter=2)
    ) == ((1e-3, 2), (1e-4, 2))
    assert resolve_stages(
        AdaptConfig(lr=1e-3, update_per_iter=(3, 1))
    ) == ((1e-3, 3), (1e-3, 1))
    assert first_lr(AdaptConfig(lr=(5e-7, 2e-7))) == 5e-7
    # a zero stage-0 lr must not become the rescale base (0/0): base is the
    # first NONZERO lr; all-zero schedules fall back to 1.0 (updates all
    # rescale to zero anyway)
    assert first_lr(AdaptConfig(lr=(0.0, 1e-4))) == 1e-4
    assert first_lr(AdaptConfig(lr=(0.0, 0.0))) == 1.0
    with pytest.raises(ValueError, match="broadcast"):
        resolve_stages(AdaptConfig(lr=(1e-3, 1e-4), update_per_iter=(1, 2, 3)))


def test_stage_lists_reject_non_default_optimizer(setup):
    """Per-stage lr rescaling (lr_i/base) is only exact relative to the
    default Adam's base lr — a custom optimizer must be rejected, not
    silently mis-scaled."""
    model, variables, args = setup
    cfg = AdaptConfig(lr=(1e-3, 1e-4), update_per_iter=1)
    with pytest.raises(ValueError, match="default Adam"):
        make_adapt_fn(ffdnet_prior(model), optax.adam(1e-3), cfg)


def test_zero_lr_first_stage_is_noop_stage(setup):
    """lr=(0, x): stage 0 must be an exact no-op (updates rescaled to 0),
    stage 1 a real Adam(x) stage — the previous lr_i/lr_0 rescale divided
    by zero here."""
    model, variables, args = setup
    prior = ffdnet_prior(model)
    cfg = AdaptConfig(lr=(0.0, 1e-3), update_per_iter=(2, 1),
                      fresh_opt_per_trigger=True)
    opt = default_adam(first_lr(cfg))
    fn = make_adapt_fn(prior, opt, cfg)
    got, _, _ = _call(fn, variables, opt.init(variables["params"]), args)

    cfg_one = AdaptConfig(lr=1e-3, update_per_iter=1,
                          fresh_opt_per_trigger=True)
    fn_one = make_adapt_fn(prior, default_adam(first_lr(cfg_one)), cfg_one)
    want, _, _ = _call(fn_one, variables,
                       default_adam(1e-3).init(variables["params"]), args)
    for a, b in zip(_leaves(got), _leaves(want)):
        np.testing.assert_array_equal(a, b)


def test_fresh_opt_ignores_incoming_state(setup):
    """fresh_opt_per_trigger must produce identical weights whether handed a
    pristine or a momentum-laden optimizer state (proving the in-trigger
    reset, test_ffdnet_ipol.py:250-251 semantics)."""
    model, variables, args = setup
    opt = optax.adam(1e-3)
    fn = make_adapt_fn(
        ffdnet_prior(model), opt,
        AdaptConfig(lr=1e-3, update_per_iter=2, fresh_opt_per_trigger=True),
    )
    clean_state = opt.init(variables["params"])
    # fabricate a dirty state by running two unrelated updates
    dirty_state = clean_state
    g = jax.tree_util.tree_map(jnp.ones_like, variables["params"])
    for _ in range(2):
        _, dirty_state = opt.update(g, dirty_state, variables["params"])

    v_clean, _, _ = _call(fn, variables, clean_state, args)
    v_dirty, _, _ = _call(fn, variables, dirty_state, args)
    for a, b in zip(_leaves(v_clean), _leaves(v_dirty)):
        np.testing.assert_array_equal(a, b)

    # carried mode (the opt-in extension) must depend on the incoming state
    fn_carried = make_adapt_fn(
        ffdnet_prior(model), opt,
        AdaptConfig(lr=1e-3, update_per_iter=2, fresh_opt_per_trigger=False),
    )
    v_c1, _, _ = _call(fn_carried, variables, clean_state, args)
    v_c2, _, _ = _call(fn_carried, variables, dirty_state, args)
    assert any(
        not np.allclose(a, b) for a, b in zip(_leaves(v_c1), _leaves(v_c2))
    )


def test_stage_lists_match_manual_per_stage_adam(setup):
    """lr=(a,b) / update_per_iter=(m,n) with fresh_opt replays the reference
    loop: fresh Adam(a) x m steps, then fresh Adam(b) x n steps."""
    model, variables, args = setup
    prior = ffdnet_prior(model)
    cfg = AdaptConfig(
        lr=(1e-3, 2e-4), update_per_iter=(2, 1), fresh_opt_per_trigger=True
    )
    opt = default_adam(first_lr(cfg))
    fn = make_adapt_fn(prior, opt, cfg)
    got, _, _ = _call(fn, variables, opt.init(variables["params"]), args)

    # manual ground truth with stage-local optax.adam instances
    from adaptivepnp_sci_tpu.adapt.online import measurement_loss_fn

    want = variables
    for lr_i, n_i in ((1e-3, 2), (2e-4, 1)):
        stage_opt = optax.adam(lr_i)
        params = want["params"]
        state = stage_opt.init(params)
        loss = measurement_loss_fn(
            prior, args["rgb"], args["sigma"], args["y_p"], args["phi_p"],
            args["y"], args["phi"],
        )
        for _ in range(n_i):
            grads = jax.grad(lambda p: loss({"params": p}))(params)
            updates, state = stage_opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        want = {"params": params}
    for a, b in zip(_leaves(got), _leaves(want)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)


def test_trainable_filter_freezes_out_of_scope(setup):
    """With a path filter, out-of-scope parameters are bitwise unchanged and
    in-scope parameters move (reference fix mode, test_fastdvdnet.py:365-373)."""
    model, variables, args = setup
    names = sorted(variables["params"].keys())
    target = names[0]  # first conv module
    fn = make_adapt_fn(
        ffdnet_prior(model),
        optax.adam(1e-2),
        AdaptConfig(lr=1e-2, update_per_iter=1, trainable_filter=(target,)),
    )
    opt_state = optax.adam(1e-2).init(variables["params"])
    v, _, _ = _call(fn, variables, opt_state, args)
    moved = frozen_ok = True
    for name in names:
        before = jax.tree_util.tree_leaves(variables["params"][name])
        after = jax.tree_util.tree_leaves(v["params"][name])
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        if name == target:
            moved = moved and not same
        else:
            frozen_ok = frozen_ok and same
    assert moved, "in-scope params did not adapt"
    assert frozen_ok, "out-of-scope params changed"


def test_admm_solver_accepts_fresh_and_staged_config(scene):
    """The whole-solver path compiles and runs with the reference-faithful
    config (fresh opt + lr stages) and produces a different trajectory from
    carried-Adam mode."""
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm

    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.float32(0.1)
    )
    prior = ffdnet_prior(model)

    def run(adapt):
        cfg = ADMMConfig(sigma=(0.1, 0.05), iters=(4, 3), denoiser="ffdnet",
                         adapt=adapt)
        return two_stage_admm(
            scene.meas, scene.mask, cfg, prior=prior, variables=variables,
            x0_bayer=scene.orig_bayer, orig_bayer=scene.orig_bayer,
        )

    res_fresh = run(AdaptConfig(lr=(1e-3, 5e-4), update_per_iter=(1, 1),
                                interval_iter=2, initial_iter=0,
                                fresh_opt_per_trigger=True))
    res_carried = run(AdaptConfig(lr=1e-3, update_per_iter=2,
                                  interval_iter=2, initial_iter=0,
                                  fresh_opt_per_trigger=False))
    assert np.isfinite(np.asarray(res_fresh.x_bayer)).all()
    assert not np.allclose(
        np.asarray(res_fresh.x_bayer), np.asarray(res_carried.x_bayer)
    )


@pytest.mark.parametrize(
    "interval,initial",
    [
        (1, 0),   # dense: fires every iteration from k=1 (max unrolling)
        (6, 0),   # single trigger at the FINAL iteration (trailing segment empty)
        (2, 0),   # k=2,4,6 — includes the final iteration and 2-long segments
    ],
)
def test_segmented_schedule_lr0_matches_no_adapt(scene, interval, initial):
    """lr=0 adaptation must reproduce the no-adaptation trajectory exactly.

    The solver lays the schedule out as lax.scan segments split at the
    static trigger iterations (two_stage_admm.py segment loop); an
    off-by-one in the sigma/k/relax slices, a dropped iteration at a
    segment boundary, or a mis-ordered trace concatenation would shift the
    schedule and break this bit-for-bit equality. Trigger placements cover
    the edges: dense masks, a trigger at the final iteration (empty
    trailing segment), and triggers spaced mid-schedule.
    """
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm

    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.float32(0.1)
    )
    prior = ffdnet_prior(model)

    def run(adapt):
        cfg = ADMMConfig(sigma=(0.1, 0.05), iters=(4, 3), denoiser="ffdnet",
                         adapt=adapt)
        return two_stage_admm(
            scene.meas, scene.mask, cfg, prior=prior, variables=variables,
            x0_bayer=scene.orig_bayer, orig_bayer=scene.orig_bayer,
        )

    ref = run(None)
    res = run(AdaptConfig(lr=0.0, update_per_iter=1, interval_iter=interval,
                          initial_iter=initial))
    np.testing.assert_array_equal(
        np.asarray(res.x_bayer), np.asarray(ref.x_bayer)
    )
    np.testing.assert_array_equal(
        np.asarray(res.psnr_trace), np.asarray(ref.psnr_trace)
    )


def test_adapt_crop_full_size_is_exact():
    """AdaptConfig.crop == frame size: the only possible offset is 0 and the
    'crop' is the whole frame — weights must be BIT-IDENTICAL to crop=None
    (guards slicing/packing consistency of the crop path)."""
    import numpy as np
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

    sc = make_scene(b=4, h=32, w=32, seed=11)
    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                           jnp.float32(0.1))
    prior = ffdnet_prior(model)
    kw = dict(prior=prior, variables=variables)

    def run(crop):
        cfg = ADMMConfig(
            sigma=(25 / 255,), iters=(4,), denoiser="ffdnet",
            use_pallas=False,
            adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2,
                              initial_iter=0, crop=crop))
        return two_stage_admm(jnp.asarray(sc.meas), jnp.asarray(sc.mask),
                              cfg, **kw)

    full = run(None)
    crop_full = run(32)
    for a, b in zip(jax.tree_util.tree_leaves(full.variables["params"]),
                    jax.tree_util.tree_leaves(crop_full.variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(full.x_bayer),
                                  np.asarray(crop_full.x_bayer))

    # half-size crop: still adapts (weights move), output stays finite and
    # in the same quality regime as full-frame adaptation
    crop_half = run(16)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                        jax.tree_util.tree_leaves(
                            crop_half.variables["params"]))
    )
    assert np.isfinite(np.asarray(crop_half.x_bayer)).all()
    assert abs(float(crop_half.psnr_per_frame.mean())
               - float(full.psnr_per_frame.mean())) < 1.0

    with pytest.raises(ValueError, match="crop"):
        run(64)
    with pytest.raises(ValueError, match="even"):
        run(15)
