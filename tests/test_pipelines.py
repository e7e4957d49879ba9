"""Config tables, .mat I/O round trips, and the multi-measurement driver."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptivepnp_sci_tpu.configs import (
    FASTDVD_SCENES,
    FFDNET_SCENES,
    SCENE_NAMES,
    admm_config_for,
)
from adaptivepnp_sci_tpu.data.mat_io import (
    SceneData,
    load_cacti_mat,
    load_warm_start,
    save_results,
    save_warm_start,
)
from adaptivepnp_sci_tpu.data.synthetic import make_scene


def test_all_scenes_have_configs():
    for name in SCENE_NAMES:
        for dd in (False, True):
            assert FFDNET_SCENES[name][dd].sigma
            assert FASTDVD_SCENES[name][dd].sigma
            cfg = admm_config_for(name, "ffdnet", dd)
            assert len(cfg.sigma) == len(cfg.iters)


def test_reference_table_spot_checks():
    """Spot-check transcription against the driver sources."""
    beauty = FFDNET_SCENES["Beauty"][True]
    assert beauty.iters == (6, 6, 4) and beauty.interval_iter == 6
    traffic = FASTDVD_SCENES["Traffic"][True]
    assert traffic.sigma == (25 / 255, 12 / 255, 6 / 255)
    assert traffic.iters == (36, 6, 2) and traffic.interval_iter == 43
    b = FASTDVD_SCENES["Beauty"][False]
    assert b.update_times == 1 and b.sigma == (8 / 255,)


def test_admm_config_rho_tau_rules():
    cfg = admm_config_for("Beauty", "fastdvd", False)
    assert cfg.rho == 0.55 and cfg.tau == 100.0
    cfg = admm_config_for("Beauty", "ffdnet", False)
    assert cfg.rho == 1.0 and cfg.alpha == 1.0


def test_warm_start_mat_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    recon = rng.random((2, 4, 8, 8)).astype(np.float32)  # (T, B, H, W)
    path = str(tmp_path / "warm.mat")
    save_warm_start(path, recon)
    back = load_warm_start(path, n_frames=4)
    np.testing.assert_allclose(back, recon, rtol=1e-6)


def test_results_mat_write(tmp_path):
    import scipy.io as sio

    x = np.zeros((1, 4, 8, 8), np.float32)
    rgb = np.zeros((1, 4, 8, 8, 3), np.float32)
    path = str(tmp_path / "res.mat")
    orig_real = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
    save_results(path, x, rgb, np.ones((1, 4)), np.ones((1, 4)),
                 np.zeros((1, 10)), orig_real=orig_real,
                 meas_bayer=np.zeros((8, 8, 1), np.float32))
    back = sio.loadmat(path)
    assert back["v_recon_bayer"].shape == (8, 8, 4)
    assert back["psnr_all_iter"].shape == (1, 10)
    np.testing.assert_allclose(back["orig_real"], orig_real)
    assert back["meas_bayer"].shape == (8, 8, 1)


def test_cacti_mat_v5_loader(tmp_path):
    import scipy.io as sio

    s = make_scene(b=4, h=16, w=16, seed=0)
    path = str(tmp_path / "scene.mat")
    sio.savemat(
        path,
        {
            # real CACTI files store 0-255-scaled data (driver divides /MAXB)
            "meas_bayer": s.meas.astype(np.float32) * 255.0,       # (H, W)
            "mask_bayer": np.transpose(s.mask, (1, 2, 0)),         # (H, W, B)
            "orig_bayer": np.transpose(s.orig_bayer, (1, 2, 0)) * 255.0,
        },
    )
    data = load_cacti_mat(path, "synth")
    assert data.meas.shape == (1, 16, 16)
    assert data.mask.shape == (4, 16, 16)
    assert data.orig_bayer.shape == (1, 4, 16, 16)
    np.testing.assert_allclose(data.meas[0], s.meas, rtol=1e-6)
    np.testing.assert_allclose(data.mask, s.mask)
    np.testing.assert_allclose(data.orig_bayer[0], s.orig_bayer, rtol=1e-6)


def test_cacti_mat_v73_loader(tmp_path):
    h5py = pytest.importorskip("h5py")

    s = make_scene(b=4, h=16, w=16, seed=1, n_meas=2)
    path = str(tmp_path / "scene73.mat")
    orig = s.orig_bayer.reshape(8, 16, 16)
    orig_real = s.orig_rgb.astype(np.float32)  # raw 'orig', carried verbatim
    with h5py.File(path, "w") as f:
        # v7.3 files present arrays transposed relative to MATLAB shape
        f["meas_bayer"] = np.transpose(s.meas, (2, 1, 0)) * 255.0  # (T, W, H)
        f["mask_bayer"] = np.transpose(s.mask, (0, 2, 1))          # (B, W, H)
        f["orig_bayer"] = np.transpose(orig, (0, 2, 1)) * 255.0    # (T*B, W, H)
        f["orig"] = orig_real
    data = load_cacti_mat(path, "synth73")
    assert data.meas.shape == (2, 16, 16)
    np.testing.assert_allclose(data.meas[0], s.meas[..., 0], rtol=1e-6)
    np.testing.assert_allclose(data.mask, s.mask)
    np.testing.assert_allclose(
        data.orig_bayer.reshape(8, 16, 16), orig, rtol=1e-6
    )
    # the RGB ground truth is carried verbatim (driver :169 -> :329)
    np.testing.assert_allclose(data.orig_real, orig_real)


def test_dark_float_scene_still_scaled(tmp_path):
    """Regression: a float-stored 0-255 scene whose max is < 510 (e.g. a dark
    scene peaking at ~200) must STILL be divided by 255 — the drivers divide
    unconditionally (two_stage_ADMM_Online_FFD_Warm.py:245-248)."""
    h5py = pytest.importorskip("h5py")

    s = make_scene(b=4, h=16, w=16, seed=2)
    dark_meas = s.meas.astype(np.float32) * 0.2 * 255.0   # peak ~0.2*B*255
    path = str(tmp_path / "dark.mat")
    with h5py.File(path, "w") as f:
        f["meas_bayer"] = dark_meas.T
        f["mask_bayer"] = np.transpose(s.mask, (0, 2, 1))
        f["orig_bayer"] = (
            np.transpose(s.orig_bayer, (0, 2, 1)) * 0.2 * 255.0
        )
    data = load_cacti_mat(path, "dark")
    np.testing.assert_allclose(data.meas[0], s.meas * 0.2, rtol=1e-5)
    np.testing.assert_allclose(data.orig_bayer[0], s.orig_bayer * 0.2,
                               rtol=1e-5)
    # and maxb=1.0 opts out for data already in [0, 1]
    with h5py.File(str(tmp_path / "unit.mat"), "w") as f:
        f["meas_bayer"] = s.meas.T
        f["mask_bayer"] = np.transpose(s.mask, (0, 2, 1))
    unit = load_cacti_mat(str(tmp_path / "unit.mat"), "unit", maxb=1.0)
    np.testing.assert_allclose(unit.meas[0], s.meas, rtol=1e-6)


def test_run_reconstruction_carries_model(tmp_path):
    """Driver loop: adapted weights from measurement t feed measurement t+1."""
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.pipelines import run_reconstruction
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig

    s = make_scene(b=4, h=16, w=16, seed=2, n_meas=2)
    scene = SceneData("synth", s.meas.transpose(2, 0, 1) if s.meas.ndim == 3
                      else s.meas[None], s.mask, s.orig_bayer)

    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                           jnp.float32(0.1))
    prior = ffdnet_prior(model)
    config = ADMMConfig(
        sigma=(25 / 255,), iters=(4,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-4, update_per_iter=1, interval_iter=2,
                          initial_iter=0),
    )
    out = run_reconstruction(scene, prior, variables, config=config)
    assert out.x_bayer.shape == (2, 4, 16, 16)
    before = jax.tree_util.tree_leaves(variables["params"])
    after = jax.tree_util.tree_leaves(out.variables["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_select_demosaicker_plumbing():
    """Ground-truth-free demosaicker selection: the held-out-CV probe runs
    both paths with adaptation stripped, returns finite residuals, and picks
    a valid name. (Whether the pick matches the PSNR oracle is a full-scale
    question — validated on all six 512² stand-ins in RESULTS.md round 5,
    scripts/ab_demosaic_select.py.)"""
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.models.ddnet import DDnet
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.pipelines import (
        probe_demosaic_residuals,
        select_demosaicker,
    )
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig

    s = make_scene(b=4, h=16, w=16, seed=5)
    scene = SceneData("synth", s.meas[None], s.mask, s.orig_bayer[None])

    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                           jnp.float32(0.1))
    prior = ffdnet_prior(model)
    dd = DDnet()
    dd_vars = dd.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 16, 16, 3)))
    # adapt set on purpose: the probe must strip it (fixed-weight solves)
    cfg = ADMMConfig(
        sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-5, update_per_iter=1, interval_iter=1),
    )
    r_m, r_d = probe_demosaic_residuals(
        s.meas, s.mask, s.orig_bayer * 0.9, prior, variables, dd, dd_vars,
        cfg, cfg,
    )
    assert np.isfinite(r_m) and np.isfinite(r_d) and r_m != r_d
    pick = select_demosaicker(scene, prior, variables, dd, dd_vars,
                              config_malvar=cfg, config_ddnet=cfg)
    assert pick in ("malvar", "ddnet")


def test_select_prior_variables_picks_lower_residual():
    """Weight-variant auto-select: (a) ranks by held-out residual — a
    variant that IS the identity-ish denoiser vs one returning garbage must
    resolve to the better one; (b) strips adaptation; (c) returns a key of
    the candidates dict."""
    from adaptivepnp_sci_tpu.adapt.online import AdaptConfig
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.pipelines import (
        holdout_cv_residuals,
        select_prior_variables,
    )
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import ADMMConfig

    s = make_scene(b=4, h=16, w=16, seed=7)
    scene = SceneData("synth", s.meas[None], s.mask, s.orig_bayer[None])

    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    good = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                      jnp.float32(0.1))
    # garbage variant: huge weights -> wildly off-measurement iterates
    bad = jax.tree_util.tree_map(lambda p: p * 50.0 + 3.0, good)
    prior = ffdnet_prior(model)
    cfg = ADMMConfig(
        sigma=(25 / 255,), iters=(3,), denoiser="ffdnet",
        adapt=AdaptConfig(lr=1e-5, update_per_iter=1, interval_iter=1),
    )
    resids = holdout_cv_residuals(
        s.meas, s.mask, s.orig_bayer * 0.9,
        [dict(config=cfg, prior=prior, variables=v) for v in (good, bad)],
    )
    assert all(np.isfinite(r) for r in resids) and resids[0] < resids[1]
    pick = select_prior_variables(
        scene, prior, {"good": good, "bad": bad}, config=cfg,
        warm_start=(s.orig_bayer * 0.9)[None],
    )
    assert pick == "good"


def test_adapted_state_roundtrip(tmp_path):
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.pipelines import load_adapted_state, save_adapted_state

    model = FFDNet(in_nc=3, out_nc=3, nc=4, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                           jnp.float32(0.1))
    path = str(tmp_path / "adapted")
    save_adapted_state(path, variables)
    back, _ = load_adapted_state(path, variables)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_git_revision():
    from adaptivepnp_sci_tpu.utils.logging import git_revision

    rev = git_revision("/root/repo")
    assert len(rev) == 40 or rev == "unknown"


def test_run_all_scenes_smoke(tmp_path, monkeypatch):
    """The six-scene reproduction driver (scripts/run_all_scenes.py) runs the
    full warmstart -> .mat handoff -> per-scene-table reconstruction chain.
    One scene at toy scale with a random-init denoiser; the 512^2 run of the
    same code produces SCENES.md."""
    import importlib.util
    import os

    monkeypatch.chdir("/root/repo")  # script + weight paths are repo-relative
    spec = importlib.util.spec_from_file_location(
        "run_all_scenes", "scripts/run_all_scenes.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_dir = str(tmp_path / "scenes")
    rows = mod.main(out_dir=out_dir, b=4, h=32, w=32, n_meas=1,
                    scenes=["Beauty"], random_init=True)
    assert len(rows) == 1
    name, mode, style = rows[0][:3]
    assert (name, mode, style) == ("Beauty", "ffd", "photo")
    assert os.path.exists(os.path.join(out_dir, "_Admm_tv_Beauty8.mat"))
    assert os.path.exists(os.path.join(out_dir, "Beauty8_online_ffd.mat"))
    # final PSNR is a real number and the warm start did something
    assert np.isfinite(rows[0][6]) and rows[0][5] > 5.0


def test_run_all_scenes_fastdvd_dd_mode(tmp_path, monkeypatch):
    """Mode dispatch: the FastDVD driver with deep_demosaicking wires the
    DDnet demosaicker + the FASTDVD_SCENES table row through the script."""
    import importlib.util
    import os

    monkeypatch.chdir("/root/repo")
    spec = importlib.util.spec_from_file_location(
        "run_all_scenes", "scripts/run_all_scenes.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_dir = str(tmp_path / "scenes")
    rows = mod.main(out_dir=out_dir, mode="fastdvd-dd", b=4, h=32, w=32,
                    n_meas=1, scenes=["Traffic"], random_init=True)
    assert len(rows) == 1
    assert rows[0][:2] == ("Traffic", "fastdvd-dd")
    # Traffic's FastDVD deep_demosaicking row: sigma 25/12/6, iters 36/6/2
    assert rows[0][3] == "25/12/6" and rows[0][4] == "36/6/2"
    assert os.path.exists(os.path.join(out_dir, "Traffic8_online_fastdvd-dd.mat"))
    assert np.isfinite(rows[0][6])
