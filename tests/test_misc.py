"""Window variants, VGG features, profiling helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.models.feature import (
    VGGFeatures,
    perceptual_loss,
    vgg_variables_from_torch,
)
from adaptivepnp_sci_tpu.solvers.priors import window_indices_mirror
from adaptivepnp_sci_tpu.utils.profiling import StepTimer


def test_window_indices_mirror():
    idx = np.asarray(window_indices_mirror(8, 5))
    np.testing.assert_array_equal(idx[0], [2, 1, 0, 1, 2])
    np.testing.assert_array_equal(idx[1], [1, 0, 1, 2, 3])
    np.testing.assert_array_equal(idx[4], [2, 3, 4, 5, 6])
    np.testing.assert_array_equal(idx[7], [5, 6, 7, 6, 5])


def test_vgg_features_shapes(rng):
    model = VGGFeatures(feature_layer=8)  # through conv/relu of block 2
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    f = model.apply(variables, x)
    assert f.shape[0] == 1 and f.shape[-1] == 128


def test_vgg_converter_roundtrip(rng):
    # fabricate a torchvision-style partial state dict
    sd = {
        "features.0.weight": rng.random((64, 3, 3, 3), dtype=np.float32),
        "features.0.bias": rng.random(64, dtype=np.float32),
        "features.2.weight": rng.random((64, 64, 3, 3), dtype=np.float32),
        "features.2.bias": rng.random(64, dtype=np.float32),
    }
    variables = vgg_variables_from_torch(sd)
    assert variables["params"]["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    model = VGGFeatures(feature_layer=3)
    x = jnp.zeros((1, 16, 16, 3))
    f = model.apply(variables, x)
    assert f.shape == (1, 16, 16, 64)


def test_perceptual_loss_zero_for_identical(rng):
    model = VGGFeatures(feature_layer=3)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert float(perceptual_loss(variables, model, x, x)) == 0.0


def test_step_timer():
    t = StepTimer()
    with t.measure() as h:
        h["out"] = jnp.ones((8, 8)) * 2
    assert len(t.history) == 1 and t.best > 0


def test_solver_menon_demosaic_option():
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior

    scene = make_scene(b=4, h=16, w=16, seed=5)
    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                           jnp.float32(0.1))
    cfg = ADMMConfig(sigma=(25 / 255,), iters=(2,), denoiser="ffdnet",
                     demosaic_method="menon2007")
    res = two_stage_admm(scene.meas, scene.mask, cfg,
                         prior=ffdnet_prior(model), variables=variables)
    assert np.isfinite(np.asarray(res.x_rgb)).all()


def test_dead_leaves_scene_statistics():
    """style='leaves' must produce natural-image statistics: heavy-tailed
    gradients (kurtosis far above the Gaussian 3), genuine inter-frame
    motion, a consistent measurement (meas == sum(mask * mosaic(orig))),
    and determinism per seed."""
    import numpy as np

    from adaptivepnp_sci_tpu.data.synthetic import make_scene

    sc = make_scene(b=4, h=64, w=64, seed=3, style="leaves")
    assert sc.orig_rgb.min() >= 0.0 and sc.orig_rgb.max() <= 1.0
    g = np.diff(sc.orig_rgb[0, ..., 0], axis=0).ravel()
    kurt = ((g - g.mean()) ** 4).mean() / (g.var() ** 2)
    assert kurt > 10.0, kurt
    assert np.abs(sc.orig_rgb[1] - sc.orig_rgb[0]).mean() > 1e-3
    want = (sc.orig_bayer * sc.mask).sum(0)
    np.testing.assert_allclose(sc.meas, want, atol=1e-6)
    sc2 = make_scene(b=4, h=64, w=64, seed=3, style="leaves")
    np.testing.assert_array_equal(sc.orig_rgb, sc2.orig_rgb)

    with np.testing.assert_raises(ValueError):
        make_scene(b=2, h=16, w=16, style="nope")


def test_photo_scene_real_statistics():
    """style='photo' pans over a real photograph: genuine inter-frame
    motion, consistent measurement, determinism, and sizes beyond the
    source image (upscale path)."""
    import numpy as np

    from adaptivepnp_sci_tpu.data.synthetic import make_scene

    sc = make_scene(b=4, h=64, w=64, seed=3, style="photo")
    assert sc.orig_rgb.shape == (4, 64, 64, 3)
    assert sc.orig_rgb.min() >= 0.0 and sc.orig_rgb.max() <= 1.0
    # global pan: successive frames differ, but only by a small shift —
    # the mean absolute frame difference is well below the frame's own
    # spatial contrast
    d = np.abs(sc.orig_rgb[1] - sc.orig_rgb[0]).mean()
    assert 1e-4 < d < np.abs(np.diff(sc.orig_rgb[0], axis=0)).mean() * 5
    want = (sc.orig_bayer * sc.mask).sum(0)
    np.testing.assert_allclose(sc.meas, want, atol=1e-6)
    sc2 = make_scene(b=4, h=64, w=64, seed=3, style="photo")
    np.testing.assert_array_equal(sc.orig_rgb, sc2.orig_rgb)
    # larger than the 600x512 source: zoom path keeps the range valid
    big = make_scene(b=2, h=640, w=640, seed=1, style="photo")
    assert big.orig_rgb.shape == (2, 640, 640, 3)
    assert big.orig_rgb.min() >= 0.0 and big.orig_rgb.max() <= 1.0


def test_photos_style_multi_source_similarity_path():
    """style='photos' (training-pool variant): draws from ALL bundled real
    photographs and moves the camera on a similarity path (pan+zoom+roll) —
    deterministic, in range, with real inter-frame motion; the legacy
    'photo' rng stream stays untouched."""
    import numpy as np

    from adaptivepnp_sci_tpu.data.synthetic import PHOTO_SOURCES, _photo_source, make_scene

    assert set(PHOTO_SOURCES) == {"hopper", "street"}
    # both sources decode to [0,1] RGB
    for name in PHOTO_SOURCES:
        img = _photo_source(name=name)
        assert img.ndim == 3 and img.shape[2] == 3
        assert 0.0 <= img.min() and img.max() <= 1.0

    sc = make_scene(b=4, h=64, w=64, seed=3, style="photos")
    assert sc.orig_rgb.shape == (4, 64, 64, 3)
    assert sc.orig_rgb.min() >= 0.0 and sc.orig_rgb.max() <= 1.0
    d = np.abs(sc.orig_rgb[1] - sc.orig_rgb[0]).mean()
    assert d > 1e-4  # the camera actually moves
    np.testing.assert_allclose(sc.meas, (sc.orig_bayer * sc.mask).sum(0), atol=1e-6)
    sc2 = make_scene(b=4, h=64, w=64, seed=3, style="photos")
    np.testing.assert_array_equal(sc.orig_rgb, sc2.orig_rgb)
    # different seeds eventually draw the street photo too: over a few
    # seeds the first-frame means must differ beyond a pan's worth
    means = {round(float(make_scene(b=2, h=96, w=96, seed=s, style="photos")
                         .orig_rgb.mean()), 2) for s in range(6)}
    assert len(means) >= 2

    from adaptivepnp_sci_tpu.train.datasets import synthetic_video_dataset

    clips = synthetic_video_dataset(4, length=5, size=32, seed=7,
                                    styles=("photos",))
    assert clips.shape == (4, 5, 32, 32, 3)
    assert clips.min() >= 0.0 and clips.max() <= 1.0
