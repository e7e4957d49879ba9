"""KAIR image-utility set (`utils/image.py`): converters, augmentation,
MATLAB color transforms, PSNR/SSIM in the 0-255 domain, IO."""

import numpy as np
import pytest

from adaptivepnp_sci_tpu.utils import image as iu


def test_uint_single_roundtrip(rng):
    u = (rng.random((6, 6, 3)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(iu.single2uint(iu.uint2single(u)), u)
    u16 = (rng.random((6, 6)) * 65535).astype(np.uint16)
    np.testing.assert_array_equal(iu.single2uint16(iu.uint162single(u16)), u16)


def test_array_converters(rng):
    u = (rng.random((6, 6)) * 255).astype(np.uint8)
    a4 = iu.uint2array4(u)
    assert a4.shape == (1, 6, 6, 1) and a4.dtype == np.float32
    np.testing.assert_array_equal(iu.array2uint(a4), u)
    s = rng.random((6, 6, 3)).astype(np.float32)
    assert iu.single2array5(s).shape == (1, 1, 6, 6, 3)
    assert iu.array2single(iu.single2array4(s)).shape == s.shape


def test_array2img_clamps_and_scales():
    arr = np.array([[-0.5, 0.0], [0.5, 2.0]])
    out = iu.array2img(arr)
    np.testing.assert_array_equal(out, [[0, 0], [128, 255]])


def test_augment_img_modes_distinct(rng):
    img = rng.random((5, 7, 3)).astype(np.float32)
    outs = [iu.augment_img(img, m) for m in range(8)]
    np.testing.assert_array_equal(outs[0], img)
    shapes = {o.shape for o in outs}
    assert shapes == {(5, 7, 3), (7, 5, 3)}
    # every mode is a distinct element of the dihedral group
    sigs = {o.tobytes() + str(o.shape).encode() for o in outs}
    assert len(sigs) == 8


def test_augment_imgs_consistent(rng):
    imgs = [rng.random((4, 4, 3)).astype(np.float32) for _ in range(3)]
    outs = iu.augment_imgs(imgs, rng=np.random.default_rng(0))
    assert len(outs) == 3
    # the same transform applied to identical inputs gives identical outputs
    outs2 = iu.augment_imgs([imgs[0], imgs[0]], rng=np.random.default_rng(1))
    np.testing.assert_array_equal(outs2[0], outs2[1])


def test_rgb2ycbcr_known_values():
    white = np.ones((1, 1, 3), np.float32)
    y = iu.rgb2ycbcr(white, only_y=True)
    np.testing.assert_allclose(y, 235.0 / 255.0, rtol=1e-5)
    black = np.zeros((1, 1, 3), np.float32)
    np.testing.assert_allclose(iu.rgb2ycbcr(black, only_y=True),
                               16.0 / 255.0, rtol=1e-5)


def test_ycbcr_roundtrip(rng):
    img = (0.1 + 0.8 * rng.random((8, 8, 3))).astype(np.float32)
    rec = iu.ycbcr2rgb(iu.rgb2ycbcr(img, only_y=False))
    np.testing.assert_allclose(rec, img, atol=2e-3)


def test_bgr2ycbcr_matches_rgb_reversed(rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        iu.bgr2ycbcr(img[..., ::-1], only_y=True),
        iu.rgb2ycbcr(img, only_y=True), rtol=1e-5)


def test_modcrop_shave():
    img = np.zeros((10, 11, 3))
    assert iu.modcrop(img, 4).shape == (8, 8, 3)
    assert iu.shave(img, 2).shape == (6, 7, 3)


def test_calculate_psnr_matches_device_metric(rng):
    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.ops import metrics

    a = (rng.random((16, 16)) * 255).astype(np.float64)
    b = (rng.random((16, 16)) * 255).astype(np.float64)
    host = iu.calculate_psnr(a, b)
    dev = float(metrics.psnr(jnp.asarray(a / 255), jnp.asarray(b / 255)))
    np.testing.assert_allclose(host, dev, rtol=1e-4)


def test_filter2_valid_matches_scipy(rng):
    from scipy.ndimage import correlate

    img = rng.random((20, 20)).astype(np.float64)
    win = iu._gaussian_window()
    got = iu._filter2_valid(img, win)
    want = correlate(img, win, mode="constant")[5:-5, 5:-5]
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_ssim_identity_and_ordering(rng):
    img = (rng.random((32, 32)) * 255).astype(np.float64)
    assert iu.ssim_single(img, img) == pytest.approx(1.0)
    slightly = img + rng.normal(0, 5, img.shape)
    very = img + rng.normal(0, 50, img.shape)
    assert iu.ssim_single(img, slightly) > iu.ssim_single(img, very)
    # multichannel + batched wrappers
    rgb = np.stack([img] * 3, -1)
    assert iu.calculate_ssim(rgb, rgb) == pytest.approx(1.0)
    assert iu.calculate_ssim(rgb[None], rgb[None]) == pytest.approx(1.0)


def test_io_roundtrip(tmp_path, rng):
    img = (rng.random((9, 9, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    iu.imsave(img, p)
    back = iu.imread_uint(p, n_channels=3)
    np.testing.assert_array_equal(back, img)
    gray = iu.imread_uint(p, n_channels=1)
    assert gray.shape == (9, 9, 1)
    assert iu.is_image_file("a.PNG") and not iu.is_image_file("a.mat")
    assert iu.get_image_paths(str(tmp_path)) == [p]
