"""Grayscale video-SCI solver tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptivepnp_sci_tpu.ops import metrics, physics
from adaptivepnp_sci_tpu.solvers.gray import GrayConfig, gap_denoise_gray


@pytest.fixture(scope="module")
def gray_scene():
    rng = np.random.default_rng(11)
    from adaptivepnp_sci_tpu.data.synthetic import _smooth_video

    video = _smooth_video(8, 32, 32, rng).mean(-1)  # (B, H, W) gray
    mask = (rng.random((8, 32, 32)) > 0.5).astype(np.float32)
    y = (video * mask).sum(0)
    return y, mask, video


def test_gap_tv_gray_reconstructs(gray_scene):
    y, mask, video = gray_scene
    res = gap_denoise_gray(y, mask, GrayConfig(sigma=(0.0,), iters=(30,)),
                           orig=video)
    x_adj = np.asarray(physics.adjoint(jnp.asarray(y), jnp.asarray(mask))) / np.maximum(
        mask.sum(0), 1
    )
    psnr_adj = float(metrics.psnr(jnp.asarray(video), jnp.asarray(x_adj)))
    assert float(res.psnr_per_frame.mean()) > psnr_adj + 3


def test_gray_ffdnet_prior(gray_scene):
    y, mask, video = gray_scene
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet

    model = FFDNet(in_nc=1, out_nc=1, nc=8, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)),
                           jnp.float32(0.1))

    def denoise_fn(v, frames, sigma):
        return model.apply(v, frames, sigma)

    cfg = GrayConfig(sigma=(25 / 255, 6 / 255), iters=(3, 2), denoiser="ffdnet")
    res = gap_denoise_gray(y, mask, cfg, denoise_fn=denoise_fn,
                           variables=variables, orig=video)
    assert np.isfinite(np.asarray(res.x)).all()
    assert res.x.shape == video.shape


@pytest.mark.skipif(
    not os.path.exists("/root/reference/model_zoo/ffdnet_gray.pth"),
    reason="gray ckpt absent",
)
def test_gray_ffdnet_real_weights_beats_tv(gray_scene):
    y, mask, video = gray_scene
    from adaptivepnp_sci_tpu.models.convert import load_ffdnet
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_gray

    model = ffdnet_gray()
    variables = load_ffdnet("/root/reference/model_zoo/ffdnet_gray.pth")

    # weak warm start: FFDNet-gray must improve on it
    warm = gap_denoise_gray(y, mask, GrayConfig(sigma=(0.0,), iters=(5,)),
                            orig=video)
    cfg = GrayConfig(sigma=(25 / 255, 12 / 255, 6 / 255),
                     iters=(10, 10, 10), denoiser="ffdnet")
    ffd_res = gap_denoise_gray(
        y, mask, cfg,
        denoise_fn=lambda v, f, s: model.apply(v, f, s),
        variables=variables, x0=warm.x, orig=video,
    )
    assert float(ffd_res.psnr_per_frame.mean()) > float(
        warm.psnr_per_frame.mean()
    )
    assert float(ffd_res.psnr_per_frame.mean()) > 30.0
