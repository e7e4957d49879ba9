"""FFDNet: shape/robustness tests + activation parity vs the reference
checkpoint executed with raw torch functional ops (independent oracle)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptivepnp_sci_tpu.models import convert
from adaptivepnp_sci_tpu.models.ffdnet import FFDNet, ffdnet_color

CKPT = "/root/reference/model_zoo/ffdnet_color.pth"
CKPT_GRAY = "/root/reference/model_zoo/ffdnet_gray.pth"


def torch_ffdnet_forward(state_dict, x_nchw, sigma):
    """Oracle: run the flat KAIR-FFDNet checkpoint with functional torch ops
    (replication pad -> pixel_unshuffle -> convs+relu -> pixel_shuffle)."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(x_nchw)
    n, c, h, w = x.shape
    x = F.pad(x, (0, w % 2, 0, h % 2), mode="replicate")
    x = F.pixel_unshuffle(x, 2)
    m = torch.full((n, 1, x.shape[2], x.shape[3]), sigma, dtype=x.dtype)
    x = torch.cat([x, m], dim=1)

    conv_ids = sorted({int(k.split(".")[1]) for k in state_dict})
    for i, sid in enumerate(conv_ids):
        wgt = torch.from_numpy(np.asarray(state_dict[f"model.{sid}.weight"]))
        b = torch.from_numpy(np.asarray(state_dict[f"model.{sid}.bias"]))
        x = F.conv2d(x, wgt, b, padding=1)
        if i < len(conv_ids) - 1:
            x = torch.relu(x)
    x = F.pixel_shuffle(x, 2)
    return x[..., :h, :w].numpy()


def test_ffdnet_random_init_shapes(rng):
    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=4)
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.float32(0.1))
    y = model.apply(variables, x, jnp.float32(0.1))
    assert y.shape == (2, 16, 16, 3)


def test_ffdnet_odd_sizes(rng):
    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=4)
    x = jnp.asarray(rng.random((1, 17, 19, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.float32(0.1))
    y = model.apply(variables, x, jnp.float32(0.1))
    assert y.shape == (1, 17, 19, 3)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_ffdnet_color_parity_with_torch_checkpoint(rng):
    sd = convert.load_torch_state_dict(CKPT)
    variables = convert.ffdnet_params(sd)
    model = ffdnet_color()

    x = rng.random((1, 33, 37, 3), dtype=np.float32)
    sigma = np.float32(25 / 255)

    want = torch_ffdnet_forward(sd, np.transpose(x, (0, 3, 1, 2)), sigma)
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(sigma))
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=2e-5)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_ffdnet_actually_denoises(rng):
    variables = convert.load_ffdnet(CKPT)
    model = ffdnet_color()

    clean = np.tile(
        np.linspace(0.2, 0.8, 64, dtype=np.float32)[None, :, None], (64, 1, 3)
    )[None]
    noisy = np.clip(clean + rng.normal(0, 25 / 255, clean.shape), 0, 1).astype(
        np.float32
    )
    out = np.asarray(model.apply(variables, jnp.asarray(noisy), jnp.float32(25 / 255)))
    mse_in = np.mean((noisy - clean) ** 2)
    mse_out = np.mean((out - clean) ** 2)
    assert mse_out < mse_in * 0.25  # strong denoising at matched sigma


@pytest.mark.skipif(not os.path.exists(CKPT_GRAY), reason="reference ckpt absent")
def test_ffdnet_gray_loads():
    from adaptivepnp_sci_tpu.models.ffdnet import ffdnet_gray

    variables = convert.load_ffdnet(CKPT_GRAY)
    model = ffdnet_gray()
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    y = model.apply(variables, x, jnp.float32(0.1))
    assert y.shape == (1, 32, 32, 1)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_ffdnet_interior_bf16_close_to_fp32(rng):
    """``interior_dtype=bf16`` (endpoint convs fp32) must track the fp32
    output closely — this is the quality gate for the mixed-precision
    flagship variant (scripts/ab_ffdnet_precision.py). Same variables work
    for both modes (dtype is a cast at apply time, not a weight format)."""
    variables = convert.load_ffdnet(CKPT)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    sigma = jnp.float32(25 / 255)

    ref = np.asarray(ffdnet_color().apply(variables, x, sigma))
    mixed_model = FFDNet(in_nc=3, out_nc=3, nc=96, nb=12,
                         interior_dtype=jnp.bfloat16)
    mixed = np.asarray(mixed_model.apply(variables, x, sigma))

    assert mixed.dtype == np.float32
    # bf16 has ~3 decimal digits; interior rounding over 10 layers lands at
    # ~4e-3 mean abs on [0,1] pure-noise input (the worst case — real use
    # gates on end-to-end flagship PSNR, scripts/ab_ffdnet_precision.py)
    np.testing.assert_allclose(mixed, ref, atol=3e-2)
    assert float(np.abs(mixed - ref).mean()) < 6e-3
