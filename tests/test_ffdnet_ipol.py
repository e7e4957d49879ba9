"""IPOL-FFDNet parity vs the real reference checkpoint run with functional
torch ops (noise-map-first concat, bias-free DnCNN with BN, noise output)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from adaptivepnp_sci_tpu.models import convert  # noqa: E402
from adaptivepnp_sci_tpu.models.ffdnet_ipol import (  # noqa: E402
    ffdnet_ipol_gray,
    ffdnet_ipol_rgb,
)

CKPT_RGB = "/root/reference/packages/ffdnet/models/net_rgb.pth"
CKPT_GRAY = "/root/reference/packages/ffdnet/models/net_gray.pth"


def torch_ipol_forward(sd, x_nchw, sigma):
    """Functional oracle: space-to-depth + noise-map-first + DnCNN + upsample."""
    x = torch.from_numpy(x_nchw)
    n, c, h, w = x.shape
    feats = F.pixel_unshuffle(x, 2)
    nm = torch.full((n, c, h // 2, w // 2), sigma, dtype=x.dtype)
    y = torch.cat([nm, feats], dim=1)

    prefix = "intermediate_dncnn.itermediate_dncnn."
    idxs = sorted({int(k[len(prefix):].split(".")[0]) for k in sd})
    with torch.no_grad():
        for i, idx in enumerate(idxs):
            keys = {k.split(".")[-1] for k in sd if k.startswith(f"{prefix}{idx}.")}
            if "running_mean" in keys:
                y = F.batch_norm(
                    y,
                    torch.from_numpy(sd[f"{prefix}{idx}.running_mean"]),
                    torch.from_numpy(sd[f"{prefix}{idx}.running_var"]),
                    torch.from_numpy(sd[f"{prefix}{idx}.weight"]),
                    torch.from_numpy(sd[f"{prefix}{idx}.bias"]),
                    training=False, eps=1e-5,
                )
                y = torch.relu(y)
            else:
                y = F.conv2d(y, torch.from_numpy(sd[f"{prefix}{idx}.weight"]),
                             None, padding=1)
                if i == 0:
                    y = torch.relu(y)
    return F.pixel_shuffle(y, 2).numpy()


@pytest.mark.skipif(not os.path.exists(CKPT_RGB), reason="ckpt absent")
def test_ipol_rgb_parity(rng):
    sd = convert.load_torch_state_dict(CKPT_RGB)
    variables = convert.ffdnet_ipol_variables(sd)
    model = ffdnet_ipol_rgb()

    x = rng.random((2, 32, 32, 3), dtype=np.float32)
    sigma = np.float32(25 / 255)
    want = torch_ipol_forward(sd, np.ascontiguousarray(x.transpose(0, 3, 1, 2)), sigma)
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(sigma))
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=2e-5)


@pytest.mark.skipif(not os.path.exists(CKPT_RGB), reason="ckpt absent")
def test_ipol_rgb_denoises(rng):
    variables = convert.load_ffdnet_ipol(CKPT_RGB)
    model = ffdnet_ipol_rgb()
    clean = np.tile(
        np.linspace(0.2, 0.8, 64, dtype=np.float32)[None, :, None], (64, 1, 3)
    )[None]
    noisy = np.clip(clean + rng.normal(0, 25 / 255, clean.shape), 0, 1).astype(
        np.float32
    )
    out = np.asarray(
        model.denoise(variables, jnp.asarray(noisy), jnp.float32(25 / 255))
    )
    assert np.mean((out - clean) ** 2) < 0.25 * np.mean((noisy - clean) ** 2)


@pytest.mark.skipif(not os.path.exists(CKPT_GRAY), reason="ckpt absent")
def test_ipol_gray_loads_and_runs():
    variables = convert.load_ffdnet_ipol(CKPT_GRAY)
    model = ffdnet_ipol_gray()
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    out = model.apply(variables, x, jnp.float32(0.1))
    assert out.shape == (1, 16, 16, 1)
