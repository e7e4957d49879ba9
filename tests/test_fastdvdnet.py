"""FastDVDnet parity: a torch oracle built from architectural knowledge
(grouped input conv + BN U-Net triplet cascade) with random weights is
converted to Flax and must produce identical activations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from adaptivepnp_sci_tpu.models import convert  # noqa: E402
from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet  # noqa: E402
from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior, window_indices  # noqa: E402


def _cvblock(ch_in, ch_out):
    return tnn.Sequential(
        tnn.Conv2d(ch_in, ch_out, 3, padding=1, bias=False),
        tnn.BatchNorm2d(ch_out),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(ch_out, ch_out, 3, padding=1, bias=False),
        tnn.BatchNorm2d(ch_out),
        tnn.ReLU(inplace=True),
    )


class _TorchDenBlock(tnn.Module):
    def __init__(self, c=3, chs=(32, 64, 128)):
        super().__init__()
        c0, c1, c2 = chs

        class Wrap(tnn.Module):
            def __init__(self, seq):
                super().__init__()
                self.convblock = seq

            def forward(self, x):
                return self.convblock(x)

        self.inc = Wrap(
            tnn.Sequential(
                tnn.Conv2d(3 * (c + 1), 90, 3, padding=1, groups=3, bias=False),
                tnn.BatchNorm2d(90),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(90, c0, 3, padding=1, bias=False),
                tnn.BatchNorm2d(c0),
                tnn.ReLU(inplace=True),
            )
        )
        self.downc0 = Wrap(
            tnn.Sequential(
                tnn.Conv2d(c0, c1, 3, padding=1, stride=2, bias=False),
                tnn.BatchNorm2d(c1),
                tnn.ReLU(inplace=True),
                Wrap(_cvblock(c1, c1)),
            )
        )
        self.downc1 = Wrap(
            tnn.Sequential(
                tnn.Conv2d(c1, c2, 3, padding=1, stride=2, bias=False),
                tnn.BatchNorm2d(c2),
                tnn.ReLU(inplace=True),
                Wrap(_cvblock(c2, c2)),
            )
        )
        self.upc2 = Wrap(
            tnn.Sequential(
                Wrap(_cvblock(c2, c2)),
                tnn.Conv2d(c2, c1 * 4, 3, padding=1, bias=False),
                tnn.PixelShuffle(2),
            )
        )
        self.upc1 = Wrap(
            tnn.Sequential(
                Wrap(_cvblock(c1, c1)),
                tnn.Conv2d(c1, c0 * 4, 3, padding=1, bias=False),
                tnn.PixelShuffle(2),
            )
        )
        self.outc = Wrap(
            tnn.Sequential(
                tnn.Conv2d(c0, c0, 3, padding=1, bias=False),
                tnn.BatchNorm2d(c0),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(c0, c, 3, padding=1, bias=False),
            )
        )

    def forward(self, in0, in1, in2, nm):
        x0 = self.inc(torch.cat((in0, nm, in1, nm, in2, nm), dim=1))
        x1 = self.downc0(x0)
        x2 = self.downc1(x1)
        x2 = self.upc2(x2)
        x1 = self.upc1(x1 + x2)
        x = self.outc(x0 + x1)
        return in1 - x


class _TorchFastDVDnet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.temp1 = _TorchDenBlock()
        self.temp2 = _TorchDenBlock()

    def forward(self, x, nm):
        f = [x[:, 3 * m : 3 * m + 3] for m in range(5)]
        x20 = self.temp1(f[0], f[1], f[2], nm)
        x21 = self.temp1(f[1], f[2], f[3], nm)
        x22 = self.temp1(f[2], f[3], f[4], nm)
        return self.temp2(x20, x21, x22, nm)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = _TorchFastDVDnet().eval()
    # randomize BN stats so eval-mode parity actually exercises them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def test_fastdvdnet_parity(torch_model, rng):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert.fastdvdnet_variables(sd)

    x = rng.random((2, 5, 16, 16, 3), dtype=np.float32)
    sigma = np.float32(20 / 255)

    with torch.no_grad():
        xt = torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3).reshape(2, 15, 16, 16).copy()
        )
        nm = torch.full((2, 1, 16, 16), float(sigma))
        want = torch_model(xt, nm).numpy()

    model = FastDVDnet()
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(sigma))
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-5)


def test_window_indices_circular():
    idx = np.asarray(window_indices(8, 5))
    assert idx.shape == (8, 5)
    np.testing.assert_array_equal(idx[0], [6, 7, 0, 1, 2])
    np.testing.assert_array_equal(idx[4], [2, 3, 4, 5, 6])
    np.testing.assert_array_equal(idx[7], [5, 6, 7, 0, 1])


def test_fastdvd_prior_shapes(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert.fastdvdnet_variables(sd)
    prior = fastdvd_prior(FastDVDnet())
    rgb = jnp.zeros((8, 16, 16, 3), jnp.float32)
    out = prior.apply(variables, rgb, jnp.float32(0.1))
    assert out.shape == (8, 16, 16, 3)


def test_fastdvdnet_train_mode_updates_stats(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert.fastdvdnet_variables(sd)
    model = FastDVDnet()
    x = jnp.ones((1, 5, 16, 16, 3), jnp.float32) * 0.5
    out, mutated = model.apply(
        variables, x, jnp.float32(0.1), train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_bf16_denblocks_close_to_fp32(torch_model):
    """dtype=bfloat16 runs the conv/BN chains in bf16 with fp32 residuals:
    same variables, fp32 output dtype, small numeric delta (measured
    identical PSNR in the composed solver — scripts/bench_fastdvd_bf16.py)."""
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert.fastdvdnet_variables(sd)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 5, 16, 16, 3), dtype=np.float32))
    sigma = jnp.float32(20 / 255)

    a = FastDVDnet().apply(variables, x, sigma)
    b = FastDVDnet(dtype=jnp.bfloat16).apply(variables, x, sigma)
    assert b.dtype == jnp.float32
    assert float(jnp.abs(a - b).max()) < 2e-2
    assert float(jnp.abs(a - b).mean()) < 2e-3
    # seq path too
    sa = FastDVDnet().apply(variables, x[0], sigma, method="seq_circular")
    sb = FastDVDnet(dtype=jnp.bfloat16).apply(variables, x[0], sigma,
                                              method="seq_circular")
    assert float(jnp.abs(sa - sb).max()) < 2e-2


def test_seq_circular_matches_per_window(torch_model):
    """The shared-triplet sequence path (temp1 once per distinct circular
    triplet) must equal explicit per-window evaluation — same weights,
    frozen BN, identical math."""
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert.fastdvdnet_variables(sd)
    model = FastDVDnet()
    rng = np.random.default_rng(7)
    rgb = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32))
    sigma = jnp.float32(20 / 255)

    windows = rgb[window_indices(8, 5)]
    want = model.apply(variables, windows, sigma)
    got = model.apply(variables, rgb, sigma, method="seq_circular")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


class _Wrap(tnn.Module):
    def __init__(self, seq):
        super().__init__()
        self.convblock = seq

    def forward(self, x):
        return self.convblock(x)


class _TorchSpatialDnCNN(tnn.Module):
    """Oracle for the reference's dormant spatialDnCNN
    (packages/fastdvdnet/models.py:92-144): single-frame U-Net, channels
    (32, 64, 128), InputCvBlock(num_in_frames=1), residual in - f(in)."""

    def __init__(self, c=3, chs=(32, 64, 128)):
        super().__init__()
        c0, c1, c2 = chs
        self.inc = _Wrap(
            tnn.Sequential(
                tnn.Conv2d(c + 1, 30, 3, padding=1, bias=False),
                tnn.BatchNorm2d(30),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(30, c0, 3, padding=1, bias=False),
                tnn.BatchNorm2d(c0),
                tnn.ReLU(inplace=True),
            )
        )
        self.downc0 = _Wrap(
            tnn.Sequential(
                tnn.Conv2d(c0, c1, 3, padding=1, stride=2, bias=False),
                tnn.BatchNorm2d(c1),
                tnn.ReLU(inplace=True),
                _Wrap(_cvblock(c1, c1)),
            )
        )
        self.downc1 = _Wrap(
            tnn.Sequential(
                tnn.Conv2d(c1, c2, 3, padding=1, stride=2, bias=False),
                tnn.BatchNorm2d(c2),
                tnn.ReLU(inplace=True),
                _Wrap(_cvblock(c2, c2)),
            )
        )
        self.upc2 = _Wrap(
            tnn.Sequential(
                _Wrap(_cvblock(c2, c2)),
                tnn.Conv2d(c2, c1 * 4, 3, padding=1, bias=False),
                tnn.PixelShuffle(2),
            )
        )
        self.upc1 = _Wrap(
            tnn.Sequential(
                _Wrap(_cvblock(c1, c1)),
                tnn.Conv2d(c1, c0 * 4, 3, padding=1, bias=False),
                tnn.PixelShuffle(2),
            )
        )
        self.outc = _Wrap(
            tnn.Sequential(
                tnn.Conv2d(c0, c0, 3, padding=1, bias=False),
                tnn.BatchNorm2d(c0),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(c0, c, 3, padding=1, bias=False),
            )
        )

    def forward(self, in1, nm):
        x0 = self.inc(torch.cat((in1, nm), dim=1))
        x1 = self.downc0(x0)
        x2 = self.downc1(x1)
        x2 = self.upc2(x2)
        x1 = self.upc1(x1 + x2)
        x = self.outc(x0 + x1)
        return in1 - x


def test_spatial_dncnn_parity(rng):
    from adaptivepnp_sci_tpu.models.fastdvdnet import SpatialDnCNN

    torch.manual_seed(3)
    m = _TorchSpatialDnCNN().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    variables = convert.spatial_dncnn_variables(sd)

    x = rng.random((2, 16, 16, 3), dtype=np.float32)
    sigma = np.float32(25 / 255)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        nm = torch.full((2, 1, 16, 16), float(sigma))
        want = m(xt, nm).numpy()

    got = SpatialDnCNN().apply(variables, jnp.asarray(x), jnp.asarray(sigma))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=1e-4, atol=1e-5,
    )
