"""DDnet parity vs an independently-built torch oracle (dual branch,
align-corners bilinear upsample, learned branch weights)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from adaptivepnp_sci_tpu.models import convert  # noqa: E402
from adaptivepnp_sci_tpu.models.ddnet import DDnet  # noqa: E402

BL = 20


class Wrap(tnn.Module):
    def __init__(self, seq):
        super().__init__()
        self.convblock = seq

    def forward(self, x):
        return self.convblock(x)


def _cv(cin, cout):
    return Wrap(
        tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=1, bias=False),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(cout, cout, 3, padding=1, bias=False),
            tnn.ReLU(inplace=True),
        )
    )


def _inc1(frames, ch_each, out):
    return Wrap(
        tnn.Sequential(
            tnn.Conv2d(frames * ch_each, frames * 30, 3, padding=1,
                       groups=frames, bias=False),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(frames * 30, out, 3, padding=1, bias=False),
            tnn.ReLU(inplace=True),
        )
    )


def _down(cin, cout):
    return Wrap(
        tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=1, stride=2, bias=False),
            tnn.ReLU(inplace=True),
            _cv(cout, cout),
        )
    )


def _up(cin, cout):
    return Wrap(
        tnn.Sequential(
            _cv(cin, cin),
            tnn.Conv2d(cin, cout * 4, 3, padding=1, bias=False),
            tnn.PixelShuffle(2),
        )
    )


def _out(cin, cout):
    return Wrap(
        tnn.Sequential(
            tnn.Conv2d(cin, cin, 3, padding=1, bias=False),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(cin, cout, 3, padding=1, bias=False),
        )
    )


class TDenBlock(tnn.Module):
    def __init__(self, ch_each=3, out_ch=3):
        super().__init__()
        self.inc_1 = _inc1(3, ch_each, BL)
        self.downc0 = _down(BL, BL * 2)
        self.downc1 = _down(BL * 2, BL * 4)
        self.upc2 = _up(BL * 4, BL * 2)
        self.upc1 = _up(BL * 2, BL)
        self.outc = _out(BL, out_ch)

    def forward(self, in0, in1, in2):
        x0 = self.inc_1(torch.cat((in0, in1, in2), dim=1))
        x1 = self.downc0(x0)
        x2 = self.downc1(x1)
        x2 = self.upc2(x2)
        x1 = self.upc1(x1 + x2)
        return in1 + self.outc(x0 + x1)


class TDenBlock4(TDenBlock):
    def __init__(self):
        super().__init__(ch_each=4, out_ch=4)
        self.upscale = tnn.UpsamplingBilinear2d(scale_factor=2)
        self.fusion = _out(4, 3)

    def forward(self, in0, in1, in2):
        x = super().forward(in0, in1, in2)
        return self.fusion(self.upscale(x))


class TDDnet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.temp1 = TDenBlock(ch_each=1)
        self.temp2 = TDenBlock(ch_each=3)
        self.temp11 = TDenBlock4()
        self.weight_tensor_in = tnn.Parameter(torch.ones((9, 1, 1, 1, 1)))
        self.weight_tensor_in2 = tnn.Parameter(torch.ones((9, 1, 4, 1, 1)))
        self.weight_tensor_out = tnn.Parameter(torch.ones((2, 1, 3, 1, 1)))

    @staticmethod
    def _four(x):  # (N,H,W) -> (N,4,H/2,W/2), RGGB offsets
        n, h, w = x.shape
        out = torch.zeros(n, 4, h // 2, w // 2)
        for ib, (a, b) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            out[:, ib] = x[:, a::2, b::2]
        return out

    def forward(self, x):
        f = [x[:, 3 * m : 3 * m + 3] for m in range(5)]
        a, a2, a3 = self.weight_tensor_in, self.weight_tensor_in2, self.weight_tensor_out
        ones = [fi.sum(dim=1) for fi in f]  # (N,H,W)
        fours = [self._four(o) for o in ones]
        ones = [o.unsqueeze(1) for o in ones]
        x20 = self.temp1(ones[0] * a[0], ones[1] * a[1], ones[2] * a[2])
        x21 = self.temp1(ones[1] * a[3], ones[2] * a[4], ones[3] * a[5])
        x22 = self.temp1(ones[2] * a[6], ones[3] * a[7], ones[4] * a[8])
        y20 = self.temp11(fours[0] * a2[0], fours[1] * a2[1], fours[2] * a2[2])
        y21 = self.temp11(fours[1] * a2[3], fours[2] * a2[4], fours[3] * a2[5])
        y22 = self.temp11(fours[2] * a2[6], fours[3] * a2[7], fours[4] * a2[8])
        return a3[0] * self.temp2(x20, x21, x22) + a3[1] * self.temp2(y20, y21, y22)


def test_ddnet_parity(rng):
    torch.manual_seed(1)
    tm = TDDnet().eval()
    with torch.no_grad():
        tm.weight_tensor_in.normal_(1.0, 0.1)
        tm.weight_tensor_in2.normal_(1.0, 0.1)
        tm.weight_tensor_out.normal_(0.5, 0.1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.ddnet_variables(sd)

    x = rng.random((2, 5, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3).reshape(2, 15, 16, 16).copy())
        want = tm(xt).numpy()

    got = DDnet().apply(variables, jnp.asarray(x))
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-5)


def test_ddnet_converter_drops_unused_inc():
    sd = {"temp1.inc.convblock.0.weight": np.zeros((90, 12, 3, 3), np.float32)}
    out = convert.ddnet_variables(sd)
    assert out["params"] == {}


def test_ddnet_bf16_close_to_fp32(rng):
    """DDnet(dtype=bf16) shares params with the fp32 module (conversion is
    cast-only at apply time) and stays within bf16 rounding of fp32 —
    the property the benchmark's bf16 demosaicker rides on."""
    import jax

    model = DDnet()
    x = jnp.asarray(rng.random((1, 5, 16, 16, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    ref = model.apply(variables, x)
    got = DDnet(dtype=jnp.bfloat16).apply(variables, x)
    assert got.dtype == jnp.float32  # fp32 endpoints
    # bf16 has ~3 decimal digits; the fp32 residual spine keeps the
    # output near the center frame, so absolute error stays ~1e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)
    assert float(jnp.abs(got - ref).mean()) < 5e-3


class _TorchRBNoBN(tnn.Module):
    def __init__(self, nf):
        super().__init__()
        self.conv1 = tnn.Conv2d(nf, 48, 3, 1, 1, bias=True)
        self.conv2 = tnn.Conv2d(48, nf, 3, 1, 1, bias=True)

    def forward(self, x):
        return x + self.conv2(torch.relu(self.conv1(x)))


class _TorchPyramidEncoder(tnn.Module):
    """Oracle for the reference's dormant pyramid `encoder`
    (models/network_demosaicking.py:137-182), including its double-LeakyReLU
    head applications."""

    def __init__(self, nf=16, n_rb=2):
        super().__init__()
        lr = tnn.LeakyReLU(negative_slope=0.1, inplace=False)
        self.conv_first01 = tnn.Sequential(
            tnn.Conv2d(4, nf * 2, 3, 2, 1, bias=True), lr,
            tnn.Conv2d(nf * 2, nf, 3, 1, 1, bias=True), lr,
        )
        self.conv_first02 = tnn.Sequential(
            tnn.Conv2d(nf, nf * 2, 3, 2, 1, bias=True), lr,
            tnn.Conv2d(nf * 2, nf, 3, 1, 1, bias=True), lr,
        )
        self.conv_first = tnn.Conv2d(nf, nf, 3, 1, 1, bias=True)
        self.rbs = tnn.Sequential(*[_TorchRBNoBN(nf) for _ in range(n_rb)])
        self.d2_conv1 = tnn.Conv2d(nf, nf, 3, 2, 1, bias=True)
        self.d2_conv2 = tnn.Conv2d(nf, nf, 3, 1, 1, bias=True)
        self.d4_conv1 = tnn.Conv2d(nf, nf, 3, 2, 1, bias=True)
        self.d4_conv2 = tnn.Conv2d(nf, nf, 3, 1, 1, bias=True)
        self.py_conv = tnn.Conv2d(nf * 3, nf, 7, 1, 3, bias=True)
        self.lrelu = lr

    def forward(self, x):
        import torch.nn.functional as F

        x = self.lrelu(self.conv_first01(x))
        x = self.lrelu(self.conv_first02(x))
        fea = self.lrelu(self.conv_first(x))
        fea_lr = self.rbs(fea)
        fea_d2 = self.lrelu(self.d2_conv2(self.lrelu(self.d2_conv1(fea_lr))))
        fea_d4 = self.lrelu(self.d4_conv2(self.lrelu(self.d4_conv1(fea_d2))))
        size = (x.size()[-2], x.size()[-1])
        fea_d2 = F.interpolate(fea_d2, size=size, mode="bilinear",
                               align_corners=False)
        fea_d4 = F.interpolate(fea_d4, size=size, mode="bilinear",
                               align_corners=False)
        out = torch.cat([fea_lr, fea_d2, fea_d4], 1)
        return self.lrelu(self.py_conv(out))


def test_pyramid_encoder_parity():
    from adaptivepnp_sci_tpu.models.ddnet import PyramidEncoder

    torch.manual_seed(5)
    m = _TorchPyramidEncoder(nf=16, n_rb=2).eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    variables = convert.pyramid_encoder_variables(sd)

    rng = np.random.default_rng(7)
    # odd spatial size: exercises the asymmetric stride-2 shapes and the
    # half-pixel (align_corners=False) bilinear pyramid upsamples
    x = rng.random((2, 17, 17, 4)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()

    got = PyramidEncoder(nf=16, n_rb=2).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=1e-4, atol=1e-5,
    )
