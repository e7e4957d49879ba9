"""KAIR conv-block zoo (`models/blocks.py`): shape/behavior checks per block
plus a torch-oracle parity test for the mode-string conv factory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptivepnp_sci_tpu.models import blocks


def _init_apply(module, x, **kw):
    variables = module.init(jax.random.PRNGKey(0), x, **kw)
    return variables, module.apply(variables, x, **kw)


def test_pixel_shuffle_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 12), dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(blocks.pixel_unshuffle(blocks.pixel_shuffle(x, 2), 2)), x
    )


def test_sequential_composes():
    f = blocks.sequential(lambda x: x + 1, lambda x: x * 2)
    assert f(jnp.float32(3)) == 8


def test_convblock_mode_c_matches_torch(rng):
    import torch

    x = rng.random((1, 10, 10, 5), dtype=np.float32)
    m = blocks.ConvBlock(out_ch=7, kernel_size=3, stride=1, padding=1,
                         mode="C")
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    k = np.asarray(variables["params"]["conv0"]["kernel"])  # (kh,kw,cin,cout)
    b = np.asarray(variables["params"]["conv0"]["bias"])

    conv = torch.nn.Conv2d(5, 7, 3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(b))
        want = conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    got = np.asarray(m.apply(variables, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["CBR", "CL", "CIR", "Cr", "Cl"])
def test_convblock_norm_act_modes_preserve_shape(rng, mode):
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    out = blocks.ConvBlock(out_ch=6, mode=mode).init_with_output(
        jax.random.PRNGKey(0), x)[0]
    assert out.shape == (2, 16, 16, 6)


def test_convblock_pixelshuffle_mode(rng):
    # conv to 8 channels then shuffle x2 -> 2 channels at double resolution
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    out = blocks.ConvBlock(out_ch=8, mode="C2").init_with_output(
        jax.random.PRNGKey(0), x)[0]
    assert out.shape == (2, 32, 32, 2)


def test_convblock_pool_and_upsample(rng):
    x = jnp.asarray(rng.random((1, 12, 12, 4), dtype=np.float32))
    out = blocks.ConvBlock(kernel_size=2, stride=2, mode="M").init_with_output(
        jax.random.PRNGKey(0), x)[0]
    assert out.shape == (1, 6, 6, 4)
    out = blocks.ConvBlock(mode="U").init_with_output(
        jax.random.PRNGKey(0), x)[0]
    assert out.shape == (1, 24, 24, 4)
    np.testing.assert_array_equal(np.asarray(out)[0, :2, :2, 0],
                                  np.full((2, 2), np.asarray(x)[0, 0, 0, 0]))


@pytest.mark.parametrize("cls,kw", [
    (blocks.ResBlock, dict(channels=8)),
    (blocks.IMDBlock, dict(channels=8)),
    (blocks.CFRB, dict(channels=8)),
    (blocks.RCABlock, dict(channels=8, reduction=4)),
    (blocks.RCAGroup, dict(channels=8, reduction=4, nb=2)),
    (blocks.ResidualDenseBlock5C, dict(nc=8, gc=4)),
    (blocks.RRDB, dict(nc=8, gc=4)),
    (blocks.NonLocalBlock2D, dict(nc=8)),
])
def test_block_preserves_shape(rng, cls, kw):
    x = jnp.asarray(rng.random((1, 24, 24, kw.get("channels", kw.get("nc"))),
                               dtype=np.float32))
    _, out = _init_apply(cls(**kw), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_calayer_gates_multiplicatively(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 8), dtype=np.float32)) + 0.1
    _, out = _init_apply(blocks.CALayer(channels=8, reduction=4), x)
    out = np.asarray(out)
    assert (out < np.asarray(x)).all() and (out > 0).all()  # sigmoid in (0,1)


def test_esa_preserves_shape(rng):
    x = jnp.asarray(rng.random((1, 33, 47, 8), dtype=np.float32))
    _, out = _init_apply(blocks.ESA(channels=8), x)
    assert out.shape == x.shape


def test_conditional_batchnorm(rng):
    x = jnp.asarray(rng.random((4, 8, 8, 6), dtype=np.float32))
    y = jnp.asarray([0, 1, 2, 0])
    m = blocks.ConditionalBatchNorm2d(6, 3)
    variables = m.init(jax.random.PRNGKey(0), x, y, train=True)
    out, _ = m.apply(variables, x, y, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape


def test_concat_and_shortcut(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 4), dtype=np.float32))
    cat = blocks.ConcatBlock(lambda h: h * 2)(x)
    assert cat.shape == (1, 8, 8, 8)
    sc = blocks.ShortcutBlock(lambda h: h)(x)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(x) * 2)


@pytest.mark.parametrize("factory,scale_mode,factor", [
    (blocks.upsample_pixelshuffle, "2R", 2),
    (blocks.upsample_upconv, "3R", 3),
    (blocks.upsample_convtranspose, "2R", 2),
])
def test_upsample_factories(rng, factory, scale_mode, factor):
    x = jnp.asarray(rng.random((1, 6, 6, 8), dtype=np.float32))
    m = factory(out_ch=4, mode=scale_mode)
    out = m.init_with_output(jax.random.PRNGKey(0), x)[0]
    assert out.shape == (1, 6 * factor, 6 * factor, 4)


@pytest.mark.parametrize("factory,out_h", [
    (blocks.downsample_strideconv, 6),
    # the maxpool variant's tail conv is unpadded in the reference
    # (basicblock.py:507-517): 12 -> pool/2 -> 6 -> conv3 pad0 -> 4
    (blocks.downsample_maxpool, 4),
    (blocks.downsample_avgpool, 6),
])
def test_downsample_factories(rng, factory, out_h):
    x = jnp.asarray(rng.random((1, 12, 12, 8), dtype=np.float32))
    m = factory(out_ch=4, mode="2R")
    out = m.init_with_output(jax.random.PRNGKey(0), x)[0]
    assert out.shape[1] == out_h and out.shape[-1] == 4


def test_nonlocal_downsample_variant(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 8), dtype=np.float32))
    _, out = _init_apply(blocks.NonLocalBlock2D(nc=8, downsample=True), x)
    assert out.shape == x.shape
