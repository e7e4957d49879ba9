"""KAIR-style conv-block zoo in Flax (NHWC).

Feature parity with the reference's block library
(``/root/reference/models/basicblock.py``, byte-identical dupe at
``packages/ffdnet/basicblock.py``): the mode-string conv factory, residual /
attention / dense blocks, and the up/downsample factories. The reference
drivers only ever use ``conv`` + ``PixelUnShuffle`` (through FFDNet); the
rest of the zoo is provided for completeness so models built against the
reference library can be ported 1:1.

TPU-native notes: everything is NHWC (XLA's preferred conv layout);
PixelShuffle/UnShuffle are the pure reshapes in ``models.common``; nearest
upsampling is ``jnp.repeat`` (fuses into neighbouring elementwise ops);
``NonLocalBlock2D``'s attention is two batched matmuls over flattened
spatial — MXU-friendly at feature-map sizes.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from adaptivepnp_sci_tpu.models.common import depth_to_space, space_to_depth

# re-exports: the reference's pixel_(un)shuffle live here in KAIR
pixel_shuffle = depth_to_space
pixel_unshuffle = space_to_depth


def sequential(*fns: Callable[[Array], Array]) -> Callable[[Array], Array]:
    """Compose callables left-to-right (KAIR ``sequential`` flattens
    nn.Sequential args; with pure functions composition is enough)."""

    def apply(x: Array) -> Array:
        for f in fns:
            x = f(x)
        return x

    return apply


def _nearest_upsample(x: Array, r: int) -> Array:
    x = jnp.repeat(x, r, axis=-3)
    return jnp.repeat(x, r, axis=-2)


def _pool(x: Array, k: int, s: int, op: str) -> Array:
    if op == "max":
        return nn.max_pool(x, (k, k), strides=(s, s))
    return nn.avg_pool(x, (k, k), strides=(s, s))


class ConvBlock(nn.Module):
    """Mode-string layer chain — the KAIR ``conv`` factory
    (``basicblock.py:61-101``).

    Mode characters: ``C`` conv, ``T`` transposed conv, ``B`` BatchNorm,
    ``I`` InstanceNorm, ``R``/``r`` ReLU, ``L``/``l`` LeakyReLU,
    ``2``/``3``/``4`` PixelShuffle, ``U``/``u``/``v`` nearest upsample
    x2/x3/x4, ``M`` max pool, ``A`` avg pool. (In torch the upper/lowercase
    activation pairs differ only by in-place-ness — identical math here.)
    """

    out_ch: int = 64
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    bias: bool = True
    mode: str = "CBR"
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k, s, p = self.kernel_size, self.stride, self.padding
        for i, t in enumerate(self.mode):
            if t == "C":
                x = nn.Conv(self.out_ch, (k, k), strides=(s, s),
                            padding=((p, p), (p, p)), use_bias=self.bias,
                            name=f"conv{i}")(x)
            elif t == "T":
                # torch ConvTranspose2d output (in-1)*s - 2p + k; the zoo only
                # instantiates T with p=0 (upsample_convtranspose), where
                # flax VALID padding matches exactly
                assert p == 0, "transposed conv only supported with padding=0"
                x = nn.ConvTranspose(self.out_ch, (k, k), strides=(s, s),
                                     padding="VALID", use_bias=self.bias,
                                     transpose_kernel=True,
                                     name=f"convt{i}")(x)
            elif t == "B":
                # torch momentum 0.9 -> flax momentum 0.1 (opposite convention)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.1,
                                 epsilon=1e-4, name=f"bn{i}")(x)
            elif t == "I":
                x = nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                                 name=f"in{i}")(x)
            elif t in ("R", "r"):
                x = nn.relu(x)
            elif t in ("L", "l"):
                x = nn.leaky_relu(x, self.negative_slope)
            elif t in ("2", "3", "4"):
                x = depth_to_space(x, int(t))
            elif t == "U":
                x = _nearest_upsample(x, 2)
            elif t == "u":
                x = _nearest_upsample(x, 3)
            elif t == "v":
                x = _nearest_upsample(x, 4)
            elif t == "M":
                x = _pool(x, k, s, "max")
            elif t == "A":
                x = _pool(x, k, s, "avg")
            else:
                raise NotImplementedError(f"undefined mode char: {t!r}")
        return x


class ConditionalBatchNorm2d(nn.Module):
    """Class-conditional BN (``basicblock.py:156-172``): affine-free BN
    followed by per-class learned gamma/beta from an embedding table."""

    num_features: int
    num_classes: int

    @nn.compact
    def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
        x = nn.BatchNorm(use_running_average=not train, use_bias=False,
                         use_scale=False, name="bn")(x)
        # reference init (basicblock.py:161-163): gamma half ~ N(1, 0.02),
        # beta half zero — from-scratch training starts near identity
        def embed_init(key, shape, dtype=jnp.float32):
            n, two_f = shape
            f = two_f // 2
            gamma = 1.0 + 0.02 * jax.random.normal(key, (n, f), dtype)
            return jnp.concatenate([gamma, jnp.zeros((n, f), dtype)], -1)

        embed = nn.Embed(self.num_classes, self.num_features * 2,
                         embedding_init=embed_init, name="embed")(y)
        gamma, beta = jnp.split(embed, 2, axis=-1)
        shape = (-1, 1, 1, self.num_features)
        return gamma.reshape(shape) * x + beta.reshape(shape)


class ConcatBlock(nn.Module):
    """x -> concat(x, sub(x)) over channels (``basicblock.py:175-188``)."""

    sub: Callable[[Array], Array]

    def __call__(self, x: Array) -> Array:
        return jnp.concatenate([x, self.sub(x)], axis=-1)


class ShortcutBlock(nn.Module):
    """x -> x + sub(x) (``basicblock.py:191-208``)."""

    sub: Callable[[Array], Array]

    def __call__(self, x: Array) -> Array:
        return x + self.sub(x)


def _res_mode(mode: str) -> str:
    # KAIR lowers a leading activation so the residual path starts pre-act
    if mode and mode[0] in ("R", "L"):
        return mode[0].lower() + mode[1:]
    return mode


class ResBlock(nn.Module):
    """x + conv-chain(x) (``basicblock.py:211-227``)."""

    channels: int = 64
    kernel_size: int = 3
    bias: bool = True
    mode: str = "CRC"
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        res = ConvBlock(self.channels, self.kernel_size, 1,
                        self.kernel_size // 2, self.bias,
                        _res_mode(self.mode), self.negative_slope,
                        name="res")(x, train)
        return x + res


class IMDBlock(nn.Module):
    """Information multi-distillation block (Hui et al. 2019;
    ``basicblock.py:230-268``): three split-distill stages + 1x1 fuse,
    residual."""

    channels: int = 64
    kernel_size: int = 3
    bias: bool = True
    mode: str = "CL"
    d_rate: float = 0.25
    negative_slope: float = 0.05

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = self.channels
        d_nc = int(c * self.d_rate)
        r_nc = c - d_nc
        k, p = self.kernel_size, self.kernel_size // 2

        def stage(h, name):
            out = ConvBlock(c, k, 1, p, self.bias, self.mode,
                            self.negative_slope, name=name)(h, train)
            return out[..., :d_nc], out[..., d_nc:]

        d1, r1 = stage(x, "conv1")
        d2, r2 = stage(r1, "conv2")
        d3, r3 = stage(r2, "conv3")
        d4 = ConvBlock(d_nc, k, 1, p, self.bias, self.mode[0],
                       self.negative_slope, name="conv4")(r3, train)
        res = ConvBlock(c, 1, 1, 0, self.bias, self.mode[0],
                        self.negative_slope, name="conv1x1")(
            jnp.concatenate([d1, d2, d3, d4], axis=-1), train)
        return x + res


class ESA(nn.Module):
    """Enhanced spatial attention (``basicblock.py:271-295``): squeeze,
    stride-2 conv + 7/3 max pool, conv stack, bilinear up, gate."""

    channels: int = 64
    reduction: int = 4
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        r_nc = self.channels // self.reduction
        conv = lambda ch, k, s, p, name: nn.Conv(  # noqa: E731
            ch, (k, k), strides=(s, s), padding=((p, p), (p, p)),
            use_bias=self.bias, name=name)
        x1 = conv(r_nc, 1, 1, 0, "conv1")(x)
        x2 = conv(r_nc, 3, 2, 0, "conv2")(x1)
        x2 = nn.max_pool(x2, (7, 7), strides=(3, 3))
        x2 = nn.relu(conv(r_nc, 3, 1, 1, "conv3")(x2))
        x2 = nn.relu(conv(r_nc, 3, 1, 1, "conv4")(x2))
        x2 = conv(r_nc, 3, 1, 1, "conv5")(x2)
        # bilinear, align_corners=False (half-pixel centers = jax.image)
        x2 = jax.image.resize(x2, x2.shape[:-3] + x.shape[-3:-1] + x2.shape[-1:],
                              method="linear")
        x2 = conv(self.channels, 1, 1, 0, "conv6")(
            x2 + conv(r_nc, 1, 1, 0, "conv21")(x1))
        return x * jax.nn.sigmoid(x2)


class CFRB(nn.Module):
    """Cascaded feature-refinement block with ESA gate
    (``basicblock.py:298-330``)."""

    channels: int = 50
    kernel_size: int = 3
    bias: bool = True
    mode: str = "CL"
    d_rate: float = 0.5
    negative_slope: float = 0.05

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = self.channels
        d_nc = int(c * self.d_rate)
        k, p = self.kernel_size, self.kernel_size // 2
        act = (nn.relu if self.mode[-1] in ("R", "r")
               else lambda h: nn.leaky_relu(h, self.negative_slope))

        def cdist(h, name):  # 1x1 distilled branch
            return ConvBlock(d_nc, 1, 1, 0, self.bias, "C", name=name)(h, train)

        def crefine(h, name):  # 3x3 refinement branch
            return ConvBlock(c, k, 1, p, self.bias, "C", name=name)(h, train)

        d1 = cdist(x, "conv1_d")
        x = act(crefine(x, "conv1_r") + x)
        d2 = cdist(x, "conv2_d")
        x = act(crefine(x, "conv2_r") + x)
        d3 = cdist(x, "conv3_d")
        x = act(crefine(x, "conv3_r") + x)
        x = ConvBlock(d_nc, k, 1, p, self.bias, "C", name="conv4_d")(x, train)
        x = act(jnp.concatenate([d1, d2, d3, x], axis=-1))
        x = ConvBlock(c, 1, 1, 0, self.bias, "C", name="conv1x1")(x, train)
        return ESA(c, 4, True, name="esa")(x)


class CALayer(nn.Module):
    """Squeeze-and-excitation channel attention (``basicblock.py:333-348``)."""

    channels: int = 64
    reduction: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = jnp.mean(x, axis=(-3, -2), keepdims=True)
        y = nn.Conv(self.channels // self.reduction, (1, 1), name="fc0")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (1, 1), name="fc1")(y)
        return x * jax.nn.sigmoid(y)


class RCABlock(nn.Module):
    """Residual channel-attention block (``basicblock.py:354-367``)."""

    channels: int = 64
    kernel_size: int = 3
    bias: bool = True
    mode: str = "CRC"
    reduction: int = 16
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        res = ConvBlock(self.channels, self.kernel_size, 1,
                        self.kernel_size // 2, self.bias,
                        _res_mode(self.mode), self.negative_slope,
                        name="res")(x, train)
        res = CALayer(self.channels, self.reduction, name="ca")(res)
        return res + x


class RCAGroup(nn.Module):
    """nb RCABlocks + tail conv, residual (``basicblock.py:373-390``)."""

    channels: int = 64
    kernel_size: int = 3
    bias: bool = True
    mode: str = "CRC"
    reduction: int = 16
    nb: int = 12
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = x
        for i in range(self.nb):
            h = RCABlock(self.channels, self.kernel_size, self.bias,
                         self.mode, self.reduction, self.negative_slope,
                         name=f"rcab{i}")(h, train)
        h = ConvBlock(self.channels, mode="C", name="tail")(h, train)
        return h + x


class ResidualDenseBlock5C(nn.Module):
    """5-conv residual dense block, 0.2-scaled residual
    (``basicblock.py:393-413``)."""

    nc: int = 64
    gc: int = 32
    kernel_size: int = 3
    bias: bool = True
    mode: str = "CR"
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k, p = self.kernel_size, self.kernel_size // 2

        def cb(h, ch, mode, name):
            return ConvBlock(ch, k, 1, p, self.bias, mode,
                             self.negative_slope, name=name)(h, train)

        x1 = cb(x, self.gc, self.mode, "conv1")
        x2 = cb(jnp.concatenate([x, x1], -1), self.gc, self.mode, "conv2")
        x3 = cb(jnp.concatenate([x, x1, x2], -1), self.gc, self.mode, "conv3")
        x4 = cb(jnp.concatenate([x, x1, x2, x3], -1), self.gc, self.mode,
                "conv4")
        x5 = cb(jnp.concatenate([x, x1, x2, x3, x4], -1), self.nc,
                self.mode[:-1], "conv5")
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block, 3x RDB5C
    (``basicblock.py:416-436``)."""

    nc: int = 64
    gc: int = 32
    kernel_size: int = 3
    bias: bool = True
    mode: str = "CR"
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        out = x
        for i in range(3):
            out = ResidualDenseBlock5C(
                self.nc, self.gc, self.kernel_size, self.bias, self.mode,
                self.negative_slope, name=f"rdb{i + 1}")(out, train)
        return out * 0.2 + x


class NonLocalBlock2D(nn.Module):
    """Embedded-gaussian non-local attention (``basicblock.py:543-591``):
    ``x + W(softmax(theta(x) phi(x)^T) g(x))`` over flattened spatial —
    two batched matmuls (MXU) plus 1x1 convs."""

    nc: int = 64
    act_mode: str = "B"
    downsample: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        inter = self.nc // 2
        n, h, w, _ = x.shape
        theta = nn.Conv(inter, (1, 1), name="theta")(x).reshape(n, h * w, inter)
        if self.downsample:
            phi_in = nn.max_pool(x, (2, 2), strides=(2, 2))
            g_in = phi_in
        else:
            phi_in, g_in = x, x
        m = phi_in.shape[1] * phi_in.shape[2]
        phi = nn.Conv(inter, (1, 1), name="phi")(phi_in).reshape(n, m, inter)
        g = nn.Conv(inter, (1, 1), name="g")(g_in).reshape(n, m, inter)
        attn = jax.nn.softmax(jnp.einsum("nqc,nkc->nqk", theta, phi), axis=-1)
        y = jnp.einsum("nqk,nkc->nqc", attn, g).reshape(n, h, w, inter)
        y = ConvBlock(self.nc, 1, 1, 0, True, "C" + self.act_mode,
                      name="w")(y, train)
        return x + y


# ---------------------------------------------------------------------------
# up/downsample factories (``basicblock.py:446-540``): thin ConvBlock
# constructors, mode '2R'/'3BR'/... selects scale + optional norm/act
# ---------------------------------------------------------------------------

def _scale_of(mode: str, allowed: str = "234") -> int:
    assert len(mode) < 4 and mode[0] in allowed, f"bad factory mode {mode!r}"
    return int(mode[0])


def upsample_pixelshuffle(out_ch: int = 3, kernel_size: int = 3,
                          bias: bool = True, mode: str = "2R",
                          negative_slope: float = 0.2) -> ConvBlock:
    r = _scale_of(mode)
    return ConvBlock(out_ch * r * r, kernel_size, 1, kernel_size // 2, bias,
                     "C" + mode, negative_slope)


def upsample_upconv(out_ch: int = 3, kernel_size: int = 3, bias: bool = True,
                    mode: str = "2R", negative_slope: float = 0.2) -> ConvBlock:
    up = {2: "U", 3: "u", 4: "v"}[_scale_of(mode)]
    return ConvBlock(out_ch, kernel_size, 1, kernel_size // 2, bias,
                     up + "C" + mode[1:], negative_slope)


def upsample_convtranspose(out_ch: int = 3, bias: bool = True,
                           mode: str = "2R",
                           negative_slope: float = 0.2) -> ConvBlock:
    r = _scale_of(mode)
    return ConvBlock(out_ch, r, r, 0, bias, "T" + mode[1:], negative_slope)


def downsample_strideconv(out_ch: int = 64, bias: bool = True,
                          mode: str = "2R",
                          negative_slope: float = 0.2) -> ConvBlock:
    r = _scale_of(mode)
    return ConvBlock(out_ch, r, r, 0, bias, "C" + mode[1:], negative_slope)


def downsample_maxpool(out_ch: int = 64, kernel_size: int = 3,
                       bias: bool = True, mode: str = "2R",
                       negative_slope: float = 0.2, padding: int = 0):
    # KAIR's factory fixes the tail-conv padding at 0 regardless of kernel
    # size (basicblock.py:507); expose it as a parameter like KAIR does
    r = _scale_of(mode, "23")
    return _PoolThenConv(out_ch, kernel_size, r, "max", bias, mode[1:],
                         negative_slope, padding)


def downsample_avgpool(out_ch: int = 64, kernel_size: int = 3,
                       bias: bool = True, mode: str = "2R",
                       negative_slope: float = 0.2, padding: int = 1):
    # KAIR's avgpool tail-conv padding defaults to 1 regardless of kernel
    # size (basicblock.py:520)
    r = _scale_of(mode, "23")
    return _PoolThenConv(out_ch, kernel_size, r, "avg", bias, mode[1:],
                         negative_slope, padding)


class _PoolThenConv(nn.Module):
    """pool(r) then conv chain — the maxpool/avgpool downsample factories
    (the pool uses the scale as both kernel and stride, the conv keeps its
    own kernel size)."""

    out_ch: int
    kernel_size: int
    r: int
    pool: str
    bias: bool
    tail_mode: str
    negative_slope: float
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = _pool(x, self.r, self.r, self.pool)
        return ConvBlock(self.out_ch, self.kernel_size, 1, self.padding,
                         self.bias, "C" + self.tail_mode,
                         self.negative_slope, name="tail")(x, train)
