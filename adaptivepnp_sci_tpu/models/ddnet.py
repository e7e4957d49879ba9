"""DDnet joint demosaicking + denoising network in Flax (NHWC).

Architecture parity with the reference's rich dual-branch variant — the one
the main drivers load (``/root/reference/models/network_demosaicking.py:
33-124,184-463``, base width 20, no BatchNorm):

  * input: five sparse-RGB Bayer frames (circular window);
  * branch 1: frames summed to 1-channel mosaics -> ``temp1`` DenBlock
    triplets (residual ADD from center frame, broadcast 1->3 channels);
  * branch 2: mosaics packed to 4-channel half-res RGGB -> ``temp11``
    DenBlock4ChBayer triplets (residual, bilinear align-corners 2x upsample,
    4->3 fusion);
  * both branches fused by a shared ``temp2`` DenBlock and learned per-branch
    channel weights ``weight_tensor_{in,in2,out}``.

The reference's unused ``inc`` (noise-map) sub-blocks are not instantiated;
the converter drops their checkpoint entries.

``dtype=jnp.bfloat16`` runs each U-Net's conv chains in bf16 with fp32
residuals/endpoints (the same scheme measured PSNR-identical on
FastDVDnet's DenBlocks): parameters stay fp32, the center-frame residual
add, the bilinear upsample and the learned branch-weight mixing stay fp32.
The grouped per-frame input convs run as block-diagonal DENSE contractions
(``_GroupedAsDenseConv`` — mathematically identical incl. gradients; the
tiny per-group reduce dims of a real grouped conv waste the MXU).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from adaptivepnp_sci_tpu.models.common import (
    depth_to_space,
    upsample_bilinear_align_corners,
)
from adaptivepnp_sci_tpu.models.fastdvdnet import _GroupedAsDenseConv
from adaptivepnp_sci_tpu.ops import bayer

BASE_LAYER = 20


def _conv(x: Array, features: int, name: str, groups: int = 1,
          strides: tuple[int, int] = (1, 1), dtype=None) -> Array:
    return nn.Conv(
        features, (3, 3), strides=strides, padding=((1, 1), (1, 1)),
        use_bias=False, feature_group_count=groups, name=name, dtype=dtype,
    )(x)


class CvBlock(nn.Module):
    """(Conv => ReLU) x 2, no norm."""

    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(_conv(x, self.out_ch, "conv0", dtype=self.dtype))
        return nn.relu(_conv(x, self.out_ch, "conv1", dtype=self.dtype))


class InputCvBlock2(nn.Module):
    """Grouped per-frame conv => ReLU => fusion conv => ReLU (no noise map)."""

    num_in_frames: int
    out_ch: int
    interm_ch: int = 30
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = _GroupedAsDenseConv(self.num_in_frames * self.interm_ch,
                                self.num_in_frames, dtype=self.dtype,
                                name="conv0")(x)
        x = nn.relu(x)
        return nn.relu(_conv(x, self.out_ch, "conv1", dtype=self.dtype))


class DownBlock(nn.Module):
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(_conv(x, self.out_ch, "conv0", strides=(2, 2),
                          dtype=self.dtype))
        return CvBlock(self.out_ch, dtype=self.dtype, name="cvblock")(x)


class UpBlock(nn.Module):
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = CvBlock(x.shape[-1], dtype=self.dtype, name="cvblock")(x)
        x = _conv(x, self.out_ch * 4, "conv0", dtype=self.dtype)
        return depth_to_space(x, 2)


class OutputCvBlock(nn.Module):
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(_conv(x, x.shape[-1], "conv0", dtype=self.dtype))
        return _conv(x, self.out_ch, "conv1", dtype=self.dtype)


class DenBlock(nn.Module):
    """U-Net block, residual ADD from center frame (demosaicking variant)."""

    num_in_frames: int = 3
    out_ch: int = 3
    chs: tuple[int, int, int] = (BASE_LAYER, BASE_LAYER * 2, BASE_LAYER * 4)
    dtype: Any = None

    @nn.compact
    def __call__(self, in0: Array, in1: Array, in2: Array) -> Array:
        x = jnp.concatenate([in0, in1, in2], axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        dt = self.dtype
        x0 = InputCvBlock2(self.num_in_frames, self.chs[0], dtype=dt,
                           name="inc_1")(x)
        x1 = DownBlock(self.chs[1], dtype=dt, name="downc0")(x0)
        x2 = DownBlock(self.chs[2], dtype=dt, name="downc1")(x1)
        x2 = UpBlock(self.chs[1], dtype=dt, name="upc2")(x2)
        x1 = UpBlock(self.chs[0], dtype=dt, name="upc1")(x1 + x2)
        x = OutputCvBlock(self.out_ch, dtype=dt, name="outc")(x0 + x1)
        # fp32 residual: center-frame skip + accumulate stay full precision
        # (broadcasts 1-channel center over 3-channel estimate)
        return in1.astype(jnp.float32) + x.astype(jnp.float32)


class DenBlock4ChBayer(nn.Module):
    """Half-res 4-channel RGGB branch: residual + bilinear 2x + 4->3 fusion."""

    chs: tuple[int, int, int] = (BASE_LAYER, BASE_LAYER * 2, BASE_LAYER * 4)
    dtype: Any = None

    @nn.compact
    def __call__(self, in0: Array, in1: Array, in2: Array) -> Array:
        x = jnp.concatenate([in0, in1, in2], axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        dt = self.dtype
        x0 = InputCvBlock2(3, self.chs[0], dtype=dt, name="inc_1")(x)
        x1 = DownBlock(self.chs[1], dtype=dt, name="downc0")(x0)
        x2 = DownBlock(self.chs[2], dtype=dt, name="downc1")(x1)
        x2 = UpBlock(self.chs[1], dtype=dt, name="upc2")(x2)
        x1 = UpBlock(self.chs[0], dtype=dt, name="upc1")(x1 + x2)
        x = OutputCvBlock(4, dtype=dt, name="outc")(x0 + x1)
        # fp32 residual + bilinear upsample; fusion conv back in compute dtype
        x = in1.astype(jnp.float32) + x.astype(jnp.float32)
        x = upsample_bilinear_align_corners(x, 2)
        return OutputCvBlock(3, dtype=dt, name="fusion")(x).astype(jnp.float32)


class DDnet(nn.Module):
    """Joint demosaick+denoise of the center frame of a 5-frame window.

    Input ``(N, 5, H, W, 3)``: sparse-RGB-embedded Bayer frames (values in
    their CFA channel, zeros elsewhere). Output ``(N, H, W, 3)``.
    """

    num_input_frames: int = 5
    #: compute dtype for the three U-Nets' conv chains (None = fp32;
    #: jnp.bfloat16 = bf16 compute with fp32 params/residuals/mixing)
    dtype: Any = None

    @nn.compact
    def __call__(self, windows: Array) -> Array:
        n, nf, h, w, _ = windows.shape
        assert nf == self.num_input_frames, windows.shape

        a = self.param("weight_tensor_in", nn.initializers.ones, (9, 1, 1, 1, 1))
        a2 = self.param("weight_tensor_in2", nn.initializers.ones, (9, 1, 4, 1, 1))
        a3 = self.param("weight_tensor_out", nn.initializers.ones, (2, 1, 3, 1, 1))
        # torch stores NCHW-broadcast shapes; NHWC wants channels last
        a2_n = jnp.moveaxis(a2, 2, -1)  # (9, 1, 1, 1, 4)
        a3_n = jnp.moveaxis(a3, 2, -1)  # (2, 1, 1, 1, 3)

        mosaics = windows.sum(-1)                      # (N, 5, H, W)
        ones = [mosaics[:, i][..., None] for i in range(nf)]     # (N, H, W, 1)
        fours = [
            jnp.moveaxis(bayer.pack(mosaics[:, i]), 1, -1)       # (N, H/2, W/2, 4)
            for i in range(nf)
        ]

        # no BatchNorm anywhere: shared-weight triplet calls fold into ONE
        # batched call per block (identical math, 3x fewer conv launches)
        def cat(xs):
            return jnp.concatenate(xs, axis=0)

        temp1 = DenBlock(out_ch=3, dtype=self.dtype, name="temp1")
        x2 = temp1(
            cat([ones[0] * a[0, 0, 0], ones[1] * a[3, 0, 0], ones[2] * a[6, 0, 0]]),
            cat([ones[1] * a[1, 0, 0], ones[2] * a[4, 0, 0], ones[3] * a[7, 0, 0]]),
            cat([ones[2] * a[2, 0, 0], ones[3] * a[5, 0, 0], ones[4] * a[8, 0, 0]]),
        )
        x20, x21, x22 = x2[:n], x2[n : 2 * n], x2[2 * n :]

        temp11 = DenBlock4ChBayer(dtype=self.dtype, name="temp11")
        y2 = temp11(
            cat([fours[0] * a2_n[0], fours[1] * a2_n[3], fours[2] * a2_n[6]]),
            cat([fours[1] * a2_n[1], fours[2] * a2_n[4], fours[3] * a2_n[7]]),
            cat([fours[2] * a2_n[2], fours[3] * a2_n[5], fours[4] * a2_n[8]]),
        )
        y20, y21, y22 = y2[:n], y2[n : 2 * n], y2[2 * n :]

        temp2 = DenBlock(out_ch=3, dtype=self.dtype, name="temp2")
        out = temp2(cat([x20, y20]), cat([x21, y21]), cat([x22, y22]))
        return a3_n[0] * out[:n] + a3_n[1] * out[n:]


class ResidualBlockNoBN(nn.Module):
    """``x + conv2(relu(conv1(x)))`` with a 48-channel bottleneck — the
    reference's dormant ``ResidualBlock_noBN``
    (``models/network_demosaicking.py:126-136``; only used by the equally
    dormant pyramid ``encoder`` below)."""

    nf: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.relu(
            nn.Conv(48, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(x)
        )
        out = nn.Conv(self.nf, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv2")(out)
        return x + out


class PyramidEncoder(nn.Module):
    """4x-downscaling pyramid feature encoder — the reference's dormant
    ``encoder`` (``models/network_demosaicking.py:137-182``; defined in the
    model file, never instantiated by any driver).

    ``(N, H, W, 4)`` RGGB input -> ``(N, ceil(H/4), ceil(W/4), nf)``: two
    stride-2 head stages, ``n_rb`` residual blocks, then a 3-level feature
    pyramid (1x, 1/2, 1/4) merged by half-pixel bilinear upsampling
    (torch ``F.interpolate(align_corners=False)`` semantics) and a 7x7
    fusion conv. The reference's forward applies LeakyReLU(0.1) to head
    Sequentials that already END in LeakyReLU — a double application that
    scales negatives by 0.01, not 0.1; replicated exactly (it is not
    idempotent).
    """

    nf: int = 64
    n_rb: int = 5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def lrelu(v: Array) -> Array:
            return nn.leaky_relu(v, negative_slope=0.1)

        def conv(v: Array, ch: int, name: str, k: int = 3, s: int = 1) -> Array:
            p = k // 2
            return nn.Conv(ch, (k, k), strides=(s, s),
                           padding=((p, p), (p, p)), name=name)(v)

        x = lrelu(conv(x, self.nf * 2, "conv_first01_0", s=2))
        x = lrelu(lrelu(conv(x, self.nf, "conv_first01_2")))
        x = lrelu(conv(x, self.nf * 2, "conv_first02_0", s=2))
        x = lrelu(lrelu(conv(x, self.nf, "conv_first02_2")))

        fea_lr = lrelu(conv(x, self.nf, "conv_first"))
        for i in range(self.n_rb):
            fea_lr = ResidualBlockNoBN(self.nf, name=f"rbs_{i}")(fea_lr)

        d2 = lrelu(conv(fea_lr, self.nf, "d2_conv1", s=2))
        d2 = lrelu(conv(d2, self.nf, "d2_conv2"))
        d4 = lrelu(conv(d2, self.nf, "d4_conv1", s=2))
        d4 = lrelu(conv(d4, self.nf, "d4_conv2"))

        n, h, w, _ = fea_lr.shape

        def up(v: Array) -> Array:
            return jax.image.resize(v, (n, h, w, v.shape[-1]), "bilinear",
                                    antialias=False)

        out = jnp.concatenate([fea_lr, up(d2), up(d4)], axis=-1)
        return lrelu(conv(out, self.nf, "py_conv", k=7))
