"""FastDVDnet temporal video denoiser (Tassano et al., CVPR 2020) in Flax.

Architecture parity with the reference's vendored model
(``/root/reference/packages/fastdvdnet/models.py:16-253``): two cascaded
U-Net denoising blocks over 5-frame windows — ``temp1`` applied to the three
overlapping triplets, ``temp2`` fusing the three outputs. Each DenBlock:
grouped input conv with interleaved noise maps, two stride-2 downs, pixel
-shuffle ups, residual from the center frame. BatchNorm throughout.

NHWC; the window axis is a batch axis (the reference loops frames in Python,
``fastdvdnet.py:113-139``). ``train=False`` uses running BN stats — also the
mode used while *adapting* the convs online (BN-freeze,
``test_fastdvdnet.py:374-379``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from adaptivepnp_sci_tpu.models.common import depth_to_space


def _conv(x: Array, features: int, name: str, groups: int = 1,
          dtype=None) -> Array:
    return nn.Conv(
        features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
        feature_group_count=groups, name=name, dtype=dtype,
    )(x)


class CvBlock(nn.Module):
    """(Conv => BN => ReLU) x 2."""

    out_ch: int
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = _conv(x, self.out_ch, "conv0")
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        x = nn.relu(x)
        x = _conv(x, self.out_ch, "conv1")
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        return nn.relu(x)


class InputCvBlock(nn.Module):
    """Grouped per-frame conv (+BN+ReLU) then fusion conv (+BN+ReLU)."""

    num_in_frames: int
    out_ch: int
    interm_ch: int = 30
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = _conv(x, self.num_in_frames * self.interm_ch, "conv0",
                  groups=self.num_in_frames)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        x = nn.relu(x)
        x = _conv(x, self.out_ch, "conv1")
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        return nn.relu(x)


class DownBlock(nn.Module):
    out_ch: int
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # torch pads (1,1) symmetrically for the strided conv; XLA "SAME"
        # would pad (0,1) and sample different positions.
        x = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        x = nn.relu(x)
        return CvBlock(self.out_ch, self.train, name="cvblock")(x)


class UpBlock(nn.Module):
    out_ch: int
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = CvBlock(x.shape[-1], self.train, name="cvblock")(x)
        x = _conv(x, self.out_ch * 4, "conv0")
        return depth_to_space(x, 2)


class OutputCvBlock(nn.Module):
    out_ch: int
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        x = _conv(x, in_ch, "conv0")
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        x = nn.relu(x)
        return _conv(x, self.out_ch, "conv1")


class DenBlock(nn.Module):
    """U-Net denoising block over a 3-frame triplet; residual from center."""

    num_color_channels: int = 3
    chs: tuple[int, int, int] = (32, 64, 128)
    train: bool = False

    @nn.compact
    def __call__(self, in0: Array, in1: Array, in2: Array, noise_map: Array) -> Array:
        x = jnp.concatenate(
            [in0, noise_map, in1, noise_map, in2, noise_map], axis=-1
        )
        x0 = InputCvBlock(3, self.chs[0], train=self.train, name="inc")(x)
        x1 = DownBlock(self.chs[1], self.train, name="downc0")(x0)
        x2 = DownBlock(self.chs[2], self.train, name="downc1")(x1)
        x2 = UpBlock(self.chs[1], self.train, name="upc2")(x2)
        x1 = UpBlock(self.chs[0], self.train, name="upc1")(x1 + x2)
        x = OutputCvBlock(self.num_color_channels, self.train, name="outc")(x0 + x1)
        return in1 - x


class FastDVDnet(nn.Module):
    """Input ``(N, 5, H, W, C)`` windows + scalar/``(N,)`` sigma -> ``(N, H, W, C)``."""

    num_input_frames: int = 5
    num_color_channels: int = 3

    @nn.compact
    def __call__(self, windows: Array, sigma: Array, train: bool = False) -> Array:
        n, nf, h, w, c = windows.shape
        assert nf == self.num_input_frames, windows.shape
        noise_map = jnp.broadcast_to(
            jnp.asarray(sigma, windows.dtype).reshape(-1, 1, 1, 1), (n, h, w, 1)
        )
        f = [windows[:, i] for i in range(nf)]

        # per-block remat: bounds backward-pass activation memory to one
        # DenBlock (online adaptation differentiates through 8 windows at
        # full resolution — unremat'd that is ~25GB of activations)
        Block = nn.remat(DenBlock, static_argnums=())
        temp1 = Block(self.num_color_channels, train=train, name="temp1")
        temp2 = Block(self.num_color_channels, train=train, name="temp2")

        if train:
            # train-mode BatchNorm statistics must be computed per call
            # (reference parity); keep the three triplets separate
            x20 = temp1(f[0], f[1], f[2], noise_map)
            x21 = temp1(f[1], f[2], f[3], noise_map)
            x22 = temp1(f[2], f[3], f[4], noise_map)
            return temp2(x20, x21, x22, noise_map).astype(jnp.float32)

        # eval: the three shared-weight triplet calls fold into ONE batched
        # call (3N) — identical math with frozen BN, 3x fewer conv launches
        in0 = jnp.concatenate([f[0], f[1], f[2]], axis=0)
        in1 = jnp.concatenate([f[1], f[2], f[3]], axis=0)
        in2 = jnp.concatenate([f[2], f[3], f[4]], axis=0)
        nm3 = jnp.concatenate([noise_map] * 3, axis=0)
        x2 = temp1(in0, in1, in2, nm3)
        x20, x21, x22 = x2[:n], x2[n : 2 * n], x2[2 * n :]
        return temp2(x20, x21, x22, noise_map).astype(jnp.float32)
