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

``dtype=jnp.bfloat16`` runs the conv/BN chains in bf16 with fp32 residuals:
parameters stay fp32, each DenBlock's U-Net computes in bf16 (half the HBM
traffic on the memory-bound 512^2 path), and the ``in1 - x`` residual plus
the block outputs are accumulated in fp32 so solver-state precision is
unaffected. Default None = full fp32.

TPU hot path: :meth:`FastDVDnet.seq_circular` denoises a whole circular
B-frame sequence (``fastdvdnet.py:82-146`` semantics) with temp1 evaluated
ONCE per distinct triplet. The per-window form evaluates temp1 on 3 triplets
per window (3B evaluations for B windows), but circular windows share
triplets — only the B consecutive triplets ``(c-1, c, c+1) mod B`` are
distinct, so the sequence needs B temp1 + B temp2 evaluations instead of
3B + B: identical math (shared weights, frozen BN), half the conv work.
"""

from __future__ import annotations

from typing import Any

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


def _bn(x: Array, train: bool, name: str, dtype=None) -> Array:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name, dtype=dtype)(x)


class CvBlock(nn.Module):
    """(Conv => BN => ReLU) x 2."""

    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = _conv(x, self.out_ch, "conv0", dtype=self.dtype)
        x = _bn(x, train, "bn0", self.dtype)
        x = nn.relu(x)
        x = _conv(x, self.out_ch, "conv1", dtype=self.dtype)
        x = _bn(x, train, "bn1", self.dtype)
        return nn.relu(x)


class _GroupedAsDenseConv(nn.Module):
    """The per-frame grouped 3x3 conv computed as a block-diagonal DENSE
    contraction.

    XLA's grouped conv at (512^2, Cin/group=4) runs at ~1.4 TF/s on the MXU
    (the tiny per-group reduce dim wastes the systolic array); scattering
    the same weights into a zero block-diagonal (3,3,Cin,Cout) kernel and
    running one dense conv is mathematically identical — including
    gradients, which flow only through the scattered block positions, so
    online adaptation matches the reference's grouped-conv autograd — and
    measured ~6x faster. Parameter name/shape match ``nn.Conv(
    feature_group_count=groups)`` exactly for checkpoint compatibility.
    """

    out_ch: int
    groups: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import jax

        cin = x.shape[-1]
        cg = cin // self.groups
        og = self.out_ch // self.groups
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cg, self.out_ch)
        )
        dense = jnp.zeros((3, 3, cin, self.out_ch), kernel.dtype)
        for g in range(self.groups):
            dense = dense.at[
                :, :, g * cg : (g + 1) * cg, g * og : (g + 1) * og
            ].set(kernel[:, :, :, g * og : (g + 1) * og])
        if self.dtype is not None:
            x = x.astype(self.dtype)
            dense = dense.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x, dense, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class InputCvBlock(nn.Module):
    """Grouped per-frame conv (+BN+ReLU) then fusion conv (+BN+ReLU)."""

    num_in_frames: int
    out_ch: int
    interm_ch: int = 30
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = _GroupedAsDenseConv(self.num_in_frames * self.interm_ch,
                                self.num_in_frames, dtype=self.dtype,
                                name="conv0")(x)
        x = _bn(x, train, "bn0", self.dtype)
        x = nn.relu(x)
        x = _conv(x, self.out_ch, "conv1", dtype=self.dtype)
        x = _bn(x, train, "bn1", self.dtype)
        return nn.relu(x)


class DownBlock(nn.Module):
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # torch pads (1,1) symmetrically for the strided conv; XLA "SAME"
        # would pad (0,1) and sample different positions.
        x = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv0", dtype=self.dtype)(x)
        x = _bn(x, train, "bn0", self.dtype)
        x = nn.relu(x)
        return CvBlock(self.out_ch, dtype=self.dtype, name="cvblock")(x, train)


class UpBlock(nn.Module):
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = CvBlock(x.shape[-1], dtype=self.dtype, name="cvblock")(x, train)
        x = _conv(x, self.out_ch * 4, "conv0", dtype=self.dtype)
        return depth_to_space(x, 2)


class OutputCvBlock(nn.Module):
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        in_ch = x.shape[-1]
        x = _conv(x, in_ch, "conv0", dtype=self.dtype)
        x = _bn(x, train, "bn0", self.dtype)
        x = nn.relu(x)
        return _conv(x, self.out_ch, "conv1", dtype=self.dtype)


class DenBlock(nn.Module):
    """U-Net denoising block over a 3-frame triplet; residual from center."""

    num_color_channels: int = 3
    chs: tuple[int, int, int] = (32, 64, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, in0: Array, in1: Array, in2: Array, noise_map: Array,
                 train: bool = False) -> Array:
        x = jnp.concatenate(
            [in0, noise_map, in1, noise_map, in2, noise_map], axis=-1
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        dt = self.dtype
        x0 = InputCvBlock(3, self.chs[0], dtype=dt, name="inc")(x, train)
        x1 = DownBlock(self.chs[1], dtype=dt, name="downc0")(x0, train)
        x2 = DownBlock(self.chs[2], dtype=dt, name="downc1")(x1, train)
        x2 = UpBlock(self.chs[1], dtype=dt, name="upc2")(x2, train)
        x1 = UpBlock(self.chs[0], dtype=dt, name="upc1")(x1 + x2, train)
        x = OutputCvBlock(self.num_color_channels, dtype=dt,
                          name="outc")(x0 + x1, train)
        # fp32 residual: the skip from the center frame and the final
        # accumulate stay full precision regardless of the compute dtype
        return in1.astype(jnp.float32) - x.astype(jnp.float32)


# per-block remat: bounds backward-pass activation memory to one DenBlock
# (online adaptation differentiates through 8 windows at full resolution —
# unremat'd that is ~25GB of activations). ``train`` is static (it selects
# the BatchNorm branch at trace time).
_RematDenBlock = nn.remat(DenBlock, static_argnums=(5,))


class FastDVDnet(nn.Module):
    """Input ``(N, 5, H, W, C)`` windows + scalar/``(N,)`` sigma -> ``(N, H, W, C)``."""

    num_input_frames: int = 5
    num_color_channels: int = 3
    #: compute dtype for the DenBlock conv/BN chains (None = fp32;
    #: jnp.bfloat16 = bf16 compute with fp32 params + residuals)
    dtype: Any = None
    #: rematerialize DenBlocks in the backward pass (True = one block's
    #: activations live at a time — required for fp32 adaptation at 512^2,
    #: ~25GB unremat'd; False = store activations, ~1.7x faster adaptation
    #: backward — fits HBM with dtype=bf16, which halves the footprint)
    remat: bool = True

    def setup(self):
        block = _RematDenBlock if self.remat else DenBlock
        self.temp1 = block(self.num_color_channels, dtype=self.dtype)
        self.temp2 = block(self.num_color_channels, dtype=self.dtype)

    def __call__(self, windows: Array, sigma: Array, train: bool = False) -> Array:
        n, nf, h, w, c = windows.shape
        assert nf == self.num_input_frames, windows.shape
        noise_map = jnp.broadcast_to(
            jnp.asarray(sigma, windows.dtype).reshape(-1, 1, 1, 1), (n, h, w, 1)
        )
        f = [windows[:, i] for i in range(nf)]

        if train:
            # train-mode BatchNorm statistics must be computed per call
            # (reference parity); keep the three triplets separate
            x20 = self.temp1(f[0], f[1], f[2], noise_map, True)
            x21 = self.temp1(f[1], f[2], f[3], noise_map, True)
            x22 = self.temp1(f[2], f[3], f[4], noise_map, True)
            return self.temp2(x20, x21, x22, noise_map, True).astype(jnp.float32)

        # eval: the three shared-weight triplet calls fold into ONE batched
        # call (3N) — identical math with frozen BN, 3x fewer conv launches
        in0 = jnp.concatenate([f[0], f[1], f[2]], axis=0)
        in1 = jnp.concatenate([f[1], f[2], f[3]], axis=0)
        in2 = jnp.concatenate([f[2], f[3], f[4]], axis=0)
        nm3 = jnp.concatenate([noise_map] * 3, axis=0)
        x2 = self.temp1(in0, in1, in2, nm3, False)
        x20, x21, x22 = x2[:n], x2[n : 2 * n], x2[2 * n :]
        return self.temp2(x20, x21, x22, noise_map, False).astype(jnp.float32)

    def _noise_map(self, like: Array, sigma: Array) -> Array:
        b, h, w, _ = like.shape
        return jnp.broadcast_to(
            jnp.asarray(sigma, like.dtype).reshape(-1, 1, 1, 1), (b, h, w, 1)
        )

    def triplet_stage1(self, prev: Array, cur: Array, nxt: Array,
                       sigma: Array) -> Array:
        """temp1 on one triplet per sequence position (eval mode). Exposed
        separately so frame-sharded callers can halo-exchange between the
        two stages (``parallel/sharded.py``)."""
        return self.temp1(prev, cur, nxt, self._noise_map(cur, sigma), False)

    def triplet_stage2(self, prev: Array, cur: Array, nxt: Array,
                       sigma: Array) -> Array:
        """temp2 fusing three consecutive temp1 outputs (eval mode)."""
        out = self.temp2(prev, cur, nxt, self._noise_map(cur, sigma), False)
        return out.astype(jnp.float32)

    def seq_circular(self, frames: Array, sigma: Array) -> Array:
        """Denoise a circular B-frame sequence: ``(B, H, W, C) -> (B, H, W, C)``.

        Equivalent to gathering the B circular 5-frame windows
        (``window_indices``) and calling ``__call__`` per window, but temp1
        runs once per DISTINCT triplet (B evaluations, not 3B): window f's
        triplets are centered at ``f-1, f, f+1 (mod B)``, so across all B
        windows only the B consecutive circular triplets occur. Eval-mode
        only (frozen BN — the solver/adaptation hot path).
        """
        prev = jnp.roll(frames, 1, axis=0)    # frame c-1 at row c
        nxt = jnp.roll(frames, -1, axis=0)    # frame c+1 at row c
        t1 = self.triplet_stage1(prev, frames, nxt, sigma)
        return self.triplet_stage2(
            jnp.roll(t1, 1, axis=0), t1, jnp.roll(t1, -1, axis=0), sigma
        )


class SpatialDnCNN(nn.Module):
    """Single-frame spatial U-Net denoiser — the reference's dormant
    ``spatialDnCNN`` (``packages/fastdvdnet/models.py:92-144``; defined in
    the model file but never placed on a driver path).

    Same conv vocabulary as :class:`DenBlock` — a 1-frame grouped input
    conv (30 intermediate channels), channels (32, 64, 128) down/up U-Net,
    residual output ``in - f(in, sigma)``. Input ``(N, H, W, C)`` frames +
    scalar/``(N,)`` sigma -> ``(N, H, W, C)``.
    """

    num_color_channels: int = 3
    chs: tuple[int, int, int] = (32, 64, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, sigma: Array, train: bool = False) -> Array:
        n, h, w, _ = x.shape
        noise_map = jnp.broadcast_to(
            jnp.asarray(sigma, x.dtype).reshape(-1, 1, 1, 1), (n, h, w, 1)
        )
        inp = jnp.concatenate([x, noise_map], axis=-1)
        if self.dtype is not None:
            inp = inp.astype(self.dtype)
        dt = self.dtype
        x0 = InputCvBlock(1, self.chs[0], dtype=dt, name="inc")(inp, train)
        x1 = DownBlock(self.chs[1], dtype=dt, name="downc0")(x0, train)
        x2 = DownBlock(self.chs[2], dtype=dt, name="downc1")(x1, train)
        x2 = UpBlock(self.chs[1], dtype=dt, name="upc2")(x2, train)
        x1 = UpBlock(self.chs[0], dtype=dt, name="upc1")(x1 + x2, train)
        out = OutputCvBlock(self.num_color_channels, dtype=dt,
                            name="outc")(x0 + x1, train)
        # fp32 residual regardless of compute dtype (same policy as DenBlock)
        return x.astype(jnp.float32) - out.astype(jnp.float32)
