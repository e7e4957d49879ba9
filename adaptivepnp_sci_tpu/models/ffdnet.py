"""FFDNet denoiser (Zhang, Zuo & Zhang, TIP 2018) in Flax, NHWC.

Architecture parity with the KAIR variant the reference's main driver loads
(``/root/reference/models/network_ffdnet.py:27-69``; color: nc=96, nb=12,
gray: nc=64, nb=15 per ``two_stage_ADMM_Online_FFD_Warm.py:29-37``):
replication-pad to even size -> space-to-depth(2) -> concat sigma map ->
``nb`` 3x3 convs with ReLU (no norm) -> depth-to-space(2) -> crop.

Weights convert 1:1 from ``model_zoo/ffdnet_color.pth`` /
``ffdnet_gray.pth`` via :mod:`adaptivepnp_sci_tpu.models.convert`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from adaptivepnp_sci_tpu.models.common import (
    depth_to_space,
    replication_pad_to_even,
    space_to_depth,
)


class FFDNet(nn.Module):
    """sigma-conditioned CNN denoiser. Input ``(N, H, W, C)`` in [0, 1]."""

    in_nc: int = 3
    out_nc: int = 3
    nc: int = 96
    nb: int = 12
    dtype: jnp.dtype = jnp.float32
    interior_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: Array, sigma: Array) -> Array:
        """Denoise ``x`` at noise level ``sigma`` (scalar or per-sample (N,))."""
        h, w = x.shape[1], x.shape[2]
        x, _, _ = replication_pad_to_even(x)

        x = space_to_depth(x, 2)
        sigma = jnp.broadcast_to(
            jnp.asarray(sigma, x.dtype).reshape(-1, 1, 1, 1),
            (x.shape[0], x.shape[1], x.shape[2], 1),
        )
        x = jnp.concatenate([x, sigma], axis=-1).astype(self.dtype)

        # ``interior_dtype`` (e.g. bf16) runs the nb-2 interior convs at
        # reduced precision while the endpoint convs — where the raw image
        # enters and the residual estimate leaves — stay at ``dtype``.
        idt = self.interior_dtype or self.dtype

        x = nn.Conv(self.nc, (3, 3), padding="SAME", dtype=self.dtype, name="conv_0")(x)
        x = nn.relu(x).astype(idt)
        for i in range(self.nb - 2):
            x = nn.Conv(
                self.nc, (3, 3), padding="SAME", dtype=idt, name=f"conv_{i + 1}"
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            self.out_nc * 4, (3, 3), padding="SAME", dtype=self.dtype,
            name=f"conv_{self.nb - 1}",
        )(x.astype(self.dtype))

        x = depth_to_space(x.astype(jnp.float32), 2)
        return x[:, :h, :w]


def ffdnet_color() -> FFDNet:
    """The color config loaded by the main reconstruction driver."""
    return FFDNet(in_nc=3, out_nc=3, nc=96, nb=12)


def ffdnet_gray() -> FFDNet:
    return FFDNet(in_nc=1, out_nc=1, nc=64, nb=15)
