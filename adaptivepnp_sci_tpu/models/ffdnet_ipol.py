"""FFDNet, IPOL variant (Tassano et al., IPOL 2019) in Flax, NHWC.

The second FFDNet family in the reference — used by its standalone training /
testing scripts (``/root/reference/packages/ffdnet/models.py:18-105``), with
checkpoints ``packages/ffdnet/models/net_{rgb,gray}.pth`` present in the
snapshot. Differences from the KAIR variant (:mod:`.ffdnet`):

  * the noise map has C channels and is concatenated BEFORE the
    space-to-depth features (``functions.py:49-53``);
  * DnCNN body: bias-free convs with BatchNorm on the middle layers;
  * the network predicts the NOISE; callers denoise via
    ``clamp(noisy - out, 0, 1)`` (``test_ffdnet_ipol.py:97-99``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from adaptivepnp_sci_tpu.models.common import depth_to_space, space_to_depth


class FFDNetIPOL(nn.Module):
    """Returns the predicted noise map for input ``(N, H, W, C)``."""

    in_nc: int = 3
    nc: int = 96
    nb: int = 12
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, sigma: Array, train: bool | None = None) -> Array:
        train = self.train if train is None else train
        n, h, w, c = x.shape
        assert c == self.in_nc, x.shape

        feats = space_to_depth(x, 2)
        noise_map = jnp.broadcast_to(
            jnp.asarray(sigma, x.dtype).reshape(-1, 1, 1, 1),
            (n, h // 2, w // 2, c),
        )
        # IPOL concatenates the noise map FIRST (functions.py:53)
        y = jnp.concatenate([noise_map, feats], axis=-1)

        y = nn.Conv(self.nc, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv_0")(y)
        y = nn.relu(y)
        for i in range(self.nb - 2):
            y = nn.Conv(self.nc, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, name=f"conv_{i + 1}")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i + 1}")(y)
            y = nn.relu(y)
        y = nn.Conv(self.in_nc * 4, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name=f"conv_{self.nb - 1}")(y)
        return depth_to_space(y, 2)

    def denoise(self, variables, noisy: Array, sigma: Array) -> Array:
        """Convenience: ``clamp(noisy - predicted_noise, 0, 1)``."""
        return jnp.clip(noisy - self.apply(variables, noisy, sigma), 0.0, 1.0)


def ffdnet_ipol_rgb() -> FFDNetIPOL:
    return FFDNetIPOL(in_nc=3, nc=96, nb=12)


def ffdnet_ipol_gray() -> FFDNetIPOL:
    return FFDNetIPOL(in_nc=1, nc=64, nb=15)
