"""VGG19 feature extractor for perceptual losses (inventory parity).

Reference parity: ``models/network_feature.py:16-44`` — a torchvision VGG19
``features`` trunk cut at a chosen layer, used for perceptual loss. It is
NOT on the reconstruction path (nothing imports it in the drivers); provided
here for completeness with a converter that accepts torchvision
``vgg19`` state dicts (this image has no torchvision weights baked in).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

# VGG19 'features' plan: conv channel widths with 'M' = maxpool
_VGG19_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGGFeatures(nn.Module):
    """Features of ``(N, H, W, 3)`` RGB in [0,1] up to ``feature_layer``
    (torch Sequential index; default 34 = relu5_4 input conv, matching the
    reference's default cut)."""

    feature_layer: int = 34
    use_input_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_input_norm:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        torch_idx = 0
        for width in _VGG19_PLAN:
            if torch_idx >= self.feature_layer:
                break
            if width == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                torch_idx += 1
            else:
                x = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv_{torch_idx}")(x)
                torch_idx += 1
                if torch_idx >= self.feature_layer:
                    break
                x = nn.relu(x)
                torch_idx += 1
        return x


def vgg_variables_from_torch(state_dict) -> dict:
    """Convert a torchvision ``vgg19().features`` state dict
    (``features.{i}.weight/bias`` or ``{i}.weight/bias``)."""
    from adaptivepnp_sci_tpu.models.convert import conv_kernel

    params: dict = {}
    for k, v in state_dict.items():
        k = k.removeprefix("features.")
        idx, leaf = k.split(".")
        name = f"conv_{idx}"
        entry = params.setdefault(name, {})
        if leaf == "weight":
            entry["kernel"] = conv_kernel(np.asarray(v))
        else:
            entry["bias"] = np.asarray(v)
    return {"params": params}


def perceptual_loss(variables, model: VGGFeatures, pred: Array, target: Array) -> Array:
    """MSE in VGG feature space."""
    fp = model.apply(variables, pred)
    ft = model.apply(variables, target)
    return jnp.mean((fp - ft) ** 2)
