"""Flax denoiser / demosaicker plugins: FFDNet, FastDVDnet, DDnet.

One canonical definition per network (the reference carries two incompatible
FFDNets and two DDnets); weights are convertible from the reference's PyTorch
checkpoints via :mod:`adaptivepnp_sci_tpu.models.convert`.
"""

from adaptivepnp_sci_tpu.models.ffdnet import FFDNet  # noqa: F401
