"""Core numerical ops: SCI physics, Bayer/CFA handling, demosaicing, TV prox,
image-quality metrics, and fused Pallas kernels for the solver hot path."""

from adaptivepnp_sci_tpu.ops import bayer, demosaic, metrics, physics, tv  # noqa: F401
