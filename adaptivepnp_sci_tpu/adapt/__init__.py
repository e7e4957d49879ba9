"""Online (per-scene, self-supervised) denoiser adaptation."""

from adaptivepnp_sci_tpu.adapt.online import AdaptConfig, make_adapt_fn, make_schedule  # noqa: F401
