"""Logging, timing, and profiling utilities."""

from adaptivepnp_sci_tpu.utils.logging import get_logger  # noqa: F401
