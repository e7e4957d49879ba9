"""Dataset I/O (MATLAB v7.3 .mat) and synthetic CACTI scene generation."""

from adaptivepnp_sci_tpu.data.synthetic import make_scene  # noqa: F401
