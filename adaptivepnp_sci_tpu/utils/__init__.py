"""Logging, timing, and profiling utilities."""

from adaptivepnp_sci_tpu.utils.logging import get_logger  # noqa: F401


def enable_compile_cache(path: str = "~/.jax_bench_cache") -> None:
    """Persist XLA compilations across processes (the adaptive solver scan
    takes ~60s to compile; one cache hit amortizes it machine-wide)."""
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
