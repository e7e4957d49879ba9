"""Logging + timing helpers.

Replaces the reference's ad-hoc ``log.txt`` appends and per-package
``init_logger`` variants (``packages/fastdvdnet/utils.py:329-379``) with one
standard logging setup, and the ``time.time()`` spans around the x-update
(``dvp…online.py:123,143``) with a context-manager timer that blocks on
device completion (async dispatch otherwise makes spans meaningless).
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager


def get_logger(name: str = "adaptivepnp_sci_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger("adaptivepnp_sci_tpu").handlers:
        root = logging.getLogger("adaptivepnp_sci_tpu")
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        root.addHandler(handler)
        root.setLevel(logging.INFO)
    return logger


def add_file_handler(path: str) -> None:
    """Also append log records to a file (the drivers' ``log.txt`` behavior)."""
    handler = logging.FileHandler(path)
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    logging.getLogger("adaptivepnp_sci_tpu").addHandler(handler)


def git_revision(path: str = ".") -> str:
    """Current commit hash for run provenance (the reference's logger logs it,
    ``packages/fastdvdnet/utils.py:324-327``)."""
    import subprocess

    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=path, stderr=subprocess.DEVNULL
        ).decode().strip()
    except Exception:
        return "unknown"


@contextmanager
def device_timer(label: str, result_holder: dict | None = None):
    """Wall-clock a device computation; caller must pass arrays to block on
    via ``result_holder['out']`` before exiting the context."""
    import jax

    t0 = time.perf_counter()
    holder = result_holder if result_holder is not None else {}
    yield holder
    if "out" in holder:
        jax.block_until_ready(holder["out"])
    dt = time.perf_counter() - t0
    get_logger().info("%s: %.3fs", label, dt)
    holder["seconds"] = dt
