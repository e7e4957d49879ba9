"""Native prefetch ring: build, ordering, and content fidelity."""

import numpy as np
import pytest

from adaptivepnp_sci_tpu.data.native_loader import (
    iter_npy_prefetched,
    native_available,
)


@pytest.fixture
def npy_files(tmp_path, rng):
    paths, arrays = [], []
    for i in range(6):
        a = rng.random((4, 8, 8)).astype(np.float32) + i
        p = str(tmp_path / f"clip_{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, arrays


def test_native_library_builds():
    assert native_available(), "C++ toolchain present in this image; must build"


def test_prefetched_iteration_ordered_and_exact(npy_files):
    paths, arrays = npy_files
    out = list(iter_npy_prefetched(paths, workers=3, capacity=2))
    assert len(out) == len(arrays)
    for got, want in zip(out, arrays):
        np.testing.assert_array_equal(got, want)


def test_prefetched_single_worker(npy_files):
    paths, arrays = npy_files
    out = list(iter_npy_prefetched(paths, workers=1, capacity=1))
    for got, want in zip(out, arrays):
        np.testing.assert_array_equal(got, want)


def test_missing_file_terminates(tmp_path, npy_files):
    paths, _ = npy_files
    bad = paths[:2] + [str(tmp_path / "nope.npy")] + paths[2:]
    out = list(iter_npy_prefetched(bad, workers=2, capacity=2))
    assert len(out) == 2  # stops at the unreadable entry
