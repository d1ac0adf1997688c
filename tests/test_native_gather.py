"""Native batch-gather kernel vs numpy reference."""
import numpy as np

from flow_factory_tpu.data.native_gather import gather_rows, native_available


def test_gather_matches_numpy():
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((64, 33, 7)).astype(np.float32)
    idx = rng.integers(0, 64, size=16)
    out = gather_rows(arr, idx)
    np.testing.assert_array_equal(out, arr[idx])


def test_gather_large_multithreaded_path():
    rng = np.random.default_rng(1)
    arr = (rng.standard_normal((128, 64 * 1024)).astype(np.float32))  # 32MB: threaded branch
    idx = rng.permutation(128)[:32]
    out = gather_rows(arr, idx)
    np.testing.assert_array_equal(out, arr[idx])


def test_native_builds_here():
    # this image has g++; the kernel must actually build and load
    assert native_available()
