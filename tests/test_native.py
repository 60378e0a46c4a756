"""Native C++ rasterizer: parity with the pure-Python fallback + speed."""

import time

import numpy as np
import pytest

from prtp_tpu.native import native_available, rasterize_paths_native


def _python_reference(ax1, ay1, ax2, ay2, apath, num_paths, map_size):
    rows, cols = [], []
    for i in range(num_paths):
        sel = apath == i
        idxs = set()
        for x1, y1, x2, y2 in zip(ax1[sel], ay1[sel], ax2[sel], ay2[sel]):
            xl, xh = min(x1, x2), max(x1, x2)
            yl, yh = min(y1, y2), max(y1, y2)
            for x in range(xl, xh + 1):
                idxs.update(range(x * map_size + yl, x * map_size + yh + 1))
        rows.extend([i] * len(idxs))
        cols.extend(sorted(idxs))
    return np.array([rows, cols], dtype=np.int64)


def _random_arcs(rng, num_paths, arcs_per_path, map_size):
    n = num_paths * arcs_per_path
    ax1 = rng.integers(0, map_size, n).astype(np.int32)
    ay1 = rng.integers(0, map_size, n).astype(np.int32)
    ax2 = np.clip(ax1 + rng.integers(-6, 7, n), 0, map_size - 1).astype(np.int32)
    ay2 = np.clip(ay1 + rng.integers(-6, 7, n), 0, map_size - 1).astype(np.int32)
    apath = np.repeat(np.arange(num_paths), arcs_per_path).astype(np.int32)
    return ax1, ay1, ax2, ay2, apath


def test_native_builds():
    assert native_available(), "g++ build of raster.cpp failed"


def test_native_matches_python():
    rng = np.random.default_rng(0)
    args = _random_arcs(rng, num_paths=23, arcs_per_path=9, map_size=32)
    got = rasterize_paths_native(*args, 23, 32)
    assert got is not None
    expect = _python_reference(*args, 23, 32)
    np.testing.assert_array_equal(got, expect)


def test_native_empty_paths():
    # a path with no arcs must produce no entries but not break others
    ax = np.array([0, 5], np.int32)
    ay = np.array([0, 5], np.int32)
    bx = np.array([1, 6], np.int32)
    by = np.array([1, 6], np.int32)
    apath = np.array([0, 2], np.int32)  # path 1 has no arcs
    got = rasterize_paths_native(ax, ay, bx, by, apath, 3, 16)
    expect = _python_reference(ax, ay, bx, by, apath, 3, 16)
    np.testing.assert_array_equal(got, expect)


def test_native_speedup():
    rng = np.random.default_rng(1)
    args = _random_arcs(rng, num_paths=400, arcs_per_path=30, map_size=128)
    t0 = time.time()
    got = rasterize_paths_native(*args, 400, 128)
    t_native = time.time() - t0
    t0 = time.time()
    expect = _python_reference(*args, 400, 128)
    t_py = time.time() - t0
    np.testing.assert_array_equal(got, expect)
    assert t_native < t_py, (t_native, t_py)
