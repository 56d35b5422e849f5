"""Native C++ txt IO (viforssms_tpu/native): format + round-trip parity.

The native writer must be byte-identical to ``np.savetxt`` defaults and the
native reader must match ``np.loadtxt`` (including 1-D squeeze semantics), so
datasets and exports interchange with the reference scripts
(``AR.py:366-374, 323-362``).
"""

import os

import numpy as np
import pytest

from viforssms_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native library"
)


def test_write_byte_identical_to_numpy(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(scale=1e3, size=(57, 13))
    a[0, 0] = 0.0
    a[1, 2] = -0.0
    a[2, 3] = 1e-310  # subnormal
    a[3, 4] = np.inf
    a[4, 5] = -np.inf
    a[5, 6] = np.nan
    native.savetxt(tmp_path / "n.txt", a)
    np.savetxt(tmp_path / "np.txt", a, fmt="%.18e")
    assert (tmp_path / "n.txt").read_bytes() == (tmp_path / "np.txt").read_bytes()


def test_roundtrip_exact(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(101, 7))
    native.savetxt(tmp_path / "a.txt", a)
    b = native.loadtxt(tmp_path / "a.txt")
    np.testing.assert_array_equal(a, b)  # %.18e is lossless for float64


@pytest.mark.parametrize("shape", [(1, 9), (9, 1), (3, 4)])
def test_loadtxt_matches_numpy_squeeze(tmp_path, shape):
    a = np.arange(np.prod(shape), dtype=np.float64).reshape(shape)
    np.savetxt(tmp_path / "m.txt", a)
    got = native.loadtxt(tmp_path / "m.txt")
    want = np.loadtxt(tmp_path / "m.txt")
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_loadtxt_reads_reference_style_files(tmp_path):
    # loose formatting: mixed spacing, blank lines, no trailing newline
    (tmp_path / "loose.txt").write_text("1 2.5  3e-2\n\n4\t5 6.25\n7 8 9.5")
    got = native.loadtxt(tmp_path / "loose.txt")
    np.testing.assert_array_equal(
        got, [[1, 2.5, 3e-2], [4, 5, 6.25], [7, 8, 9.5]]
    )


def test_loadtxt_falls_back_on_malformed(tmp_path):
    (tmp_path / "bad.txt").write_text("# comment header\n1 2\n3 4\n")
    got = native.loadtxt(tmp_path / "bad.txt")  # defers to np.loadtxt
    np.testing.assert_array_equal(got, [[1, 2], [3, 4]])


def test_series_io_roundtrip(tmp_path):
    from viforssms_tpu.data.generate import ObservedSeries
    from viforssms_tpu.data.io import load_series_2d, save_series

    rng = np.random.default_rng(2)
    obs = rng.normal(size=(2, 40)).astype(np.float32)
    obs_bin = (rng.random((2, 40)) < 0.4).astype(np.float32)
    tt = rng.integers(0, 5, (2, 40)).astype(np.float32)
    save_series(str(tmp_path), "LV", ObservedSeries(obs, obs_bin, tt, obs))
    o, b, t = load_series_2d(str(tmp_path), "LV")
    np.testing.assert_allclose(o, obs, rtol=1e-6)
    np.testing.assert_array_equal(b, obs_bin)
    np.testing.assert_array_equal(t, tt)


def test_threaded_paths_consistent(tmp_path, monkeypatch):
    """Forcing many threads (more than rows/chunks) must not change output."""
    rng = np.random.default_rng(3)
    a = rng.normal(size=(5, 3))
    native.savetxt(tmp_path / "t1.txt", a)
    monkeypatch.setenv("VIFORSSMS_FASTIO_THREADS", "64")
    native.savetxt(tmp_path / "t64.txt", a)
    assert (tmp_path / "t1.txt").read_bytes() == (tmp_path / "t64.txt").read_bytes()
    np.testing.assert_array_equal(
        native.loadtxt(tmp_path / "t64.txt"), native.loadtxt(tmp_path / "t1.txt")
    )
