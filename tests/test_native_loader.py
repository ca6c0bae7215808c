"""Native .sosq sequence streamer: build, roundtrip, prefetch order (C17)."""

import numpy as np
import pytest

from sosvo.data.native_loader import SosqReader, write_sosq, _build_lib


@pytest.fixture(scope="module")
def lib():
    try:
        return _build_lib()
    except Exception as e:  # pragma: no cover - toolchain missing
        pytest.skip(f"native toolchain unavailable: {e}")


def _frames(f=12, h=32, w=48, seed=0):
    return np.random.default_rng(seed).random((f, h, w)).astype(np.float32)


def test_sosq_sequential_roundtrip(tmp_path, lib):
    frames = _frames()
    p = tmp_path / "seq.sosq"
    write_sosq(p, frames, compressed=True)
    with SosqReader(p, readahead=3) as r:
        assert (len(r), r.height, r.width) == (12, 32, 48)
        for i in range(len(r)):
            np.testing.assert_array_equal(r.next(), frames[i])


def test_sosq_uncompressed_and_random_access(tmp_path, lib):
    frames = _frames(f=8)
    p = tmp_path / "seq_raw.sosq"
    write_sosq(p, frames, compressed=False)
    with SosqReader(p) as r:
        np.testing.assert_array_equal(r.get(5), frames[5])
        np.testing.assert_array_equal(r.get(1), frames[1])  # seek backwards
        np.testing.assert_array_equal(r.next(), frames[2])  # resumes after 1
