"""Parity tests for the native C++ tar shard loader (native/genref_loader.cpp).

The native index/read path and the pure-Python tarfile fallback must agree
byte-for-byte on real tar features: ustar names, PAX long-name extensions,
GNU longlink, odd (non-512-multiple) member sizes, and directory members.
train/data.py silently prefers the native path, so divergence would corrupt
training samples without any error.
"""

import io
import tarfile

import numpy as np
import pytest

from reflectionflow_tpu.utils import native

pytestmark = pytest.mark.skipif(native.get_lib() is None, reason="no g++ / native lib")


def _write_tar(path, fmt, members):
    with tarfile.open(path, "w", format=fmt) as tf:
        for name, data in members:
            if data is None:
                info = tarfile.TarInfo(name)
                info.type = tarfile.DIRTYPE
                tf.addfile(info)
            else:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def _python_index(path):
    out = {}
    with tarfile.open(path) as tf:
        for m in tf:
            if m.isfile():
                out[m.name] = tf.extractfile(m).read()
    return out


@pytest.mark.parametrize("fmt", [tarfile.USTAR_FORMAT, tarfile.PAX_FORMAT, tarfile.GNU_FORMAT])
def test_native_matches_python_tarfile(tmp_path, fmt):
    rng = np.random.default_rng(0)
    # USTAR caps names at 100 chars (Python refuses longer at write time);
    # PAX/GNU write their long-name extension records, which the native
    # parser must consume
    long_name = ("nested/" + "x" * (80 if fmt == tarfile.USTAR_FORMAT else 140)
                 + ".reflection.txt")
    members = [
        ("00000.prompt.txt", b"a red cube"),
        ("00000.good_image.jpg", rng.integers(0, 256, 1234, dtype=np.uint8).tobytes()),
        ("00000.bad_image.jpg", rng.integers(0, 256, 511, dtype=np.uint8).tobytes()),
        ("nested/dir", None),  # directory member: indexed paths must skip it
        (long_name, b"make it redder"),
        ("00001.subset.txt", b"general"),
        ("empty.txt", b""),
    ]
    path = str(tmp_path / f"shard_{fmt}.tar")
    _write_tar(path, fmt, members)

    expected = _python_index(path)
    idx = native.tar_index(path)
    assert idx is not None, "native indexer fell back unexpectedly"
    names, offsets, sizes = idx
    got = dict(zip(names, native.tar_read_batch(path, offsets, sizes)))
    assert got == expected


def test_native_index_capacity_falls_back(tmp_path):
    path = str(tmp_path / "tiny.tar")
    _write_tar(path, tarfile.USTAR_FORMAT, [(f"{i}.txt", b"x" * i) for i in range(8)])
    # undersized member cap must return None (caller falls back to Python)
    assert native.tar_index(path, max_members=2) is None
    names, offsets, sizes = native.tar_index(path, max_members=8)
    assert len(names) == 8
    assert [len(b) for b in native.tar_read_batch(path, offsets, sizes)] == list(range(8))


def test_native_read_batch_subset_and_order(tmp_path):
    path = str(tmp_path / "sub.tar")
    members = [(f"{i:05d}.txt", f"payload-{i}".encode()) for i in range(10)]
    _write_tar(path, tarfile.USTAR_FORMAT, members)
    names, offsets, sizes = native.tar_index(path)
    sel = np.array([7, 0, 3])
    blobs = native.tar_read_batch(path, offsets[sel], sizes[sel])
    assert blobs == [b"payload-7", b"payload-0", b"payload-3"]
