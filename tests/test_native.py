"""Native data-plane library tests (C++ libjpeg decode via ctypes)."""

import numpy as np
import pytest
from PIL import Image

from icka_tpu.data import native


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, size in enumerate([(64, 64), (120, 80), (300, 200)]):
        arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        p = d / f"img{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    bad = d / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    return paths, str(bad)


def test_native_builds_and_loads():
    assert native.native_available(), "native library failed to build/load"


def test_decode_matches_pil_stats(jpeg_dir):
    paths, _ = jpeg_dir
    for p in paths:
        out = native.decode_jpeg(p, 48)
        assert out is not None and out.shape == (48, 48, 3)
        ref = np.asarray(Image.open(p).convert("RGB")
                         .resize((48, 48)), dtype=np.float32)
        # different resample filters: compare channel means, not pixels
        assert np.abs(out.astype(np.float32).mean(axis=(0, 1))
                      - ref.mean(axis=(0, 1))).max() < 8.0


def test_decode_deterministic(jpeg_dir):
    paths, _ = jpeg_dir
    a = native.decode_jpeg(paths[0], 32)
    b = native.decode_jpeg(paths[0], 32)
    np.testing.assert_array_equal(a, b)
    assert native.crc32(a) == native.crc32(b)


def test_decode_batch_with_failures(jpeg_dir):
    paths, bad = jpeg_dir
    batch = paths + [bad, "/nonexistent/file.jpg"]
    out, failures = native.decode_jpeg_batch(batch, 32, num_threads=3)
    assert out.shape == (5, 32, 32, 3)
    assert failures == 2
    # failed rows zeroed, good rows match single decode
    assert (out[3] == 0).all() and (out[4] == 0).all()
    np.testing.assert_array_equal(out[0], native.decode_jpeg(paths[0], 32))


def test_corrupt_jpeg_returns_none(jpeg_dir):
    _, bad = jpeg_dir
    assert native.decode_jpeg(bad, 32) is None
