"""Native C++ packed-shard reader: build, parity, and fallback."""

import numpy as np
import pytest

from vit_exp_tpu import native
from vit_exp_tpu.data.packed import PackedShardWriter, PackedVolumeStore


@pytest.fixture
def store(tmp_path):
    rng = np.random.default_rng(0)
    root = str(tmp_path / "packed")
    with PackedShardWriter(root, shard_bytes=1 << 16) as w:
        for i in range(6):
            w.append(f"f16_{i}",
                     rng.standard_normal((7, 9, 5)).astype(np.float16),
                     meta={"text": f"report {i}"})
        for i in range(3):
            w.append(f"i16_{i}",
                     rng.integers(-1000, 1000, (4, 6)).astype(np.int16))
        w.append("f32_0", rng.standard_normal((3, 8)).astype(np.float32))
    s = PackedVolumeStore(root)
    yield s
    s.close()


def test_native_builds():
    """g++ is baked into the image, so the native path must actually load
    here (the fallback exists for exotic deploy targets, not this one)."""
    assert native.available(), native.build_error()


def test_get_f32_matches_memmap(store):
    for key in store.keys():
        ref = np.asarray(store.get(key), dtype=np.float32)
        out = store.get_f32(key)
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, ref)


def test_get_batch_uniform_and_scale(store):
    keys = [f"f16_{i}" for i in range(6)]
    batch = store.get_batch(keys, scale=2.0, shift=-1.0)
    assert batch.shape == (6, 7, 9, 5) and batch.dtype == np.float32
    for i, k in enumerate(keys):
        ref = np.asarray(store.get(k), dtype=np.float32) * 2.0 - 1.0
        np.testing.assert_allclose(batch[i], ref, atol=1e-6)


def test_get_batch_rejects_mixed(store):
    with pytest.raises(ValueError):
        store.get_batch(["f16_0", "i16_0"])


def test_int16_conversion(store):
    ref = np.asarray(store.get("i16_0"), dtype=np.float32) / 1000.0
    out = store.get_f32("i16_0", scale=1.0 / 1000.0)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_convert_f32_direct():
    rng = np.random.default_rng(1)
    src = rng.standard_normal(100_000).astype(np.float16)
    dst = np.empty(100_000, dtype=np.float32)
    native.convert_f32(src, dst, scale=0.5, shift=1.0, threads=4)
    np.testing.assert_allclose(dst, src.astype(np.float32) * 0.5 + 1.0,
                               atol=1e-6)


def test_read_batch_raw(store, tmp_path):
    """Low-level byte reads land at the requested output offsets."""
    import os

    p = tmp_path / "raw.bin"
    payload = np.arange(256, dtype=np.uint8).tobytes()
    p.write_bytes(payload)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        out = np.zeros(64, dtype=np.uint8)
        native.read_batch([fd, fd], [10, 200], [16, 16], [0, 32], out,
                          threads=2)
        np.testing.assert_array_equal(out[:16], np.arange(10, 26,
                                                          dtype=np.uint8))
        np.testing.assert_array_equal(out[32:48], np.arange(200, 216,
                                                            dtype=np.uint8))
        assert not out[16:32].any()
    finally:
        os.close(fd)


def test_packed_dataset_uses_native(store, tmp_path):
    from vit_exp_tpu.data.packed import CTReportPackedDataset

    ds = CTReportPackedDataset(store.root)
    assert len(ds) == 6  # only records with text metadata
    item = ds[0]
    assert item["image"].dtype == np.float32
    assert item["image"].shape == (1, 7, 9, 5)
    assert item["data_type"] == "imagereport"
