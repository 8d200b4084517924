"""Data-layer tests: tokenizer, NIfTI reader, mask tools, loader, datasets."""

import gzip
import struct

import numpy as np

from vit_exp_tpu.data.loader import Loader, InfiniteLoader
from vit_exp_tpu.data.mask_tools import (
    align_mask_to_image,
    check_npz_tree,
    compare_name_sets,
    flip_mask_by_metadata,
    reorder_mask,
)
from vit_exp_tpu.data.nifti import read_nifti, read_nifti_spacing
from vit_exp_tpu.data.tokenizer import HashTokenizer, WordPieceTokenizer


def _write_nifti(path, data, pixdim=(1.0, 1.0, 1.0), scl=(1.0, 0.0)):
    """Minimal NIfTI-1 writer for testing the reader."""
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<h", hdr, 70, 4)  # int16
    struct.pack_into("<8f", hdr, 76, 1.0, *pixdim, *( [1.0] * (7 - len(pixdim)) ))
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, scl[0])
    struct.pack_into("<f", hdr, 116, scl[1])
    payload = bytes(hdr) + data.astype("<i2").tobytes(order="F")
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(payload)


def test_nifti_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(-1000, 2000, (7, 6, 5)).astype(np.int16)
    path = str(tmp_path / "vol.nii.gz")
    _write_nifti(path, data, pixdim=(0.7, 0.7, 1.5))
    out = read_nifti(path)
    np.testing.assert_array_equal(out, data)
    out2, spacing = read_nifti_spacing(path)
    np.testing.assert_array_equal(out2, data)
    np.testing.assert_allclose(spacing, (0.7, 0.7, 1.5), atol=1e-6)


def test_nifti_scl_slope(tmp_path):
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = str(tmp_path / "v.nii")
    _write_nifti(path, data, scl=(2.0, -1.0))
    out = read_nifti(path)
    np.testing.assert_allclose(out, data * 2.0 - 1.0)


def test_wordpiece_tokenizer(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "pleural", "effusion",
             "no", "##sion", "efu", "."]
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(vpath), max_length=10)
    out = tok(["No pleural effusion."])
    ids = out["input_ids"][0]
    assert ids[0] == 2  # [CLS]
    # no → 6, pleural → 4, effusion → 5, . → 9, [SEP]
    assert list(ids[1:6]) == [6, 4, 5, 9, 3]
    assert out["attention_mask"][0, :6].all()
    assert not out["attention_mask"][0, 6:].any()
    # wordpiece continuation: "efusion" → efu + ##sion
    ids2 = tok(["efusion"])["input_ids"][0]
    assert list(ids2[1:3]) == [8, 7]
    # unknown word → [UNK]
    ids3 = tok(["zzzz"])["input_ids"][0]
    assert ids3[1] == 1


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=500, max_length=8)
    a = tok(["chest ct scan"])
    b = tok(["chest ct scan"])
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    assert a["input_ids"].shape == (1, 8)


def test_mask_tools():
    rng = np.random.default_rng(0)
    mask_hwdc = (rng.random((2, 8, 8, 4)) > 0.5).astype(np.float32)
    out = reorder_mask(mask_hwdc)
    assert out.shape == (2, 4, 8, 8)
    aligned = align_mask_to_image(mask_hwdc, (4, 8, 8))
    assert aligned.shape == (2, 4, 8, 8)
    resized = align_mask_to_image(out, (8, 16, 16), reorder=False)
    assert resized.shape == (2, 8, 16, 16)
    assert set(np.unique(resized)) <= {0.0, 1.0}
    flipped = flip_mask_by_metadata(out, z_flip=True)
    np.testing.assert_array_equal(flipped[:, 0], out[:, -1])


def test_check_npz_tree_and_name_sets(tmp_path):
    good = tmp_path / "imgs"
    masks = tmp_path / "masks"
    good.mkdir(); masks.mkdir()
    np.savez(good / "a.npz", np.zeros((2, 2)))
    np.savez(good / "b.npz", np.zeros((2, 2)))
    np.savez(masks / "a.npz", np.zeros((2, 2)))
    (good / "broken.npz").write_bytes(b"not a zip")
    failures = check_npz_tree(str(tmp_path))
    assert len(failures) == 1 and "broken" in next(iter(failures))
    diff = compare_name_sets(str(good), str(masks))
    assert diff["img_only"] == ["b.npz", "broken.npz"]
    assert diff["common"] == ["a.npz"]


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "name": f"s{i}",
                "data_type": "toy"}


def test_loader_batching_and_prefetch():
    loader = Loader(_ToyDataset(10), batch_size=3, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["x"].shape == (3, 3)
    assert batches[-1]["x"].shape == (1, 3)
    assert batches[0]["name"] == ["s0", "s1", "s2"]
    assert batches[0]["data_type"] == "toy"

    loader2 = Loader(_ToyDataset(10), batch_size=3, drop_last=True,
                     shuffle=True, seed=1)
    assert len(list(loader2)) == 3
    inf = InfiniteLoader(Loader(_ToyDataset(4), batch_size=2))
    got = [next(inf) for _ in range(5)]  # cycles over 2 batches
    assert all(b["x"].shape == (2, 3) for b in got)


def test_loader_raises_on_empty():
    import pytest

    inf = InfiniteLoader(Loader(_ToyDataset(1), batch_size=4, drop_last=True))
    with pytest.raises(RuntimeError, match="no batches"):
        next(inf)


def test_loader_abandoned_iterator_no_hang():
    """Dropping an iterator mid-epoch must not leave producer threads
    blocked (regression: q.put deadlock hung interpreter exit)."""
    import gc
    import threading

    before = threading.active_count()
    loader = Loader(_ToyDataset(64), batch_size=1, num_workers=4, prefetch=1)
    it = iter(loader)
    next(it)
    del it
    gc.collect()
    deadline = 50  # 5s in 0.1s ticks
    import time as _time

    while threading.active_count() > before and deadline:
        _time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before + 1, (
        f"leaked threads: {threading.active_count() - before}"
    )


def test_copy_tree_parallel(tmp_path):
    from vit_exp_tpu.data.mask_tools import copy_tree_parallel

    src = tmp_path / "src" / "a" / "b"
    src.mkdir(parents=True)
    (src / "x.npz").write_bytes(b"123")
    (tmp_path / "src" / "y.txt").write_text("hello")
    dst = tmp_path / "dst"
    assert copy_tree_parallel(str(tmp_path / "src"), str(dst)) == 2
    assert (dst / "a" / "b" / "x.npz").read_bytes() == b"123"
    # resume: same-size files skipped
    assert copy_tree_parallel(str(tmp_path / "src"), str(dst)) == 0
