"""Dataset classes over a real (tiny) npz tree + CSV joins."""

import os

import numpy as np
import pandas as pd
import pytest

from vit_exp_tpu.data.datasets import (
    CTOpenSegDataset,
    CTReportDataset,
    CTReportInferenceDataset,
    CTSegDataset,
    load_label_names,
)
from vit_exp_tpu.data.tokenizer import HashTokenizer


@pytest.fixture
def ct_tree(tmp_path):
    """train_{pid}/{pid}{scan}/name.npz tree + reports + labels CSVs."""
    rng = np.random.default_rng(0)
    names = []
    for pid, scan in [("1", "a"), ("2", "a"), ("2", "b"), ("3", "a"),
                      ("4", "a")]:
        folder = tmp_path / "imgs" / f"train_{pid}" / f"train_{pid}{scan}"
        folder.mkdir(parents=True)
        vol = rng.uniform(-1.2, 1.2, (6, 10, 10)).astype(np.float32)
        name = f"train_{pid}_{scan}_1"
        np.savez(folder / f"{name}.npz", vol)
        names.append(name + ".nii.gz")
    pd.DataFrame(
        {
            "VolumeName": names,
            "Findings_EN": [f"findings {i} (left)." for i in range(5)],
            "Impressions_EN": [f"impression {i}" for i in range(5)],
        }
    ).to_csv(tmp_path / "reports.csv", index=False)
    pd.DataFrame(
        {
            "VolumeName": names,
            "Cardiomegaly": [1, 0, 1, 0, 1],
            "Emphysema": [0, 0, 1, 1, 0],
        }
    ).to_csv(tmp_path / "labels.csv", index=False)
    return tmp_path


def test_ct_report_dataset(ct_tree):
    tok = HashTokenizer(vocab_size=256, max_length=16)
    ds = CTReportDataset(
        str(ct_tree / "imgs"), str(ct_tree / "reports.csv"),
        tokenizer=tok, max_text_len=16, keep_percent=80,
    )
    assert len(ds) == 4  # 80% of 5
    item = ds[0]
    assert item["image"].shape == (1, 240, 480, 480)
    assert item["data_type"] == "imagereport"
    assert "(" not in item["text"] and ")" not in item["text"]
    assert item["input_ids"].shape == (16,)
    # file-list cache was written and reloading uses it
    cache = ct_tree / "imgs" / "tmp_cache_data_list" / "image_samples_tpu.txt"
    assert cache.exists()
    ds2 = CTReportDataset(
        str(ct_tree / "imgs"), str(ct_tree / "reports.csv"),
        tokenizer=tok, max_text_len=16,
    )
    assert len(ds2) == len(ds)


def test_ct_inference_dataset(ct_tree):
    ds = CTReportInferenceDataset(
        str(ct_tree / "imgs"), str(ct_tree / "reports.csv"),
        str(ct_tree / "labels.csv"),
    )
    assert len(ds) == 5
    assert ds.label_columns == ["Cardiomegaly", "Emphysema"]
    item = ds[0]
    assert item["onehot"].shape == (2,)
    assert item["accession"].endswith(".nii.gz")
    assert item["image"].shape == (1, 240, 480, 480)

    limited = CTReportInferenceDataset(
        str(ct_tree / "imgs"), str(ct_tree / "reports.csv"),
        str(ct_tree / "labels.csv"), limit=2,
    )
    assert len(limited) == 2


def test_ct_seg_datasets(tmp_path):
    rng = np.random.default_rng(1)
    (tmp_path / "imgs").mkdir()
    (tmp_path / "masks").mkdir()
    for i in range(3):
        np.savez(tmp_path / "imgs" / f"s{i}.npz",
                 rng.uniform(-1, 1, (6, 10, 10)).astype(np.float32))
        np.savez(tmp_path / "masks" / f"s{i}.npz",
                 (rng.random((2, 6, 10, 10)) > 0.5).astype(np.float32))
    ds = CTSegDataset(str(tmp_path / "imgs"), str(tmp_path / "masks"))
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (1, 6, 10, 10)
    assert item["seg_mask"].shape == (2, 6, 10, 10)
    assert item["data_type"] == "imageseg"

    pd.DataFrame({"ID": [0, 1], "NAME": ["liver", "lung"]}).to_csv(
        tmp_path / "names.csv", index=False
    )
    assert load_label_names(str(tmp_path / "names.csv")) == {
        0: "liver", 1: "lung"
    }
    tok = HashTokenizer(vocab_size=256, max_length=12)
    ods = CTOpenSegDataset(
        str(tmp_path / "imgs"), str(tmp_path / "masks"),
        str(tmp_path / "names.csv"), tokenizer=tok, max_text_len=12,
    )
    item = ods[0]
    assert item["prompt_ids"].shape == (2, 12)
    assert item["image"].shape == (1, 240, 480, 480)
    assert item["seg_mask"].shape == (2, 240, 480, 480)
    assert item["data_type"] == "imageopenseg"


def test_packed_shards_roundtrip(tmp_path):
    """Write/read packed shards; shard roll, alignment, meta, dtypes."""
    from vit_exp_tpu.data.packed import PackedShardWriter, PackedVolumeStore

    rng = np.random.default_rng(0)
    arrays = {
        f"vol{i}.nii.gz": rng.standard_normal((1, 4, 6, 6)).astype(
            np.float16 if i % 2 else np.float32)
        for i in range(5)
    }
    with PackedShardWriter(str(tmp_path / "packed"), shard_bytes=300) as w:
        for k, a in arrays.items():
            w.append(k, a, meta={"text": f"report {k}"})
    store = PackedVolumeStore(str(tmp_path / "packed"))
    assert len(store) == 5
    # multiple shards actually produced (300-byte cap vs ~300-600 B records)
    import glob as _g
    assert len(_g.glob(str(tmp_path / "packed" / "shard_*.bin"))) >= 2
    for k, a in arrays.items():
        got = store[k]
        assert got.dtype == a.dtype
        np.testing.assert_array_equal(np.asarray(got), a)
        assert store.meta(k)["text"] == f"report {k}"


def test_packed_report_dataset_matches_npz_dataset(tmp_path):
    """CTReportPackedDataset items == CTReportDataset items after packing
    via the CLI path (meta text, strip chars, tokenization)."""
    from vit_exp_tpu.data.packed import (
        CTReportPackedDataset, PackedShardWriter,
    )
    from vit_exp_tpu.data.tokenizer import HashTokenizer

    rng = np.random.default_rng(1)
    root = tmp_path / "npz"
    root.mkdir()
    rows = []
    for i in range(3):
        vol = rng.standard_normal((240 // 10, 48, 48)).astype(np.float32)
        np.savez_compressed(root / f"case{i}.npz", arr_0=vol)
        rows.append({"VolumeName": f"case{i}.nii.gz",
                     "Findings_EN": f"finding (quoted) {i}",
                     "Impressions_EN": f" impression {i}"})
    pd.DataFrame(rows).to_csv(tmp_path / "reports.csv", index=False)

    tok = HashTokenizer(vocab_size=97)
    ds = CTReportDataset(str(root), str(tmp_path / "reports.csv"),
                         tokenizer=tok, keep_percent=100)
    with PackedShardWriter(str(tmp_path / "packed")) as w:
        for path, text in ds.samples:
            key = os.path.basename(path).replace(".npz", ".nii.gz")
            vol = ds[ds.samples.index((path, text))]["image"]
            w.append(key, vol.astype(np.float16), meta={"text": text})
    pds = CTReportPackedDataset(str(tmp_path / "packed"), tokenizer=tok)
    assert len(pds) == len(ds)
    for i in range(len(ds)):
        a, b = ds[i], pds[i]
        assert a["text"] == b["text"]
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-3)
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])


def test_packed_inference_dataset_matches_npz_dataset(tmp_path):
    """CTReportPackedInferenceDataset items == CTReportInferenceDataset
    items (image, text, onehot, accession) after packing the npz tree."""
    from vit_exp_tpu.data.datasets import CTReportInferenceDataset
    from vit_exp_tpu.data.packed import (
        CTReportPackedInferenceDataset, PackedShardWriter,
    )

    rng = np.random.default_rng(3)
    root = tmp_path / "npz"
    root.mkdir()
    reports, labels = [], []
    for i in range(2):
        vol = rng.standard_normal((24, 48, 48)).astype(np.float32)
        np.savez_compressed(root / f"case{i}.npz", arr_0=vol)
        reports.append({"VolumeName": f"case{i}.nii.gz",
                        "Findings_EN": f"finding {i}",
                        "Impressions_EN": f"impression {i}"})
        labels.append({"VolumeName": f"case{i}.nii.gz",
                       "Cardiomegaly": i % 2, "Emphysema": (i + 1) % 2})
    pd.DataFrame(reports).to_csv(tmp_path / "reports.csv", index=False)
    pd.DataFrame(labels).to_csv(tmp_path / "labels.csv", index=False)

    ds = CTReportInferenceDataset(str(root), str(tmp_path / "reports.csv"),
                                  str(tmp_path / "labels.csv"))
    with PackedShardWriter(str(tmp_path / "packed")) as w:
        for i in range(len(ds)):
            item = ds[i]
            w.append(item["accession"],
                     item["image"].astype(np.float16),
                     meta={"text": item["text"]})
    pds = CTReportPackedInferenceDataset(
        str(tmp_path / "packed"), str(tmp_path / "labels.csv"))
    assert len(pds) == len(ds)
    assert pds.label_columns == ds.label_columns
    for i in range(len(ds)):
        a, b = ds[i], pds[i]
        assert a["accession"] == b["accession"]
        assert a["text"] == b["text"]
        np.testing.assert_array_equal(a["onehot"], b["onehot"])
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-3)


def test_packed_dataset_through_loader_and_cli_spec(tmp_path):
    """packed spec in train_data_list builds CTReportPackedDataset, and the
    threaded Loader batches it like the npz dataset."""
    from vit_exp_tpu.cli.run_train import build_datasets
    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.data.loader import Loader
    from vit_exp_tpu.data.packed import PackedShardWriter
    from vit_exp_tpu.data.tokenizer import HashTokenizer

    rng = np.random.default_rng(2)
    with PackedShardWriter(str(tmp_path / "packed")) as w:
        for i in range(4):
            w.append(f"v{i}.nii.gz",
                     rng.standard_normal((1, 4, 8, 8)).astype(np.float16),
                     meta={"text": f"report {i}"})
    config = ExperimentConfig.from_dict({
        "train_data_list": [
            {"type": "imagereport", "packed": True,
             "data_folder": str(tmp_path / "packed")},
        ],
    })
    tok = HashTokenizer(vocab_size=97)
    (ds,) = build_datasets(config, tok)
    assert len(ds) == 4
    loader = Loader(ds, batch_size=2, shuffle=False, seed=0)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 1, 4, 8, 8)
    assert batch["input_ids"].shape[0] == 2


def test_loader_host_sharding():
    """num_shards loaders with the same seed: disjoint coverage of the
    dataset, and EQUAL batch counts per shard (wrap-padded) so multihost
    jit programs stay in lockstep."""
    from vit_exp_tpu.data.loader import Loader

    class Idx:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return {"i": np.asarray([i])}

    seen, counts = [], []
    for shard in range(3):
        loader = Loader(Idx(), batch_size=2, shuffle=True, seed=7,
                        shard_id=shard, num_shards=3)
        got = []
        for batch in loader:
            got += list(batch["i"].reshape(-1))
        counts.append(len(got))
        seen += got
    # every sample appears; wrap-padding only duplicates within a shard
    assert sorted(set(seen)) == list(range(23))
    # lockstep: every shard yields the same number of samples/batches
    assert counts == [8, 8, 8]  # ceil(23/3) per shard
    assert len(Loader(Idx(), batch_size=2, shard_id=0, num_shards=3)) == 4
    # degenerate: more shards than samples still yields target-length shards
    class Two(Idx):
        def __len__(self):
            return 2
    tiny = Loader(Two(), batch_size=1, shard_id=4, num_shards=5)
    assert sum(1 for _ in tiny) == 1


def test_loader_prefetch_is_bounded():
    """The producer must never materialize more than workers+prefetch
    batches ahead of the consumer (host-OOM guard: production batches are
    ~0.9 GB; an epoch-wide submit would pile them all in finished
    futures while the device is the bottleneck)."""
    import threading
    import time

    from vit_exp_tpu.data.loader import Loader

    lock = threading.Lock()
    state = {"loaded": 0, "consumed": 0, "max_ahead": 0}

    class Counting:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                state["loaded"] += 1
                ahead = state["loaded"] - state["consumed"]
                state["max_ahead"] = max(state["max_ahead"], ahead)
            return {"x": np.float32(i)}

    workers, prefetch = 3, 2
    loader = Loader(Counting(), batch_size=1, num_workers=workers,
                    prefetch=prefetch)
    for _ in loader:
        time.sleep(0.005)  # slow consumer: loading outpaces compute
        with lock:
            state["consumed"] += 1
    assert state["loaded"] == 64
    # window (workers+prefetch submitted) + queue (prefetch) + 1 in hand-off
    assert state["max_ahead"] <= 2 * prefetch + workers + 1, state
