"""Video data utils, NIfTI writer roundtrip, BPE tokenizer, grouped sampler,
plots, sweep."""

import json
import os

import numpy as np

from vit_exp_tpu.data.loader import GroupedBatchSampler
from vit_exp_tpu.data.nifti import read_nifti
from vit_exp_tpu.data.video import (
    VideoTextDataset,
    cast_num_frames,
    load_hu_volume,
    video_to_gif,
    write_nifti,
)


def test_write_read_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((6, 5, 4)).astype(np.float32)
    path = str(tmp_path / "out.nii.gz")
    write_nifti(path, vol)
    back = read_nifti(path)
    np.testing.assert_allclose(back, vol, atol=1e-6)


def test_cast_num_frames():
    v = np.arange(1 * 5 * 3 * 3, dtype=np.float32).reshape(1, 5, 3, 3)
    assert cast_num_frames(v, 5).shape == (1, 5, 3, 3)
    assert cast_num_frames(v, 3).shape == (1, 3, 3, 3)
    padded = cast_num_frames(v, 8)
    assert padded.shape == (1, 8, 3, 3)
    np.testing.assert_array_equal(padded[:, 5], v[:, 4])


def test_video_text_dataset(tmp_path):
    import pandas as pd

    # build a tiny patient/accession tree with metadata sidecars
    acc_dir = tmp_path / "p1" / "ACC123"
    acc_dir.mkdir(parents=True)
    vol = np.random.default_rng(0).integers(-100, 100, (6, 6, 8)).astype(
        np.int16
    )
    from tests.test_data_tools import _write_nifti

    nii = str(acc_dir / "scan.nii.gz")
    _write_nifti(nii, vol)
    meta = {"RescaleSlope": 1, "RescaleIntercept": 0,
            "PatientAge": "063Y", "PatientSex": "F",
            "Manufacturer": "XYZ"}
    with open(str(acc_dir / "scan_metadata.json"), "w") as f:
        json.dump(meta, f)
    pd.DataFrame(
        {"AccessionNo": ["ACC123"], "Impressions": ["Mild (edema)."]}
    ).to_csv(tmp_path / "reports.csv", index=False)

    # slice-count gate (videotextdataset.py:61-63): the 8-slice scan is
    # excluded at the reference default [100, 600]
    ds = VideoTextDataset(str(tmp_path), str(tmp_path / "reports.csv"),
                          target=(4, 4, 4), num_frames=3)
    assert len(ds) == 0

    ds = VideoTextDataset(str(tmp_path), str(tmp_path / "reports.csv"),
                          target=(4, 4, 4), num_frames=3, min_slices=1)
    assert len(ds) == 1
    item = ds[0]
    # num_frames uses the reference cast_num_frames semantics (crop to
    # f ≡ 1 mod frames, data.py:31-38): 4 % 3 == 1 → unchanged
    assert item["image"].shape == (1, 4, 4, 4)
    assert item["text"].startswith("63 years old female:")
    assert "(" not in item["text"]


def test_load_hu_volume_pnms_reversal(tmp_path):
    from tests.test_data_tools import _write_nifti

    vol = np.zeros((2, 2, 3), np.int16)
    vol[:, :, 0] = 7
    nii = str(tmp_path / "v.nii.gz")
    _write_nifti(nii, vol)
    normal = load_hu_volume(nii, metadata={}, target=None)
    pnms = load_hu_volume(nii, metadata={"Manufacturer": "PNMS"}, target=None)
    np.testing.assert_array_equal(normal[0, 0], pnms[0, -1])


def test_video_to_gif(tmp_path):
    v = np.random.default_rng(0).uniform(0, 1, (4, 8, 8)).astype(np.float32)
    path = str(tmp_path / "v.gif")
    video_to_gif(v, path)
    assert os.path.getsize(path) > 0


def test_bpe_tokenizer(tmp_path):
    merges = "#version: test\nl o\nlo w</w>\ne r</w>\n"
    mpath = tmp_path / "merges.txt"
    mpath.write_text(merges)
    from vit_exp_tpu.data.bpe import BPETokenizer

    tok = BPETokenizer(str(mpath), max_length=8)
    out = tok(["low lower"])
    ids = out["input_ids"][0]
    assert ids[0] == tok.sot
    # "low" merges fully to "low</w>"
    assert tok.encoder["low</w>"] in list(ids)
    assert out["attention_mask"][0].sum() >= 4
    # determinism + truncation
    out2 = tok(["low lower"])
    np.testing.assert_array_equal(out["input_ids"], out2["input_ids"])
    long = tok(["low " * 50])["input_ids"][0]
    assert long[-1] == tok.eot


class _ShapeDataset:
    sizes = [3, 3, 5, 5, 5, 7]

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        return {"x": np.zeros((self.sizes[i],), np.float32)}


def test_grouped_batch_sampler():
    ds = _ShapeDataset()
    sampler = GroupedBatchSampler(
        ds, batch_size=2, key=lambda d, i: d.sizes[i], shuffle=False
    )
    batches = list(iter(sampler))
    for batch in batches:
        sizes = {ds.sizes[i] for i in batch}
        assert len(sizes) == 1  # uniform shape within each batch
    assert sorted(i for b in batches for i in b) == list(range(6))


def test_plots_and_sweep(tmp_path):
    from vit_exp_tpu.eval.plots import plot_pr, plot_roc
    from vit_exp_tpu.eval.sweep import shard_list, sweep_checkpoints

    rng = np.random.default_rng(0)
    y_true = (rng.random((40, 2)) > 0.5).astype(np.float32)
    y_pred = np.clip(y_true * 0.6 + rng.random((40, 2)) * 0.4, 0, 1)
    rocs = plot_roc(y_true, y_pred, ["a", "b"], str(tmp_path / "plots"))
    prs = plot_pr(y_true, y_pred, ["a", "b"], str(tmp_path / "plots"))
    assert len(rocs) == 2 and len(prs) == 2
    assert all(os.path.getsize(p) > 0 for p in rocs + prs)

    assert shard_list(list(range(10)), 1, 4) == [1, 5, 9]
    res = sweep_checkpoints(
        ["c1", "c2", "c3"], lambda c: {"auc": float(len(c))},
        results_folder=str(tmp_path / "sweep"), shard_index=0, num_shards=2,
    )
    assert set(res) == {"c1", "c3"}
    assert os.path.exists(tmp_path / "sweep" / "sweep_shard0.json")


def test_superres_dataset(tmp_path):
    import pandas as pd

    from vit_exp_tpu.data.video import (VideoTextSuperresDataset,
                                        cast_num_frames_mod1, write_nifti)

    acc_dir = tmp_path / "p1" / "ACC9"
    acc_dir.mkdir(parents=True)
    from tests.test_data_tools import _write_nifti

    nii = str(acc_dir / "scan.nii.gz")
    _write_nifti(nii, np.random.default_rng(0).integers(
        -500, 500, (6, 6, 9)).astype(np.int16))
    with open(str(acc_dir / "scan_metadata.json"), "w") as f:
        json.dump({"RescaleSlope": 1, "RescaleIntercept": 0,
                   "PatientAge": "041Y", "PatientSex": "M"}, f)
    # paired low-res CTViT output at {root}/samples.{acc}/{name}
    lr_dir = tmp_path / "lowres" / "samples.ACC9"
    lr_dir.mkdir(parents=True)
    write_nifti(str(lr_dir / "scan.nii.gz"),
                np.random.default_rng(1).uniform(-1, 1, (4, 4, 5)).astype(
                    np.float32))
    pd.DataFrame({"AccessionNo": ["ACC9"],
                  "Impressions": ["Normal."]}).to_csv(
        tmp_path / "reports.csv", index=False)

    ds = VideoTextSuperresDataset(
        str(tmp_path), str(tmp_path / "reports.csv"),
        str(tmp_path / "lowres"), target=(7, 8, 8), num_frames=2,
        min_slices=5,
    )
    # default slice gate (100..600, videotextdatasetsuperres.py:71) filters
    # this 9-slice volume out
    assert len(VideoTextSuperresDataset(
        str(tmp_path), str(tmp_path / "reports.csv"),
        str(tmp_path / "lowres"), target=(7, 8, 8))) == 0
    assert len(ds) == 1
    item = ds[0]
    assert item["image"].shape == (1, 7, 8, 8)      # 7 ≡ 1 (mod 2)
    assert item["lowres"].shape == (1, 5, 4, 4)     # (S,W,H), 5 ≡ 1 (mod 2)
    assert item["text"].startswith("41 years old male:")
    assert float(item["image"].min()) >= 0.0        # [-1,1] → [0,1]
    assert float(item["lowres"].min()) >= 0.0

    # the mod-1 frame cast semantics (videotextdatasetsuperres.py:15-22)
    v = np.zeros((1, 8, 2, 2), np.float32)
    assert cast_num_frames_mod1(v, 2).shape[1] == 7   # 8%2==0 → drop 1
    assert cast_num_frames_mod1(v[:, :7], 2).shape[1] == 7  # ≡1 → keep
    assert cast_num_frames_mod1(np.zeros((1, 9, 2, 2), np.float32),
                                4).shape[1] == 9      # 9%4==1 → keep

    # sample_list variant (validation dataset, sampled_val.txt)
    lst = tmp_path / "val.txt"
    lst.write_text(nii + "\n")
    ds2 = VideoTextSuperresDataset(
        str(tmp_path), str(tmp_path / "reports.csv"),
        str(tmp_path / "lowres"), target=(7, 8, 8),
        sample_list=str(lst), min_slices=5,
    )
    assert len(ds2) == 1


def test_resample_reference_matches_pil_torch_oracle():
    """resample_reference == the reference's per-slice torchvision/PIL
    antialiased bilinear + F.interpolate trilinear (videotextdataset.py:
    96-127), on both down- and up-sampling shapes (VERDICT item 8)."""
    import torch
    import torch.nn.functional as F
    from PIL import Image

    from vit_exp_tpu.data.video import resample_reference

    rng = np.random.default_rng(0)
    for (d, h, w), target in [
        ((37, 96, 80), (20, 32, 32)),   # downsample (antialias active)
        ((11, 24, 24), (20, 48, 48)),   # upsample
        ((30, 512, 512), (40, 128, 128)),  # reference-like 4× decimation
    ]:
        vol = rng.uniform(-1, 1, (d, h, w)).astype(np.float32)
        # oracle: exact reference ops
        slices = []
        for i in range(d):
            img = Image.fromarray(vol[i], mode="F")
            img = img.resize((target[2], target[1]), Image.BILINEAR)
            slices.append(torch.tensor(np.asarray(img)))
        t = torch.stack(slices, dim=0)[None, None]  # (1, 1, d, H, W)
        ref = F.interpolate(t, size=target, mode="trilinear",
                            align_corners=False)[0, 0].numpy()
        ours = resample_reference(vol, target)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_resample_modes_differ_on_decimation():
    """The fused trilinear path is NOT the reference path when
    downsampling — the documented deviation is now a switch, not a
    silent substitution."""
    from vit_exp_tpu.data.video import _resample_to, resample_reference

    rng = np.random.default_rng(1)
    vol = rng.uniform(-1, 1, (16, 64, 64)).astype(np.float32)
    a = resample_reference(vol, (8, 16, 16))
    b = _resample_to(vol, (8, 16, 16))
    assert np.abs(a - b).max() > 1e-3
