"""Datasets over preprocessed CT-RATE npz trees — numpy-native (no torch).

Capability parity (file:line in /root/reference/scripts):
- CTReportDataset  ← data.py:236-371: walk npz tree, join reports CSV
  (Findings_EN + Impressions_EN keyed by VolumeName), cache file lists as
  txt, keep the first 80%, strip quote/paren chars from reports.
- CTSegDataset     ← data.py:374-437: paired image/mask npz folders.
- CTOpenSegDataset ← data.py:440-544: + label-name table → per-class
  prompts ("This is region of {name}." / "This is {name}.") pre-tokenized
  at construction.
- CTReportInferenceDataset ← data_inference.py:19-227: + one-hot 18-label
  CSV join; yields (volume, text, onehot, accession).

TPU-native differences: items are numpy dicts (the device transfer and
batching happen in data/loader.py, which also runs the crop/pad on device);
tokenization is done here once per text with the pluggable tokenizer
(data/tokenizer.py) instead of per-step in the trainer; the label table
reads CSV (openpyxl-less) with xlsx supported when pandas can.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from vit_exp_tpu.data.preprocess_host import (
    load_npz_volume,
    runtime_volume,
    runtime_mask,
)

_STRIP_CHARS = str.maketrans("", "", "\"'()")


def _cached_list(cache_path: str, build) -> List[str]:
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return [line.strip() for line in f if line.strip()]
    items = build()
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    with open(cache_path, "w") as f:
        f.writelines(f"{item}\n" for item in items)
    return items


def _walk_npz(root: str) -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for name in sorted(files):
            if name.endswith(".npz"):
                out.append(os.path.join(dirpath, name))
    return sorted(out)


class CTReportDataset:
    """Image-report pairs for the contrastive path."""

    def __init__(
        self,
        data_folder: str,
        csv_file: str,
        *,
        tokenizer=None,
        keep_percent: int = 80,
        max_text_len: int = 512,
        cache_dir: Optional[str] = None,
    ):
        self.data_folder = data_folder
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        acc_to_text = self._load_reports(csv_file)
        cache_dir = cache_dir or os.path.join(data_folder, "tmp_cache_data_list")
        files = _cached_list(
            os.path.join(cache_dir, "image_samples_tpu.txt"),
            lambda: _walk_npz(data_folder),
        )
        self.samples: List[Tuple[str, str]] = []
        for path in files:
            accession = os.path.basename(path).replace(".npz", ".nii.gz")
            if accession in acc_to_text:
                self.samples.append((path, acc_to_text[accession]))
        # reference keeps the first 80% as the train split (data.py:247-249)
        self.samples = self.samples[: len(self.samples) * keep_percent // 100]

    @staticmethod
    def _load_reports(csv_file: str) -> Dict[str, str]:
        df = pd.read_csv(csv_file)
        out = {}
        for _, row in df.iterrows():
            name = str(row["VolumeName"]).split("/")[-1]
            parts = [row.get("Findings_EN"), row.get("Impressions_EN")]
            text = "".join(str(p) for p in parts if p is not None)
            if text == "Not given.":
                text = ""
            out[name] = text
        return out

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict:
        path, text = self.samples[index]
        volume = runtime_volume(load_npz_volume(path))
        text = text.translate(_STRIP_CHARS)
        item = {"image": volume, "text": text, "data_type": "imagereport"}
        if self.tokenizer is not None:
            toks = self.tokenizer([text], max_length=self.max_text_len)
            item["input_ids"] = toks["input_ids"][0]
            item["attention_mask"] = toks["attention_mask"][0]
        return item


class CTSegDataset:
    """Closed-set segmentation pairs (pre-cropped npz, no runtime crop)."""

    def __init__(self, data_folder: str, mask_folder: str):
        images = _cached_list(
            os.path.join(data_folder, "tmp_cache_data_list",
                         "image_samples_tpu.txt"),
            lambda: sorted(glob.glob(os.path.join(data_folder, "*.npz"))),
        )
        masks = _cached_list(
            os.path.join(mask_folder, "tmp_cache_mask_list",
                         "mask_samples_tpu.txt"),
            lambda: sorted(glob.glob(os.path.join(mask_folder, "*.npz"))),
        )
        # reference data.py:415 asserts the counts match — zip would
        # silently truncate and pair every image after a gap with the
        # WRONG mask
        assert len(images) == len(masks), (
            f"{len(images)} images vs {len(masks)} masks — the sorted "
            "lists would misalign")
        self.samples = list(zip(images, masks))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict:
        img_path, mask_path = self.samples[index]
        return {
            "image": load_npz_volume(img_path)[None].astype(np.float32),
            "seg_mask": load_npz_volume(mask_path).astype(np.float32),
            "data_type": "imageseg",
        }


def load_label_names(table_path: str) -> Dict[int, str]:
    """ID → NAME table; xlsx via pandas when possible, else csv."""
    if table_path.endswith(".csv"):
        df = pd.read_csv(table_path)
    else:
        df = pd.read_excel(table_path)
    return {int(i): str(n) for i, n in zip(df["ID"], df["NAME"])}


PROMPT_TEMPLATES = {
    "this_region": "This is region of {name}.",
    "this_is": "This is {name}.",
}


class CTOpenSegDataset:
    """Open-vocab segmentation with pre-tokenized class prompts."""

    def __init__(
        self,
        data_folder: str,
        mask_folder: str,
        seg_mask_name_table: str,
        *,
        tokenizer,
        seg_mask_prompt_type: str = "this_region",
        max_text_len: int = 512,
    ):
        template = PROMPT_TEMPLATES[seg_mask_prompt_type]
        names = load_label_names(seg_mask_name_table)
        self.class_ids = sorted(names)
        prompts = [template.format(name=names[i]) for i in self.class_ids]
        toks = tokenizer(prompts, max_length=max_text_len)
        self.prompt_ids = toks["input_ids"]          # (C, L)
        self.prompt_mask = toks["attention_mask"]    # (C, L)
        self._pairs = CTSegDataset(data_folder, mask_folder).samples

    def __len__(self):
        return len(self._pairs)

    def __getitem__(self, index: int) -> Dict:
        img_path, mask_path = self._pairs[index]
        return {
            "image": runtime_volume(load_npz_volume(img_path)),
            "seg_mask": runtime_mask(load_npz_volume(mask_path)),
            "prompt_ids": self.prompt_ids,
            "prompt_mask": self.prompt_mask,
            "data_type": "imageopenseg",
        }


class CTReportInferenceDataset:
    """Zero-shot eval samples: (volume, text, onehot labels, accession)."""

    def __init__(
        self,
        data_folder: str,
        csv_file: str,
        labels_file: str,
        *,
        tokenizer=None,
        max_text_len: int = 512,
        limit: Optional[int] = None,
    ):
        acc_to_text = CTReportDataset._load_reports(csv_file)
        labels_df = pd.read_csv(labels_file)
        self.label_columns = [
            c for c in labels_df.columns if c != "VolumeName"
        ]
        acc_to_onehot = {
            str(row["VolumeName"]).split("/")[-1]: np.asarray(
                [row[c] for c in self.label_columns], dtype=np.float32
            )
            for _, row in labels_df.iterrows()
        }
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        self.samples = []
        for path in _walk_npz(data_folder):
            accession = os.path.basename(path).replace(".npz", ".nii.gz")
            if accession in acc_to_text and accession in acc_to_onehot:
                self.samples.append(
                    (path, acc_to_text[accession], acc_to_onehot[accession],
                     accession)
                )
        if limit:
            self.samples = self.samples[:limit]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict:
        path, text, onehot, accession = self.samples[index]
        return {
            "image": runtime_volume(load_npz_volume(path)),
            "text": text,
            "onehot": onehot,
            "accession": accession,
        }
