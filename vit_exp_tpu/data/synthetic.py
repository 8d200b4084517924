"""Synthetic datasets — the TPU analogue of the reference's debug-30 configs
(configs/train_from_scratch/ct_clip_debug_30_v2.yaml, SURVEY.md §4.3):
random volumes/reports/masks with the exact production shapes and batch
dict layout, generated in memory so end-to-end runs need no CT-RATE data."""

from __future__ import annotations

from typing import Dict

import numpy as np

from vit_exp_tpu.core.config import ArchConfig

_SYNTH_SENTENCES = [
    "no acute cardiopulmonary abnormality",
    "mild cardiomegaly with pericardial effusion",
    "bilateral pleural effusion and atelectasis",
    "emphysema with scattered lung nodules",
    "consolidation in the right lower lobe",
    "interlobular septal thickening noted",
]


class SyntheticCTDataset:
    def __init__(
        self,
        data_type: str = "imagereport",
        *,
        n: int = 30,
        arch: ArchConfig | None = None,
        tokenizer=None,
        n_classes: int = 4,
        max_text_len: int = 128,
        seed: int = 0,
    ):
        self.data_type = data_type
        self.n = n
        self.arch = arch or ArchConfig()
        self.tokenizer = tokenizer
        self.n_classes = n_classes
        self.max_text_len = max_text_len
        self.seed = seed
        if data_type == "imageopenseg":
            if tokenizer is None:
                raise ValueError(
                    "imageopenseg synthetic data needs a tokenizer for the "
                    "class prompts (pass tokenizer=HashTokenizer() etc.)")
            prompts = [
                f"This is region of organ {i}." for i in range(n_classes)
            ]
            toks = tokenizer(prompts, max_length=max_text_len)
            self.prompt_ids = toks["input_ids"]
            self.prompt_mask = toks["attention_mask"]

    def __len__(self):
        return self.n

    def _volume(self, rng) -> np.ndarray:
        a = self.arch
        return rng.uniform(
            0, 1, (a.channels, a.temporal_size, a.image_size, a.image_size)
        ).astype(np.float32)

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index))
        a = self.arch
        item: Dict = {"image": self._volume(rng), "data_type": self.data_type}
        if self.data_type == "imagereport":
            text = _SYNTH_SENTENCES[index % len(_SYNTH_SENTENCES)]
            item["text"] = text
            if self.tokenizer is not None:
                toks = self.tokenizer([text], max_length=self.max_text_len)
                item["input_ids"] = toks["input_ids"][0]
                item["attention_mask"] = toks["attention_mask"][0]
        elif self.data_type in ("imageseg", "imageopenseg"):
            mask = (
                rng.uniform(
                    0, 1,
                    (self.n_classes, a.temporal_size, a.image_size,
                     a.image_size),
                )
                > 0.8
            ).astype(np.float32)
            item["seg_mask"] = mask
            if self.data_type == "imageopenseg":
                item["prompt_ids"] = self.prompt_ids
                item["prompt_mask"] = self.prompt_mask
        return item


class SyntheticInferenceDataset:
    """Synthetic zero-shot eval set: volumes + random one-hot labels."""

    def __init__(self, n: int = 10, arch: ArchConfig | None = None,
                 n_labels: int = 18, seed: int = 0):
        self.n = n
        self.arch = arch or ArchConfig()
        self.n_labels = n_labels
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index, 7))
        a = self.arch
        return {
            "image": rng.uniform(
                0, 1, (a.channels, a.temporal_size, a.image_size,
                       a.image_size)
            ).astype(np.float32),
            "text": "synthetic report",
            "onehot": (rng.uniform(0, 1, self.n_labels) > 0.5).astype(
                np.float32
            ),
            "accession": f"synthetic_{index}.nii.gz",
        }
