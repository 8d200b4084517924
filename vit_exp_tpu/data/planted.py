"""Planted-signal synthetic CT task — a LEARNABLE correspondence.

The plain synthetic sets (data/synthetic.py) carry no image↔text signal:
they exist to exercise shapes and plumbing, so training on them measures
only gradient plumbing and zero-shot AUROC sits at chance.  This module
plants a real signal instead, giving an offline stand-in for the
reference's debug-30 integration methodology (the 30-sample smoke configs,
configs/train_from_scratch/ct_clip_debug_30_v2.yaml:3-12) that can
demonstrate end-to-end LEARNING with a pass/fail bound:

- K attributes, each tied to a smooth blob with an attribute-specific
  location AND appearance (bright/dark × size, _APPEARANCE; centers
  jittered per sample so the model must read anatomy, not memorize
  voxels);
- the paired report is built from EXACTLY the zero-shot prompt sentences
  ("{attr} is present." / "{attr} is not present.",
  eval/zero_shot.py::build_pathology_prompts ≡ reference
  scripts/zero_shot.py:482-487), so after contrastive training the
  standard zero-shot engine scores the planted attributes directly and
  per-attribute AUROC >> 0.5 is achievable by actually learning the
  image↔text correspondence — and by nothing else.

Used by scripts/train_convergence.py's `planted` mode (VERDICT r2 #6).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from vit_exp_tpu.core.config import ArchConfig

PLANTED_ATTRS: Tuple[str, ...] = (
    "left effusion",
    "cardiomegaly",
    "lung nodule",
    "consolidation",
)

# blob centers in fractional (z, y, x) coordinates — distinct octants so
# attributes never overlap even with jitter
_CENTERS = (
    (0.30, 0.30, 0.30),
    (0.30, 0.70, 0.70),
    (0.70, 0.30, 0.70),
    (0.70, 0.70, 0.30),
)

# per-attribute (gain, sigma_frac): each attribute has a DISTINCT visual
# signature (bright/dark × size), not just a distinct octant.  Run 4 of the
# on-chip demo (BENCH_NOTES iteration table) plateaued at train loss 0.067
# ≈ ln(8)/32 — the exact InfoNCE value for discriminating on only TWO of
# the four bits in batch 32 — with the two unlearned attributes at chance
# AUROC: with four visually IDENTICAL blobs differing only by octant, the
# contrastive objective suppresses the redundant features (the classic
# feature-suppression failure mode).  Real pathologies are visually
# diverse; making the planted ones so removes the degeneracy while keeping
# the task a genuine image↔text correspondence.
#
# Run 5 (first _APPEARANCE draft: sigmas 0.07-0.16) taught the second half
# of the lesson: which two bits get learned is set by the blobs' INTEGRATED
# energy |gain|·σ³ — the patch-mean pooling over 12³ tokens dilutes a
# σ=0.07 blob ~12× relative to σ=0.16, and the contrastive objective
# simply learned the two biggest blobs (0.81/0.88 AUROC) while the two
# smallest sat below chance.  Appearances must therefore be DISTINCT in
# (polarity, size) but near-EQUAL in integrated energy, or saliency
# imbalance re-creates the suppression the diversity was meant to remove.
#
# Run 6 (energies equalized at ~0.0007, within 1.7×) taught the third:
# the equalization LEVEL matters as much as the spread.  At ~0.0007 all
# four image-side probes stalled at 0.71-0.82 (mean zero-shot 0.635) —
# the energy run 5 proved sufficient was ~0.0014 (its two ≥0.0014 blobs
# scored 0.81/0.88 zero-shot).  Run 7 therefore equalizes AT the proven
# level: |gain|·σ³ ≈ 0.0014 for all four (spread < 3%), with appearance
# diversity carried by polarity × a 1.25× size range × gain-compensation
# (bright-small-strong … dark-large-faint).
_APPEARANCE = (
    (0.50, 0.140),
    (-0.40, 0.152),
    (0.30, 0.167),
    (-0.26, 0.175),
)


def planted_report(labels: Sequence[int],
                   attrs: Sequence[str] = PLANTED_ATTRS,
                   rng: np.random.Generator | None = None,
                   drop_neg_p: float = 0.0,
                   drop_any_p: float = 0.0) -> str:
    """Report text = concatenation of the zero-shot prompt sentences.

    With `rng`, the sentence ORDER is shuffled per sample.  This matters
    for zero-shot transfer: with a fixed canonical order each attribute's
    sentence lives at one position, and the single-sentence eval prompts
    are positionally out-of-distribution — measured on TPU, per-attribute
    AUROC then tracks training position (first 0.83 → last 0.59) instead
    of content.  Shuffling forces the text tower to encode WHAT the
    sentence says, not WHERE it sits (real reports order findings freely
    too).

    With `drop_neg_p` > 0 (needs `rng`), each NEGATIVE sentence is dropped
    with that probability — real reports rarely enumerate every absent
    finding, and training only on full 4-sentence reports leaves the
    single-sentence eval prompts length-OOD for the text tower.  Dropping
    negatives varies report length/content per sample WITHOUT adding label
    collisions (the positive-sentence set still determines the label
    vector exactly).  At least one sentence is always kept.

    CAUTION (measured, BENCH_NOTES run-6 A/B): drop_neg_p > 0 makes the
    positive-sentence set alone label-determining, the optimal contrastive
    text encoder then IGNORES the word "not", and zero-shot transfer
    INVERTS (0.378 vs 0.772).  `drop_any_p` is the symmetric variant that
    avoids this: each sentence — positive or negative alike — drops with
    that probability, so negations stay load-bearing (a kept negative
    sentence still must align with absence) while report length/content
    varies and single-sentence eval prompts become in-distribution.  At
    least one sentence is always kept."""
    sentences = [
        f"{a} is present." if y else f"{a} is not present."
        for a, y in zip(attrs, labels)
    ]
    if (drop_neg_p > 0 or drop_any_p > 0) and rng is None:
        raise ValueError("sentence dropping (drop_neg_p/drop_any_p > 0) "
                         "requires rng (must be seeded per sample)")
    if rng is not None and drop_neg_p > 0:
        kept = [s for s, y in zip(sentences, labels)
                if y or rng.uniform() >= drop_neg_p]
        if not kept:  # all-absent sample with every negative dropped
            kept = [sentences[int(rng.integers(len(sentences)))]]
        sentences = kept
    if rng is not None and drop_any_p > 0:
        kept = [s for s in sentences if rng.uniform() >= drop_any_p]
        if not kept:
            kept = [sentences[int(rng.integers(len(sentences)))]]
        sentences = kept
    if rng is not None:
        sentences = [sentences[i] for i in rng.permutation(len(sentences))]
    return " ".join(sentences)


def _separable_blob(shape, center, sigma_frac, rng):
    """Axis-separable Gaussian bump with per-sample center jitter —
    computed as an outer product of three 1-D Gaussians (O(D+H+W) work
    before the broadcast)."""
    axes = []
    for size, c in zip(shape, center):
        cj = c + rng.uniform(-0.04, 0.04)
        x = (np.arange(size, dtype=np.float32) / size - cj) / sigma_frac
        axes.append(np.exp(-0.5 * x * x))
    return (axes[0][:, None, None] * axes[1][None, :, None]
            * axes[2][None, None, :])


def planted_volume(rng: np.random.Generator, labels: Sequence[int],
                   shape: Tuple[int, int, int]) -> np.ndarray:
    """(1, D, H, W) float32 volume in [0, 1]: low-frequency background
    anatomy + one blob per present attribute (attribute-specific octant,
    polarity and size — _CENTERS/_APPEARANCE) + voxel noise."""
    d, h, w = shape
    coarse = rng.standard_normal((3, 4, 4)).astype(np.float32)
    base = (coarse.repeat(-(-d // 3), 0)[:d]
                  .repeat(-(-h // 4), 1)[:, :h]
                  .repeat(-(-w // 4), 2)[:, :, :w])
    vol = 0.45 + 0.10 * base
    for k, y in enumerate(labels):
        if y:
            gain, sigma = _APPEARANCE[k]
            vol = vol + gain * _separable_blob(shape, _CENTERS[k], sigma, rng)
    vol = vol + 0.05 * rng.standard_normal(shape).astype(np.float32)
    # fp16 on the wire: volumes are [0, 1] with a 0.05 noise floor, so the
    # ~2^-11 relative rounding is invisible to the task while halving the
    # host→device bytes (221→110 MB/step at batch 32·120³ — the step-time
    # AND axon-leak bottleneck); compute casts to bf16 at the tower entry
    # anyway (core/precision.py)
    return np.clip(vol, 0.0, 1.0)[None].astype(np.float16)


def _labels_for(rng: np.random.Generator, k: int) -> np.ndarray:
    return (rng.uniform(0, 1, k) < 0.5).astype(np.float32)


class PlantedCTDataset:
    """imagereport train set with planted image↔text correspondence."""

    def __init__(self, n: int = 64, *, arch: ArchConfig | None = None,
                 tokenizer=None, max_text_len: int = 64, seed: int = 0,
                 attrs: Sequence[str] = PLANTED_ATTRS,
                 drop_neg_p: float = 0.0, drop_any_p: float = 0.0):
        self.n = n
        self.arch = arch or ArchConfig()
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        self.seed = seed
        self.attrs = list(attrs)
        self.drop_neg_p = drop_neg_p
        self.drop_any_p = drop_any_p

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index))
        a = self.arch
        labels = _labels_for(rng, len(self.attrs))
        text = planted_report(labels, self.attrs, rng=rng,
                              drop_neg_p=self.drop_neg_p,
                              drop_any_p=self.drop_any_p)
        item: Dict = {
            "image": planted_volume(
                rng, labels, (a.temporal_size, a.image_size, a.image_size)),
            "text": text,
            "data_type": "imagereport",
        }
        if self.tokenizer is not None:
            toks = self.tokenizer([text], max_length=self.max_text_len)
            item["input_ids"] = toks["input_ids"][0]
            item["attention_mask"] = toks["attention_mask"][0]
        return item


class PlantedInferenceDataset:
    """Held-out zero-shot eval set over the SAME planted distribution —
    disjoint from any train index via a distinct seed stream."""

    def __init__(self, n: int = 32, *, arch: ArchConfig | None = None,
                 seed: int = 1, attrs: Sequence[str] = PLANTED_ATTRS):
        self.n = n
        self.arch = arch or ArchConfig()
        self.seed = seed
        self.attrs = list(attrs)

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index, 11))
        a = self.arch
        labels = _labels_for(rng, len(self.attrs))
        return {
            "image": planted_volume(
                rng, labels, (a.temporal_size, a.image_size, a.image_size)),
            "text": planted_report(labels, self.attrs, rng=rng),
            "onehot": labels,
            "accession": f"planted_{index}.nii.gz",
        }


# ---------------------------------------------------------------------------
# planted SEGMENTATION task — lesion blobs at UNIFORM random locations
# ---------------------------------------------------------------------------

# class names are LEXICALLY distinct whole words ("bright"/"dark"), not
# subword variants: the first on-chip openseg run used "hyperdense
# lesion"/"hypodense lesion" and the two prompt embeddings COLLAPSED —
# the prediction maps were voxel-identical (126,424 vs 126,422 predicted
# voxels over 8 volumes), firing on BOTH blobs, because a random-init
# 4-layer BERT's CLS barely separates prompts differing in one wordpiece
# ('hyper'/'hypo') and the cosine-sim gradient then has no text-side
# traction.  Real open-vocab usage has a PRETRAINED text tower where
# near-synonym prompts are already separated; distinct words keep the
# planted demo testing voxel↔prompt alignment, not random-init BERT
# lexicography.
PLANTED_STRUCTS: Tuple[str, ...] = ("bright lesion", "dark lesion")

# class k adds _SEG_GAIN[k]·blob to the volume: localization must be read
# from APPEARANCE (bright vs dark), not from a memorizable position
_SEG_GAIN = (0.45, -0.40)
# blob size: at the original σ=0.08 the 1.5σ masks covered 0.7% of the
# voxels and plain BCE (the reference's closed-set loss, ct_clip.py:1210)
# found the all-background optimum — on-chip run loss 0.74 → 0.012 with
# held-out dice 0.067.  σ=0.14 puts ~3.9% of voxels in-mask, enough that
# localizing beats the trivial solution while the blobs stay far smaller
# than the volume.
_SEG_SIGMA = 0.14
# mask = blob ≥ this ⇔ voxel within 1.5σ of the (jittered) center
_SEG_MASK_LEVEL = float(np.exp(-0.5 * 1.5 * 1.5))


def planted_seg_sample(rng: np.random.Generator, present: Sequence[int],
                       shape: Tuple[int, int, int]):
    """((1, D, H, W) volume, (C, D, H, W) voxel mask) pair for the closed-
    set seg path (ct_clip.py:1197-1222 training surface).  Each present
    class plants one smooth blob at a uniform random center in the
    [0.2, 0.8]³ interior; the ground-truth mask is the blob's 1.5σ
    ellipsoid, bit-aligned with the intensity bump it thresholds."""
    d, h, w = shape
    coarse = rng.standard_normal((3, 4, 4)).astype(np.float32)
    base = (coarse.repeat(-(-d // 3), 0)[:d]
                  .repeat(-(-h // 4), 1)[:, :h]
                  .repeat(-(-w // 4), 2)[:, :, :w])
    vol = 0.45 + 0.08 * base
    # uint8 masks: 4× less host→device transfer than f32 (the loss and the
    # dice runner both cast on device); the reference stores npz uint8 too
    masks = np.zeros((len(present),) + shape, np.uint8)
    for k, y in enumerate(present):
        if y:
            center = tuple(rng.uniform(0.2, 0.8, 3))
            blob = _separable_blob(shape, center, _SEG_SIGMA, rng)
            vol = vol + _SEG_GAIN[k] * blob
            masks[k] = blob >= _SEG_MASK_LEVEL
    vol = vol + 0.04 * rng.standard_normal(shape).astype(np.float32)
    # fp16 volumes for the same wire-size reason as planted_volume
    return np.clip(vol, 0.0, 1.0)[None].astype(np.float16), masks


class PlantedSegDataset:
    """imageseg train set with planted lesion blobs (VERDICT r2 #6's seg
    half): items carry the closed-set step's batch surface
    (train/steps.py::imageseg_loss — `image` + voxel `seg_mask`)."""

    def __init__(self, n: int = 64, *, arch: ArchConfig | None = None,
                 seed: int = 0, structs: Sequence[str] = PLANTED_STRUCTS):
        self.n = n
        self.arch = arch or ArchConfig()
        self.seed = seed
        self.structs = list(structs)

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index, 7))
        a = self.arch
        present = (rng.uniform(0, 1, len(self.structs)) < 0.7).astype(int)
        vol, masks = planted_seg_sample(
            rng, present, (a.temporal_size, a.image_size, a.image_size))
        return {"image": vol, "seg_mask": masks, "data_type": "imageseg"}


class PlantedOpenSegDataset:
    """imageopenseg train set — the SAME planted lesions as the seg twin,
    but supervised through the open-vocabulary path (train/steps.py::
    imageopenseg_loss; ct_clip.py:1060-1129 training surface): items carry
    the shared pre-tokenized class prompts ("This is region of {name}.",
    data/datasets.py::PROMPT_TEMPLATES ≡ the reference's seg prompt
    template) so the model must align per-voxel embeddings with the
    PROMPT TEXT embedding, not a fixed per-class output channel."""

    def __init__(self, n: int = 64, *, arch: ArchConfig | None = None,
                 tokenizer=None, max_text_len: int = 64, seed: int = 0,
                 structs: Sequence[str] = PLANTED_STRUCTS,
                 prompt_type: str = "this_region"):
        from vit_exp_tpu.data.datasets import PROMPT_TEMPLATES

        if tokenizer is None:
            raise ValueError("PlantedOpenSegDataset needs a tokenizer for "
                             "the class prompts")
        self.n = n
        self.arch = arch or ArchConfig()
        self.seed = seed
        self.structs = list(structs)
        template = PROMPT_TEMPLATES[prompt_type]
        toks = tokenizer([template.format(name=s) for s in self.structs],
                         max_length=max_text_len)
        self.prompt_ids = toks["input_ids"]          # (C, L)
        self.prompt_mask = toks["attention_mask"]    # (C, L)

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index, 17))
        a = self.arch
        present = (rng.uniform(0, 1, len(self.structs)) < 0.7).astype(int)
        vol, masks = planted_seg_sample(
            rng, present, (a.temporal_size, a.image_size, a.image_size))
        return {"image": vol, "seg_mask": masks,
                "prompt_ids": self.prompt_ids,
                "prompt_mask": self.prompt_mask,
                "data_type": "imageopenseg"}


class PlantedOpenSegInferenceDataset:
    """Held-out eval set for the open-vocab twin (scored by dice of the
    thresholded prompt-token similarity — the training objective's own
    prediction surface, models/losses.py::_sim01 ≥ 0.5)."""

    def __init__(self, n: int = 16, *, arch: ArchConfig | None = None,
                 seed: int = 1, structs: Sequence[str] = PLANTED_STRUCTS):
        self.n = n
        self.arch = arch or ArchConfig()
        self.seed = seed
        self.structs = list(structs)

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index, 19))
        a = self.arch
        present = (rng.uniform(0, 1, len(self.structs)) < 0.7).astype(int)
        vol, masks = planted_seg_sample(
            rng, present, (a.temporal_size, a.image_size, a.image_size))
        return {"image": vol, "seg_mask": masks,
                "accession": f"planted_openseg_{index}.nii.gz"}


class PlantedSegInferenceDataset:
    """Held-out dice eval set (ZeroShotSegmenter.infer surface)."""

    def __init__(self, n: int = 16, *, arch: ArchConfig | None = None,
                 seed: int = 1, structs: Sequence[str] = PLANTED_STRUCTS):
        self.n = n
        self.arch = arch or ArchConfig()
        self.seed = seed
        self.structs = list(structs)

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, index, 13))
        a = self.arch
        present = (rng.uniform(0, 1, len(self.structs)) < 0.7).astype(int)
        vol, masks = planted_seg_sample(
            rng, present, (a.temporal_size, a.image_size, a.image_size))
        return {"image": vol, "seg_mask": masks,
                "accession": f"planted_seg_{index}.nii.gz"}
