"""Planted-signal synthetic task (data/planted.py): the generator must
carry the signal it claims — attribute blobs measurably present exactly
where planted, reports built from the exact zero-shot prompt sentences —
or the learning demo (scripts/train_convergence.py planted) would chase a
dataset bug instead of model behavior."""

import numpy as np

from vit_exp_tpu.core.config import ArchConfig
from vit_exp_tpu.data.planted import (
    _CENTERS,
    PLANTED_ATTRS,
    PlantedCTDataset,
    PlantedInferenceDataset,
    planted_report,
    planted_volume,
)
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.eval.zero_shot import build_pathology_prompts

ARCH = ArchConfig.from_dict({
    "arch_name": "ctvit_3d", "dim": 48, "image_size": 32, "patch_size": 8,
    "temporal_size": 16, "temporal_patch_size": 4, "transformer_blocks": 2,
    "dim_head": 8, "heads": 4,
})


def test_report_sentences_are_the_zero_shot_prompts():
    """Training reports must contain EXACTLY the prompt sentences the
    zero-shot engine embeds, or the eval would not be learnable."""
    prompts = build_pathology_prompts(PLANTED_ATTRS)
    report = planted_report([1, 0, 1, 0])
    assert report.split(". ")[0] + "." == prompts[0]        # present
    for k, y in enumerate([1, 0, 1, 0]):
        want = prompts[2 * k] if y else prompts[2 * k + 1]
        assert want in report
        unwanted = prompts[2 * k + 1] if y else prompts[2 * k]
        assert unwanted not in report


def test_blob_raises_regional_mean_only_where_planted():
    shape = (32, 64, 64)
    rng0, rng1 = (np.random.default_rng(3), np.random.default_rng(3))
    off = planted_volume(rng0, [0, 0, 0, 0], shape)[0]
    on = planted_volume(rng1, [1, 0, 0, 0], shape)[0]
    assert off.shape == shape and on.shape == shape
    assert 0.0 <= off.min() and off.max() <= 1.0

    def region(vol, c):
        d, h, w = shape
        zs = slice(int(c[0] * d) - d // 8, int(c[0] * d) + d // 8)
        ys = slice(int(c[1] * h) - h // 8, int(c[1] * h) + h // 8)
        xs = slice(int(c[2] * w) - w // 8, int(c[2] * w) + w // 8)
        return vol[zs, ys, xs].mean()

    # the planted octant brightens by a clear margin...
    assert region(on, _CENTERS[0]) - region(off, _CENTERS[0]) > 0.1
    # ...while an un-planted octant stays put (same rng stream up to the
    # blob draw; tolerance covers the diverged noise draws)
    assert abs(region(on, _CENTERS[3]) - region(off, _CENTERS[3])) < 0.03


def test_datasets_items_and_determinism():
    tok = HashTokenizer(vocab_size=512, max_length=64)
    train = PlantedCTDataset(6, arch=ARCH, tokenizer=tok, max_text_len=64,
                             seed=0)
    item = train[2]
    assert item["image"].shape == (1, 16, 32, 32)
    assert item["data_type"] == "imagereport"
    assert item["input_ids"].shape == (64,)
    again = train[2]
    np.testing.assert_array_equal(item["image"], again["image"])
    assert item["text"] == again["text"]

    ev = PlantedInferenceDataset(5, arch=ARCH, seed=1)
    e = ev[1]
    assert e["onehot"].shape == (len(PLANTED_ATTRS),)
    # labels must agree with the report text they generated (sentence
    # ORDER is shuffled per sample — compare as sets)
    assert sorted(e["text"].rstrip(".").split(". ")) == sorted(
        planted_report(e["onehot"]).rstrip(".").split(". "))
    # held-out stream differs from the train stream at the same index
    assert not np.allclose(e["image"], train[1]["image"])


def test_report_order_is_shuffled_per_sample():
    """Sentence order must vary across samples: with a fixed canonical
    order the single-sentence zero-shot prompts are positionally OOD and
    per-attribute AUROC tracks sentence position instead of content
    (measured on TPU: first-position attr 0.83 vs last 0.59)."""
    tok = HashTokenizer(vocab_size=512, max_length=64)
    train = PlantedCTDataset(64, arch=ARCH, tokenizer=tok, seed=0)
    first_attrs = set()
    for i in range(24):
        first_attrs.add(train[i]["text"].split(" is ")[0])
    assert len(first_attrs) >= 3, first_attrs


def test_drop_any_sentence_dropout():
    """drop_any_p drops sentences SYMMETRICALLY (positives and negatives
    alike — unlike drop_neg_p, which de-loads the word 'not'; see the
    planted_report docstring), always keeps at least one sentence, and
    requires a seeded rng."""
    import numpy as np
    import pytest

    from vit_exp_tpu.data.planted import planted_report

    labels = [1, 0, 1, 0]
    with pytest.raises(ValueError):
        planted_report(labels, drop_any_p=0.5)

    rng = np.random.default_rng(0)
    lengths, pos_drops, neg_drops = set(), 0, 0
    for _ in range(200):
        text = planted_report(labels, rng=rng, drop_any_p=0.5)
        sents = [s for s in text.split(".") if s.strip()]
        assert 1 <= len(sents) <= 4
        lengths.add(len(sents))
        pos_drops += 2 - sum("not" not in s for s in sents)
        neg_drops += 2 - sum("not" in s for s in sents)
    assert len(lengths) >= 3          # report length really varies
    assert pos_drops > 0 and neg_drops > 0   # both classes get dropped
    # symmetric: neither class is preferentially dropped
    assert 0.5 < pos_drops / neg_drops < 2.0

    # p=0 keeps every sentence
    text = planted_report(labels, rng=np.random.default_rng(1))
    assert sum(1 for s in text.split(".") if s.strip()) == 4


def test_label_balance():
    """Both classes occur for every attribute over a modest sample — the
    AUROC eval needs non-degenerate labels."""
    ev = PlantedInferenceDataset(32, arch=ARCH, seed=1)
    labels = np.stack([ev[i]["onehot"] for i in range(len(ev))])
    assert (labels.sum(0) >= 4).all() and (labels.sum(0) <= 28).all()
