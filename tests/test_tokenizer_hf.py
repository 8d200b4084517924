"""Differential tests: our tokenizers vs the HF reference implementations.

VERDICT round-1 item 5: production tokenization is
BertTokenizer('microsoft/BiomedVLP-CXR-BERT-specialized', do_lower_case=
True) (CTCLIPTrainer.py:553-581) and RobertaTokenizer for RadBERT
(text_classifier/classifier.py:22).  The actual vocabs can't be downloaded
offline, so both tokenizer families are trained here on a radiology corpus
with HF `tokenizers` and then OUR reimplementation must produce
byte-identical input_ids/attention_mask to the HF fast tokenizers across a
200-case corpus covering lowercase, punctuation, accents, ##-continuation,
[UNK], CJK, control chars, and max_length truncation.
"""


import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

CORPUS = [
    "Lungs are clear bilaterally without focal consolidation.",
    "No pleural effusion or pneumothorax is seen.",
    "There is a 4 mm nodule in the right upper lobe.",
    "Mild cardiomegaly with atherosclerotic calcification of the aorta.",
    "Hepatosplenomegaly and trace perihepatic free fluid.",
    "Post-surgical changes of the anterior chest wall.",
    "Ground-glass opacities suggestive of atypical infection.",
    "Mediastinal lymphadenopathy measuring up to 1.2 cm.",
    "Degenerative changes of the thoracic spine.",
    "Findings: unremarkable CT of the chest; impression normal.",
    "Patient age 62 years, sex F, follow-up recommended in 6 months.",
    "Emphysematous changes with apical bullae, no acute abnormality.",
]


def _cases():
    base = CORPUS + [
        "",  # empty string
        "   ",  # whitespace only
        "UPPERCASE REPORT WITH SHOUTING",
        "naïve café résumé — déjà vu, Müller's sign",  # accents
        "weird \x00control\x7fchars\u200bhere",  # NUL, DEL, ZWSP
        "tabs\tand\nnewlines\r\nmixed   spacing",
        "punctuation!!! (parentheses) [brackets] {braces} semi;colon:",
        "hyphenated-words and co-existing dis-ease states",
        "numbers 123 45.6 7,890 3/4 2:1 ratio",
        "unicode 肺炎 chinese chars 结节 inline",  # CJK spacing
        "qzxjvkqq unknowntokenxyzzy flibbertigibbet",  # [UNK] bait
        "a",  # single char
        "supercalifragilisticexpialidocious" * 5,  # >100 char word → UNK
        "étude",  # combining accent (NFD input)
        "mixed МОСКВА cyrillic and ελληνικά greek",
        "'quotes' \"double\" `backtick` don't can't won't",
        "trailing space ",
        " leading space",
        "dots...ellipsis…and—emdash–endash",
    ]
    # 200-case corpus: pairwise concatenations for variety
    out = list(base)
    i = 0
    while len(out) < 200:
        a = base[i % len(base)]
        b = base[(i * 7 + 3) % len(base)]
        out.append(a + " " + b)
        i += 1
    return out[:200]


@pytest.fixture(scope="module")
def wordpiece_vocab(tmp_path_factory):
    """Train a WordPiece vocab on the radiology corpus (HF trainer)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    trainer = trainers.WordPieceTrainer(
        vocab_size=800,
        special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"],
    )
    tok.train_from_iterator([c.lower() for c in CORPUS * 4], trainer)
    vocab = sorted(tok.get_vocab().items(), key=lambda kv: kv[1])
    path = tmp_path_factory.mktemp("wp") / "vocab.txt"
    path.write_text("\n".join(t for t, _ in vocab) + "\n", encoding="utf-8")
    return str(path)


@pytest.mark.parametrize("max_length", [512, 32])
def test_wordpiece_matches_bert_tokenizer_fast(wordpiece_vocab, max_length):
    from vit_exp_tpu.data.tokenizer import WordPieceTokenizer

    hf = transformers.BertTokenizerFast(
        vocab_file=wordpiece_vocab, do_lower_case=True)
    ours = WordPieceTokenizer(wordpiece_vocab, max_length=max_length)

    cases = _cases()
    got = ours(cases, max_length=max_length)
    want = hf(cases, padding="max_length", truncation=True,
              max_length=max_length, return_tensors="np")
    mismatch = [
        i for i in range(len(cases))
        if not (np.array_equal(got["input_ids"][i],
                               want["input_ids"][i].astype(np.int32))
                and np.array_equal(got["attention_mask"][i],
                                   want["attention_mask"][i].astype(
                                       np.int32)))
    ]
    assert not mismatch, (
        f"{len(mismatch)}/200 mismatches; first: {cases[mismatch[0]]!r}\n"
        f"ours: {got['input_ids'][mismatch[0]][:48].tolist()}\n"
        f"hf:   {want['input_ids'][mismatch[0]][:48].tolist()}")


def test_wordpiece_slow_bert_tokenizer_agrees(wordpiece_vocab):
    """Belt and braces: the SLOW python BertTokenizer (what the reference
    actually instantiates) agrees too on a subset."""
    hf = transformers.BertTokenizer(
        vocab_file=wordpiece_vocab, do_lower_case=True)
    from vit_exp_tpu.data.tokenizer import WordPieceTokenizer

    ours = WordPieceTokenizer(wordpiece_vocab, max_length=64)
    for case in _cases()[:40]:
        want = hf(case, padding="max_length", truncation=True, max_length=64)
        got = ours(case, max_length=64)
        assert got["input_ids"][0].tolist() == want["input_ids"], case


@pytest.fixture(scope="module")
def roberta_files(tmp_path_factory):
    """Train a byte-level BPE (RoBERTa-style) on the corpus."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=600,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS * 4, trainer)
    d = tmp_path_factory.mktemp("bpe")
    model_files = tok.model.save(str(d))
    vocab_path = [f for f in model_files if f.endswith("vocab.json")][0]
    merges_path = [f for f in model_files if f.endswith("merges.txt")][0]
    return vocab_path, merges_path


@pytest.mark.parametrize("max_length", [128, 24])
def test_bytelevel_bpe_matches_roberta_tokenizer_fast(roberta_files,
                                                      max_length):
    from vit_exp_tpu.data.bpe import ByteLevelBPETokenizer

    vocab_path, merges_path = roberta_files
    hf = transformers.RobertaTokenizerFast(
        vocab_file=vocab_path, merges_file=merges_path)
    ours = ByteLevelBPETokenizer(vocab_path, merges_path,
                                 max_length=max_length)

    # RoBERTa BPE has no UNK fallback for unseen bytes-combos (every byte
    # is in the alphabet), so all cases are representable
    cases = _cases()
    got = ours(cases, max_length=max_length)
    want = hf(cases, padding="max_length", truncation=True,
              max_length=max_length, return_tensors="np")
    mismatch = [
        i for i in range(len(cases))
        if not np.array_equal(got["input_ids"][i],
                              want["input_ids"][i].astype(np.int32))
    ]
    assert not mismatch, (
        f"{len(mismatch)}/200 mismatches; first: {cases[mismatch[0]]!r}\n"
        f"ours: {got['input_ids'][mismatch[0]][:32].tolist()}\n"
        f"hf:   {want['input_ids'][mismatch[0]][:32].tolist()}")
    assert np.array_equal(got["attention_mask"],
                          want["attention_mask"].astype(np.int32))
