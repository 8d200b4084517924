"""Report label-extractor CLI — text_classifier/{train,infer}.py equivalent.

Usage:
    python -m vit_exp_tpu.cli.run_text_classifier train \
        --reports reports.csv --labels labels.csv [--augment 1] \
        [--scheduler cawr|rlop] [--epochs N] [--vocab vocab.txt]
    python -m vit_exp_tpu.cli.run_text_classifier infer \
        --reports reports.csv --out predictions.csv [--vocab vocab.txt]

train: BCE multi-label loop with sentence-shuffle augmentation
(train.py:17-153); infer: 18-label CSV out (infer.py:22-156).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _load_frames(reports_csv, labels_csv=None):
    import pandas as pd

    reports = pd.read_csv(reports_csv)
    text_col = next(
        c for c in ("text", "Report", "Findings_EN", "report")
        if c in reports.columns
    )
    texts = reports[text_col].fillna("").astype(str).tolist()
    names = reports.get("VolumeName", pd.Series(range(len(texts)))).tolist()
    labels = None
    label_cols = None
    if labels_csv:
        ldf = pd.read_csv(labels_csv)
        label_cols = [c for c in ldf.columns if c != "VolumeName"]
        labels = ldf[label_cols].to_numpy(dtype=np.float32)
    return names, texts, labels, label_cols


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["train", "infer"])
    parser.add_argument("--reports", required=True)
    parser.add_argument("--labels", default=None)
    parser.add_argument("--out", default="predictions.csv")
    parser.add_argument("--vocab", default=None)
    parser.add_argument("--augment", type=int, default=0)
    parser.add_argument("--scheduler", default="cawr", choices=["cawr", "rlop"])
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--max_len", type=int, default=512)
    parser.add_argument("--results_folder", default="./results_text_classifier")
    parser.add_argument("--model_path", default=None,
                        help="msgpack weights for infer (default: "
                        "<results_folder>/best_model.msgpack if present)")
    parser.add_argument("--val_frac", type=float, default=0.1,
                        help="held-out fraction driving early stop / RLOP")
    args = parser.parse_args(argv)

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.text_classifier.augmentation import (
        shuffle_sentences_augment,
    )
    from vit_exp_tpu.text_classifier.classifier import RadBertClassifier
    from vit_exp_tpu.text_classifier.trainer import TextClassifierTrainer

    tokenizer = load_tokenizer(args.vocab)
    names, texts, labels, label_cols = _load_frames(args.reports, args.labels)
    n_classes = labels.shape[1] if labels is not None else 18
    model = RadBertClassifier(
        BertConfig(vocab_size=tokenizer.vocab_size), n_classes=n_classes
    )
    trainer = TextClassifierTrainer(
        model, lr=args.lr, scheduler=args.scheduler,
        results_folder=args.results_folder,
    )

    if args.mode == "train":
        assert labels is not None, "--labels required for training"
        rng = np.random.default_rng(0)
        n = len(texts)
        # REAL holdout: early stop / RLOP track generalization, not
        # training fit (reference splits train/val, train.py:60-75)
        perm = rng.permutation(n)
        n_val = max(args.batch_size, int(n * args.val_frac)) if n > 1 else 0
        n_val = min(n_val, max(n - 1, 0))
        val_idx, train_idx = perm[:n_val], perm[n_val:]

        def val_batches():
            for i in range(0, len(val_idx), args.batch_size):
                sel = val_idx[i:i + args.batch_size]
                toks = tokenizer([texts[j] for j in sel],
                                 max_length=args.max_len)
                yield (toks["input_ids"], toks["attention_mask"],
                       labels[sel])

        for epoch in range(args.epochs):
            order = rng.permutation(train_idx)
            for start in range(0, len(order), args.batch_size):
                idx = order[start:start + args.batch_size]
                batch_texts = [
                    shuffle_sentences_augment(texts[i], rng=rng)
                    if args.augment else texts[i]
                    for i in idx
                ]
                toks = tokenizer(batch_texts, max_length=args.max_len)
                loss = trainer.fit_batch(
                    toks["input_ids"], toks["attention_mask"], labels[idx]
                )
            metrics = trainer.evaluate(list(val_batches()))
            print(f"epoch {epoch}: train_loss {loss:.4f} "
                  f"val_loss {metrics['val_loss']:.4f} "
                  f"macro_f1 {metrics['macro_f1']:.4f}")
            if trainer.end_epoch(metrics["val_loss"]):
                print("early stop")
                break
        path = trainer.save()
        print(f"best-val checkpoint: {path}")
    else:
        import pandas as pd
        import jax.numpy as jnp
        import jax

        ckpt = args.model_path or os.path.join(args.results_folder,
                                               "best_model.msgpack")
        if os.path.exists(ckpt):
            trainer.load(ckpt)
            print(f"loaded weights from {ckpt}")
        else:
            print(f"WARNING: no checkpoint at {ckpt} — predictions come "
                  "from randomly initialized weights", flush=True)
        rows = []
        for start in range(0, len(texts), args.batch_size):
            chunk = texts[start:start + args.batch_size]
            toks = tokenizer(chunk, max_length=args.max_len)
            logits = model.apply(
                {"params": trainer.params}, jnp.asarray(toks["input_ids"]),
                jnp.asarray(toks["attention_mask"]),
            )
            rows.append(np.asarray(jax.nn.sigmoid(logits)))
        probs = np.concatenate(rows)
        cols = label_cols or [f"label_{i}" for i in range(probs.shape[1])]
        out = pd.DataFrame(probs, columns=cols)
        out.insert(0, "VolumeName", names)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        out.to_csv(args.out, index=False)
        print(f"wrote {args.out} ({len(out)} rows)")


if __name__ == "__main__":
    main()
