"""Latent dumping and cross-modal retrieval tooling.

Capability parity with the reference's scripts (SURVEY.md §2.3 last row):
- zero_shot_latents.py:245-333  → dump_latents: per-accession text/image
  latents saved as npz;
- volume_to_volume_new.py:1-111 → volume_to_volume: top-k volume retrieval
  by image-latent cosine + label-overlap scoring;
- report_to_volume_new.py / volume_to_report_try.py → cross-modal retrieval
  by text↔image latent cosine.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _jit_image_latents(engine):
    """ONE jitted batched program for image latents (the reference runs
    encode per volume un-batched, zero_shot_latents.py:245-333)."""
    import jax

    from vit_exp_tpu.models.ctclip import CTCLIP

    from vit_exp_tpu.eval.zero_shot import replicated_out

    model = engine.model

    def fn(params, video):
        tokens = model.apply({"params": params}, video,
                             method=CTCLIP.encode_image_tokens)
        return model.apply({"params": params}, tokens,
                           method=CTCLIP.image_latents_from_tokens)

    return jax.jit(fn, **replicated_out(engine.mesh))


def dump_latents(
    engine,  # eval.zero_shot.ZeroShotClassifier (reuses its jitted encoders)
    dataset,
    out_folder: str,
    *,
    limit: Optional[int] = None,
    num_workers: int = 4,
) -> Dict[str, np.ndarray]:
    """Encode every sample once; save latents + accessions npz.  Batched
    into jitted programs of engine.batch_size with the eval engines'
    load/compute/read pipelining."""
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.eval.zero_shot import (_one_deep_map,
                                            shard_batch)

    os.makedirs(out_folder, exist_ok=True)
    n = min(len(dataset), limit) if limit else len(dataset)
    bs = engine.batch_size
    img_fn = _jit_image_latents(engine)
    image_latents, text_latents, accessions = [], [], []
    seen = [0]

    def dispatch(padded, k, batch):
        texts = list(batch["text"])
        texts += [texts[-1]] * (bs - k)
        toks = engine.tokenizer(texts, max_length=engine.max_text_len)
        txt = engine._text_latents_fn(
            engine.params, jnp.asarray(toks["input_ids"]),
            jnp.asarray(toks["attention_mask"]),
        )
        img = img_fn(engine.params,
                     shard_batch(engine.mesh, jnp.asarray(padded["image"])))
        accs = list(batch.get(
            "accession", [f"sample_{seen[0] + j}" for j in range(k)]))
        seen[0] += k
        return img, txt, k, accs

    for img, txt, k, accs in _one_deep_map(dataset, n, bs, dispatch,
                                           num_workers=num_workers):
        image_latents.extend(np.asarray(img)[:k])
        text_latents.extend(np.asarray(txt)[:k])
        accessions.extend(accs[:k])
    out = {
        "image_latents": np.stack(image_latents),
        "text_latents": np.stack(text_latents),
    }
    # multihost: every process ran the (collective) programs and holds the
    # identical replicated latents; only process 0 writes
    if jax.process_index() == 0:
        np.savez(os.path.join(out_folder, "latents.npz"), **out)
        with open(os.path.join(out_folder, "accessions.txt"), "w") as f:
            f.writelines(a + "\n" for a in accessions)
    out["accessions"] = accessions
    return out


def _topk_cosine(queries: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    kn = keys / np.linalg.norm(keys, axis=-1, keepdims=True)
    sim = qn @ kn.T
    return np.argsort(-sim, axis=-1)[:, :k], np.sort(sim, axis=-1)[:, ::-1][:, :k]


def volume_to_volume(
    image_latents: np.ndarray,
    k: int = 5,
    labels: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Top-k nearest volumes per volume (self excluded); optional
    label-overlap score of retrieved vs query labels
    (volume_to_volume_new.py scoring)."""
    idx, sim = _topk_cosine(image_latents, image_latents, k + 1)
    idx, sim = idx[:, 1:], sim[:, 1:]  # drop self-match
    out = {"indices": idx, "similarities": sim}
    if labels is not None:
        inter = (labels[:, None, :] * labels[idx]).sum(-1)
        union = np.maximum(
            np.maximum(labels[:, None, :], labels[idx]).sum(-1), 1e-9
        )
        out["label_overlap"] = inter / union
    return out


def report_to_volume(text_latents: np.ndarray, image_latents: np.ndarray,
                     k: int = 5) -> Dict[str, np.ndarray]:
    idx, sim = _topk_cosine(text_latents, image_latents, k)
    recall_at_k = float(
        np.mean([i in idx[i] for i in range(len(text_latents))])
    )
    return {"indices": idx, "similarities": sim, "recall_at_k": recall_at_k}


def volume_to_report(image_latents: np.ndarray, text_latents: np.ndarray,
                     k: int = 5) -> Dict[str, np.ndarray]:
    return report_to_volume(image_latents, text_latents, k)


def dump_encodings(engine, dataset, out_folder: str, *, limit=None,
                   num_workers: int = 4):
    """Raw encoded image tokens per accession (forward_data.py:253-283
    `return_encodings` capability) — one npz per sample, encoded in
    jitted batches with the eval engines' pipelining."""
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.eval.zero_shot import (_one_deep_map,
                                            replicated_out,
                                            shard_batch)
    from vit_exp_tpu.models.ctclip import CTCLIP

    model = engine.model

    def _encode(params, video):
        return model.apply({"params": params}, video,
                           method=CTCLIP.encode_image_tokens)

    encode = jax.jit(_encode, **replicated_out(engine.mesh))

    os.makedirs(out_folder, exist_ok=True)
    n = min(len(dataset), limit) if limit else len(dataset)
    bs = engine.batch_size
    paths = []
    seen = [0]

    def dispatch(padded, k, batch):
        tokens = encode(engine.params,
                        shard_batch(engine.mesh,
                                    jnp.asarray(padded["image"])))
        accs = list(batch.get(
            "accession", [f"sample_{seen[0] + j}" for j in range(k)]))[:k]
        seen[0] += k
        return tokens, k, accs

    write = jax.process_index() == 0  # multihost: p0 writes, all compute
    for tokens, k, accs in _one_deep_map(dataset, n, bs, dispatch,
                                         num_workers=num_workers):
        host = np.asarray(tokens[:k], np.float32)
        for row, acc in zip(host, accs):
            path = os.path.join(out_folder,
                                f"{acc.replace('/', '_')}.encodings.npz")
            if write:
                np.savez(path, row)
            paths.append(path)
    # multihost: every process returns the same paths, but only p0 wrote
    # them — barrier so the files exist (on the shared results tree, the
    # same assumption the trainer makes) before any host reads them back
    from vit_exp_tpu.core.multihost import sync_hosts

    sync_hosts("dump_encodings")
    return paths


def tsne_plot(latents: np.ndarray, out_path: str, labels=None,
              perplexity: float = 5.0):
    """2-D t-SNE scatter of latents (tsne_latents.py capability)."""
    from sklearn.manifold import TSNE

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    emb = TSNE(
        n_components=2, perplexity=min(perplexity, max(len(latents) - 2, 1)),
        init="pca", random_state=0,
    ).fit_transform(np.asarray(latents, np.float64))
    fig, ax = plt.subplots(figsize=(6, 6))
    color = None
    if labels is not None:
        labels = np.asarray(labels)
        color = labels if labels.ndim == 1 else labels.argmax(-1)
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=color, s=14, cmap="tab10")
    if color is not None:
        fig.colorbar(sc, ax=ax)
    ax.set_title("latent t-SNE")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return emb
