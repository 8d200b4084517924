"""CT-LiPro — linear probe on frozen CTCLIP image latents.

Capability parity with scripts/ct_lipro_train.py:17-147:
- head: ReLU → dropout(0.3) → Linear(dim_latent → 18) on the (un-normalized
  pre-cosine) image latents, CLIP backbone frozen;
- BCEWithLogits with the 18 hand-tuned positive-class weights
  (ct_lipro_train.py:79-83);
- AdamW + cosine LR with warmup (src/models/utils.cosine_lr semantics).

TPU-native: the frozen tower runs under stop_gradient inside the same jit,
so XLA skips the backward through it; latents can optionally be precomputed
once per dataset (the probe then trains at memory speed).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_exp_tpu.models.ctclip import CTCLIP

LIPRO_POS_WEIGHTS = np.asarray([
    9.211362733, 2.384068466, 8.295479204, 32.8629776, 2.992233613,
    6.064870808, 3.176470588, 4.187083754, 3.022222222, 1.216071737,
    1.677849552, 3.152851834, 7.123261694, 18.16629381, 13.8480647,
    6.335045662, 10.81701149, 13.40695067,
], dtype=np.float32)


class LiProHead(nn.Module):
    num_classes: int = 18
    dropout_prob: float = 0.3

    @nn.compact
    def __call__(self, latents: jnp.ndarray, *, train: bool = False):
        x = nn.relu(latents)
        x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="classifier")(x)


def weighted_bce_with_logits(logits, labels, pos_weight):
    """torch BCEWithLogitsLoss(pos_weight=...) semantics."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    return jnp.mean(per)


class LiProTrainer:
    def __init__(
        self,
        clip_model: CTCLIP,
        clip_params,
        *,
        num_classes: int = 18,
        lr: float = 1e-3,
        wd: float = 0.1,
        warmup_steps: int = 500,
        total_steps: int = 10_000,
        pos_weights: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        self.clip_model = clip_model
        self.clip_params = clip_params
        self.head = LiProHead(num_classes=num_classes)
        self.pos_weight = jnp.asarray(
            pos_weights if pos_weights is not None else
            LIPRO_POS_WEIGHTS[:num_classes]
        )
        rng = jax.random.PRNGKey(seed)
        dim_latent = clip_model.dim_latent
        self.head_params = self.head.init(
            rng, jnp.zeros((1, dim_latent))
        )["params"]
        warmup_steps = min(warmup_steps, max(total_steps // 10, 1))
        # optax requires decay_steps > warmup_steps (a 1-step horizon
        # otherwise leaves zero cosine steps)
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1)
        )
        self.tx = optax.adamw(schedule, weight_decay=wd)
        self.opt_state = self.tx.init(self.head_params)
        self.step = 0
        self._rng = rng

        model = clip_model
        head = self.head
        pos_weight = self.pos_weight

        @jax.jit
        def latents_fn(clip_params, video):
            # the reference probe trains on the model's return_latents
            # output, which is l2-NORMALIZED (ct_clip.py:1618,1638 —
            # map(l2norm, ...) before return); image_latents_from_tokens
            # is exactly that path (mean-before-projection, exact for the
            # bias-free linear, and 13k× cheaper than projecting per
            # token)
            tokens = model.apply({"params": clip_params}, video,
                                 method=CTCLIP.encode_image_tokens)
            lat = model.apply({"params": clip_params}, tokens,
                              method=CTCLIP.image_latents_from_tokens)
            return jax.lax.stop_gradient(lat)

        @jax.jit
        def train_step(head_params, opt_state, latents, labels, dropout_rng):
            def loss_fn(p):
                logits = head.apply({"params": p}, latents, train=True,
                                    rngs={"dropout": dropout_rng})
                return weighted_bce_with_logits(
                    logits, labels.astype(jnp.float32), pos_weight
                )

            loss, grads = jax.value_and_grad(loss_fn)(head_params)
            updates, opt_state = self.tx.update(grads, opt_state, head_params)
            return optax.apply_updates(head_params, updates), opt_state, loss

        @jax.jit
        def predict(head_params, latents):
            return jax.nn.sigmoid(head.apply({"params": head_params}, latents))

        self._latents_fn = latents_fn
        self._train_step = train_step
        self._predict = predict

    def image_latents(self, video) -> jnp.ndarray:
        return self._latents_fn(self.clip_params, jnp.asarray(video))

    def fit_batch(self, video, labels) -> float:
        latents = self.image_latents(video)
        self._rng, drop = jax.random.split(self._rng)
        self.head_params, self.opt_state, loss = self._train_step(
            self.head_params, self.opt_state, latents, jnp.asarray(labels),
            drop,
        )
        self.step += 1
        return float(loss)

    def predict(self, video) -> np.ndarray:
        return np.asarray(
            self._predict(self.head_params, self.image_latents(video))
        )

    def save(self, path: str) -> None:
        """Persist the probe head (flax msgpack).  The reference saves the
        whole ImageLatentsClassifier state dict (ct_lipro_inference.py:38-42)
        — the frozen backbone here is whatever checkpoint was loaded, so
        only the head needs saving."""
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.head_params))

    def load(self, path: str) -> None:
        from flax import serialization

        with open(path, "rb") as f:
            self.head_params = serialization.from_bytes(
                self.head_params, f.read()
            )

    def infer(
        self,
        dataset,
        *,
        results_folder: Optional[str] = None,
        limit: Optional[int] = None,
        batch_size: int = 4,
        num_workers: int = 4,
    ) -> dict:
        """evaluate_model semantics (ct_lipro_inference.py:44-92): sigmoid
        probe probabilities per volume over an inference dataset, per-label
        AUROC, and the reference artifact set (predicted/labels npz,
        accessions.txt, AUROC table) — batched through the same pipelined
        engine loop the zero-shot classifier uses."""
        from vit_exp_tpu.eval.metrics import evaluate_internal
        from vit_exp_tpu.eval.zero_shot import PATHOLOGIES, _one_deep_map

        c = self.head.num_classes
        n = min(len(dataset), limit) if limit else len(dataset)
        preds, labels, accessions = [], [], []

        def dispatch(padded, k, batch):
            probs = self._predict(
                self.head_params,
                self._latents_fn(self.clip_params, padded["image"]),
            )
            return probs, k, batch["onehot"], batch["accession"]

        for dev, k, onehots, accs in _one_deep_map(
                dataset, n, batch_size, dispatch, num_workers=num_workers):
            preds.extend(np.asarray(dev)[:k])
            labels.extend(np.asarray(onehots)[:k, :c])
            accessions.extend(accs[:k])

        y_pred = np.asarray(preds)
        y_true = np.asarray(labels)
        res = evaluate_internal(y_pred, y_true, list(PATHOLOGIES[:c]))

        if results_folder:
            from vit_exp_tpu.eval.metrics import save_inference_artifacts

            save_inference_artifacts(results_folder, y_pred, y_true,
                                     accessions, res)
        return res
