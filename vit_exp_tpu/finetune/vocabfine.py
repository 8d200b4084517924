"""CT-VocabFine — end-to-end prompt-pair fine-tuning of CTCLIP.

Capability parity with scripts/ct_vocabfine_train.py:22-170: per volume, for
each pathology a (correct, incorrect) prompt pair is built from the label
("{p} is present." vs "{p} is not present.", swapped when the label is 0);
the pair of CLIP scores is softmaxed and regressed to [1, 0] with MSE;
AdamW + cosine LR with warmup; the reference accumulates over 3 chunks of 6
pathologies per optimizer step.

TPU-native: all 18 pathology pairs are batched into ONE jitted step — 36
text encodes + 1 volume encode per step instead of 18 sequential python
calls — and the chunking disappears (it only existed to fit GPU memory).
The prompt-pair swap is label-dependent, so both orderings are pre-tokenized
and selected on-device with jnp.where (static shapes under jit).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_exp_tpu.eval.zero_shot import PATHOLOGIES
from vit_exp_tpu.models.ctclip import CTCLIP


class VocabFineTrainer:
    def __init__(
        self,
        model: CTCLIP,
        params,
        tokenizer,
        *,
        pathologies: Optional[List[str]] = None,
        lr: float = 5e-6,
        wd: float = 0.01,
        warmup_steps: int = 100,
        total_steps: int = 10_000,
        max_text_len: int = 512,
    ):
        self.model = model
        self.pathologies = list(pathologies or PATHOLOGIES)
        c = len(self.pathologies)

        present, absent = [], []
        for p in self.pathologies:
            present.append(f"{p} is present. ")
            absent.append(f"{p} is not present. ")
        toks_p = tokenizer(present, max_length=max_text_len)
        toks_a = tokenizer(absent, max_length=max_text_len)
        self.ids_present = jnp.asarray(toks_p["input_ids"])       # (C, L)
        self.mask_present = jnp.asarray(toks_p["attention_mask"])
        self.ids_absent = jnp.asarray(toks_a["input_ids"])
        self.mask_absent = jnp.asarray(toks_a["attention_mask"])

        warmup_steps = min(warmup_steps, max(total_steps // 10, 1))
        # optax requires decay_steps > warmup_steps (a 1-step horizon
        # otherwise leaves zero cosine steps)
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1)
        )
        self.tx = optax.adamw(schedule, weight_decay=wd)
        self.params = params
        self.opt_state = self.tx.init(params)
        self.step = 0

        ids_pair = jnp.stack([self.ids_present, self.ids_absent])     # (2,C,L)
        mask_pair = jnp.stack([self.mask_present, self.mask_absent])

        @jax.jit
        def train_step(params, opt_state, video, labels):
            # labels: (C,) — select (correct, incorrect) prompt per class
            lab = labels.astype(bool)[:, None]  # (C, 1) over (C, L) prompts
            ids_yes = jnp.where(lab, ids_pair[0], ids_pair[1])
            ids_no = jnp.where(lab, ids_pair[1], ids_pair[0])
            mask_yes = jnp.where(lab, mask_pair[0], mask_pair[1])
            mask_no = jnp.where(lab, mask_pair[1], mask_pair[0])
            all_ids = jnp.concatenate([ids_yes, ids_no])      # (2C, L)
            all_mask = jnp.concatenate([mask_yes, mask_no])

            def loss_fn(p):
                hidden = model.apply({"params": p}, all_ids, all_mask,
                                     method=CTCLIP.encode_text_hidden)
                txt = model.apply({"params": p}, hidden,
                                  method=CTCLIP.text_latents_from_hidden)
                tokens = model.apply({"params": p}, video,
                                     method=CTCLIP.encode_image_tokens)
                img = model.apply({"params": p}, tokens,
                                  method=CTCLIP.image_latents_from_tokens)
                temp = jnp.exp(p["temperature"])
                scores = (txt @ img[0]) * temp                # (2C,)
                pairs = scores.reshape(2, c).T                # (C, [yes,no])
                probs = jax.nn.softmax(pairs, axis=-1)
                target = jnp.broadcast_to(
                    jnp.asarray([1.0, 0.0]), probs.shape
                )
                return jnp.mean((probs - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = train_step

    def fit_batch(self, video: np.ndarray, labels: np.ndarray) -> float:
        """video: (1, 1, D, H, W); labels: (C,) one-hot pathology labels."""
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(video),
            jnp.asarray(labels),
        )
        self.step += 1
        return float(loss)
