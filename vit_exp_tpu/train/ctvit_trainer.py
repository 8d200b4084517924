"""CTViT VQGAN-VAE trainer — transformer_maskgit/ctvit_trainer.py:109-415.

Capability parity:
- EMA copy of the generator (ema-pytorch equivalent, ctvit_trainer.py:160);
- separate discriminator optimizer at lr×0.01 (ctvit_trainer.py:160);
- 3×generator-step : 1×discriminator-step schedule (305-347);
- losses: recon MSE + perceptual + commit + ADAPTIVE-weighted adversarial
  hinge (λ = ‖∂perc/∂W_pixels‖/‖∂gen/∂W_pixels‖ clamped 1e4,
  ctvit.py:505-519); discriminator hinge + the reference's WGAN-style
  gradient penalty on real frames every apply_grad_penalty_every steps
  (ctvit.py:60-73, 464-466; models/gan.py), with SHARED frame indices for
  real/fake picks (ctvit.py:443-445); VGG perceptual defaults ON via
  models/vgg.py (converted
  torchvision weights when supplied, seeded random features otherwise —
  the reference ctor defaults vgg=None and has no default either);
- periodic reconstruction sampling for inspection (360-398) — saved as npz
  volumes (NIfTI export via data/nifti is write-free here; npz is the
  pipeline's working format).

Also MaskGITTrainer: masked-token CE over (CTViT-frozen) indices — the
TransformerTrainer of train_transformer.py:93-352.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_exp_tpu.models.ctvit import CTViT
from vit_exp_tpu.models.gan import (
    SliceDiscriminator,
    adaptive_gen_weight,
    gradient_penalty,
    hinge_discr_loss,
    hinge_gen_loss,
)


def ema_update(ema_params, params, decay: float = 0.995):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )


class CTViTTrainer:
    def __init__(
        self,
        model: CTViT,
        *,
        lr: float = 1e-4,
        wd: float = 0.0,
        discr_lr_mult: float = 0.01,
        gen_steps_per_discr: int = 3,
        apply_grad_penalty_every: int = 4,
        adversarial_weight: float = 1.0,
        commit_weight: float = 1.0,
        perceptual_fn: Optional[Callable] = None,
        use_perceptual: bool = True,
        perceptual_weight: float = 1.0,
        vgg_params=None,
        results_folder: str = "./results_ctvit",
        sample_every: int = 1000,
        save_every: int = 0,
        seed: int = 0,
    ):
        self.model = model
        self.discr = SliceDiscriminator()
        if perceptual_fn is None and use_perceptual:
            # runnable default (the reference ctor defaults vgg=None and
            # would crash at ctvit.py:499 without an injected torchvision
            # vgg16): flax VGG16 features, pretrained when vgg_params is
            # supplied (models/vgg.py::convert_torchvision_vgg16), seeded
            # random features otherwise — random-convnet perceptual
            # distances are a standard stand-in and keep the loss term live
            from vit_exp_tpu.models.vgg import (
                make_perceptual_fn,
                random_vgg16_params,
            )

            if vgg_params is None:
                vgg_params = random_vgg16_params(jax.random.PRNGKey(seed))
            perceptual_fn = make_perceptual_fn(vgg_params)
        self.perceptual_fn = perceptual_fn
        self.gen_steps_per_discr = gen_steps_per_discr
        self.apply_grad_penalty_every = apply_grad_penalty_every
        self.sample_every = sample_every
        self.save_every = save_every
        self.results_folder = results_folder
        os.makedirs(results_folder, exist_ok=True)

        rng = jax.random.PRNGKey(seed)
        t = 1 + 2 * model.temporal_patch_size
        video = jnp.zeros((1, model.channels, t, model.image_size,
                           model.image_size))
        variables = model.init(rng, video, return_encoded_tokens=False,
                               return_recons=True)
        self.params = variables["params"]
        self.codebook = variables.get("codebook", {})
        self.ema_params = self.params
        frame = jnp.zeros((1, model.channels, model.image_size,
                           model.image_size))
        self.discr_params = self.discr.init(rng, frame)["params"]

        from vit_exp_tpu.train.optimizer import weight_decay_mask

        self.gen_tx = (optax.adamw(lr, b1=0.9, b2=0.99, weight_decay=wd,
                                   mask=weight_decay_mask)
                       if wd > 0 else optax.adam(lr, b1=0.9, b2=0.99))
        self.discr_tx = optax.adam(lr * discr_lr_mult, b1=0.9, b2=0.99)
        self.gen_opt = self.gen_tx.init(self.params)
        self.discr_opt = self.discr_tx.init(self.discr_params)
        self.step = 0
        self._rng = rng

        mdl, discr = model, self.discr
        perc_fn = self.perceptual_fn

        @jax.jit
        def gen_step(params, codebook, discr_params, gen_opt, video, rng):
            def loss_fn(p):
                vars_ = {"params": p, "codebook": codebook}
                tokens = mdl.apply(vars_, video,
                                   method=CTViT.tokens_from_video)
                enc = mdl.apply(vars_, tokens, method=CTViT.encode_tokens)
                (quant, _, commit), new_vars = mdl.apply(
                    vars_, enc, update_codebook=True, mutable=["codebook"],
                    method=CTViT.quantize,
                )
                trunk = mdl.apply(vars_, quant, method=CTViT.decode_trunk)
                recon = mdl.apply(vars_, trunk,
                                  method=CTViT.pixels_from_trunk)
                recon_loss = jnp.mean(
                    (recon.astype(jnp.float32) - video.astype(jnp.float32))
                    ** 2
                )
                # SAME frame indices for recon and input (ctvit.py:482-484)
                b, _, t = video.shape[:3]
                idx = jax.random.randint(rng, (b,), 0, t)
                pick = jax.vmap(lambda v, i: v[:, i])
                frames = pick(recon, idx)
                real_frames = pick(video, idx)
                gen_loss = hinge_gen_loss(
                    discr.apply({"params": discr_params}, frames))
                perceptual = jnp.float32(0.0)
                adaptive = jnp.float32(1.0)
                if perc_fn is not None:
                    perceptual = perc_fn(frames, real_frames)
                    # adaptive weight (ctvit.py:505-513): λ =
                    # ‖∂perc/∂W_pixels‖ / ‖∂gen/∂W_pixels‖ clamped to 1e4,
                    # differentiating the pixels head ONLY (last_dec_layer
                    # = to_pixels[0].weight) — cheap: one linear + frame
                    # pick + discr/vgg per grad, not the whole model
                    w0 = p["to_pixels"]["kernel"]
                    if hasattr(w0, "unbox"):  # flax logical-axis metadata
                        w0 = w0.unbox()

                    def frames_of(w):
                        pw = dict(p, to_pixels=dict(p["to_pixels"],
                                                    kernel=w))
                        r = mdl.apply({"params": pw, "codebook": codebook},
                                      trunk, method=CTViT.pixels_from_trunk)
                        return pick(r, idx)

                    def gen_of(w):
                        return hinge_gen_loss(discr.apply(
                            {"params": discr_params}, frames_of(w)))

                    def perc_of(w):
                        return perc_fn(frames_of(w), real_frames)

                    def norm(g):
                        return jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))

                    adaptive = jax.lax.stop_gradient(adaptive_gen_weight(
                        norm(jax.grad(perc_of)(w0)),
                        norm(jax.grad(gen_of)(w0)),
                    ))
                total = (recon_loss + commit_weight * commit
                         + perceptual_weight * perceptual
                         + adversarial_weight * adaptive * gen_loss)
                aux = {"recon_loss": recon_loss, "commit_loss": commit,
                       "gen_loss": gen_loss, "perceptual_loss": perceptual,
                       "adaptive_weight": adaptive,
                       "codebook": new_vars["codebook"]}
                return total, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, gen_opt = self.gen_tx.update(grads, gen_opt, params)
            params = optax.apply_updates(params, updates)
            metrics = {k: v for k, v in aux.items() if k != "codebook"}
            metrics["loss"] = loss
            return params, aux["codebook"], gen_opt, metrics

        @jax.jit
        def discr_step(params, codebook, discr_params, discr_opt, video,
                       rng, gp_mult):
            (recon, _, _) = mdl.apply(
                {"params": params, "codebook": codebook}, video,
                return_encoded_tokens=False, return_recons=True,
            )
            recon = jax.lax.stop_gradient(recon)
            # SAME frame indices for real and fake (ctvit.py:443-445 applies
            # one frame_indices tensor to both) — unpaired frames would let
            # the discriminator key on content instead of recon quality
            b, _, t = video.shape[:3]
            idx = jax.random.randint(rng, (b,), 0, t)
            pick = jax.vmap(lambda v, i: v[:, i])
            fake = pick(recon, idx)
            real = pick(video, idx)

            def loss_fn(dp):
                fake_logits = discr.apply({"params": dp}, fake)
                real_logits = discr.apply({"params": dp}, real)
                loss = hinge_discr_loss(fake_logits, real_logits)
                # WGAN-GP on real frames every apply_grad_penalty_every
                # steps (ctvit.py:464-466, ctvit_trainer.py:296); gp_mult
                # is the traced 0/1 cadence gate
                gp = gradient_penalty(
                    lambda pp, imgs: discr.apply({"params": pp}, imgs),
                    dp, real,
                )
                return loss + gp_mult * gp, loss

            (_, loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                discr_params)
            updates, discr_opt = self.discr_tx.update(grads, discr_opt,
                                                      discr_params)
            return optax.apply_updates(discr_params, updates), discr_opt, loss

        self._gen_step = gen_step
        self._discr_step = discr_step

    def train_step(self, video: np.ndarray) -> Dict[str, float]:
        video = jnp.asarray(video)
        self._rng, r1, r2 = jax.random.split(self._rng, 3)
        logs: Dict[str, float] = {}
        self.params, self.codebook, self.gen_opt, metrics = self._gen_step(
            self.params, self.codebook, self.discr_params, self.gen_opt,
            video, r1,
        )
        logs.update({k: float(v) for k, v in metrics.items()})
        if (self.step + 1) % self.gen_steps_per_discr == 0:
            gp_on = (self.apply_grad_penalty_every > 0
                     and self.step % self.apply_grad_penalty_every == 0)
            self.discr_params, self.discr_opt, dloss = self._discr_step(
                self.params, self.codebook, self.discr_params,
                self.discr_opt, video, r2, jnp.float32(1.0 if gp_on else 0.0),
            )
            logs["discr_loss"] = float(dloss)
        self.ema_params = ema_update(self.ema_params, self.params)
        self.step += 1
        if self.save_every and self.step % self.save_every == 0:
            self.save()
        if self.sample_every and self.step % self.sample_every == 0:
            recon, _, _ = self.model.apply(
                {"params": self.ema_params, "codebook": self.codebook},
                video[:1], return_encoded_tokens=False, return_recons=True,
            )
            np.savez(
                os.path.join(self.results_folder, f"recon_{self.step}.npz"),
                np.asarray(recon[0, 0]),
            )
        return logs

    def save(self, step: Optional[int] = None):
        """Inference checkpoint {params: EMA weights, codebook} under
        results_folder/checkpoints/ckpt_{step} — exactly what
        cli/run_ctvit_recon.py restores (the reference samples with the
        EMA copy, ctvit_trainer.py:360-398)."""
        from vit_exp_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(
            os.path.join(self.results_folder, "checkpoints"))
        mgr.save(step if step is not None else self.step,
                 {"params": self.ema_params, "codebook": self.codebook},
                 wait=True)


class MaskGITTrainer:
    """Masked-token CE trainer over frozen-CTViT indices
    (train_transformer.py:93-352)."""

    def __init__(self, pipeline, *, lr: float = 3e-4, seed: int = 0):
        from vit_exp_tpu.models.maskgit import (
            maskgit_loss,
            maskgit_train_masking,
        )
        from vit_exp_tpu.models.ctvit import CTViT

        self.pipeline = pipeline
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(pipeline.maskgit_vars["params"])
        self._rng = jax.random.PRNGKey(seed)
        self.step = 0

        mg = pipeline.maskgit
        ctvit = pipeline.ctvit
        ctvit_vars = pipeline.ctvit_vars
        text_encode = pipeline.text_encode

        @jax.jit
        def train_step(mg_params, opt_state, video, text_ids, text_mask, rng):
            tokens = ctvit.apply(ctvit_vars, video,
                                 return_encoded_tokens=True)
            _, indices, _ = ctvit.apply(ctvit_vars, tokens,
                                        method=CTViT.quantize)
            flat = jax.lax.stop_gradient(
                indices.reshape(indices.shape[0], -1)
            )
            masked, mask = maskgit_train_masking(rng, flat, mg.mask_id)
            context = text_encode(text_ids, text_mask)

            def loss_fn(p):
                logits = mg.apply({"params": p}, masked, context=context,
                                  context_mask=text_mask)
                return maskgit_loss(logits, flat, mask)

            loss, grads = jax.value_and_grad(loss_fn)(mg_params)
            updates, opt_state = self.tx.update(grads, opt_state, mg_params)
            return optax.apply_updates(mg_params, updates), opt_state, loss

        self._train_step = train_step

    def fit_batch(self, video, text_ids, text_mask) -> float:
        self._rng, sub = jax.random.split(self._rng)
        params = self.pipeline.maskgit_vars["params"]
        params, self.opt_state, loss = self._train_step(
            params, self.opt_state, jnp.asarray(video),
            jnp.asarray(text_ids), jnp.asarray(text_mask), sub,
        )
        self.pipeline.maskgit_vars = {"params": params}
        self.step += 1
        return float(loss)

    def save(self, directory: str, step: Optional[int] = None):
        """MaskGit weights under {directory}/ckpt_{step} — the CTViT it
        rides is frozen and checkpointed by its own trainer (reference
        train_transformer.py saves the transformer state separately).
        cli/run_maskgit_sample.py restores this."""
        from vit_exp_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(directory)
        mgr.save(step if step is not None else self.step,
                 {"params": self.pipeline.maskgit_vars["params"]},
                 wait=True)
