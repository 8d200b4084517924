"""Torch-oracle differentials for the VQGAN adversarial primitives.

Each function in vit_exp_tpu/models/gan.py is checked numerically against
the reference formulas it cites (transformer_maskgit/ctvit.py:60-116,
494-517): hinge/bce discriminator+generator losses (the bce pair in the
reference's raw -log(sigmoid) form), the WGAN-R1 gradient penalty via a
torch-autograd oracle on a shared analytic discriminator, the adaptive
generator-loss weight (safe_div + clamp(max=1e4)), and pick_random_frames'
gather semantics (ctvit.py:108-116).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vit_exp_tpu.models.gan import (
    adaptive_gen_weight,
    bce_discr_loss,
    bce_gen_loss,
    gradient_penalty,
    hinge_discr_loss,
    hinge_gen_loss,
    pick_random_frames,
)


@pytest.fixture
def logits():
    rng = np.random.default_rng(0)
    fake = rng.standard_normal((4, 7)).astype(np.float32) * 3.0
    real = rng.standard_normal((4, 7)).astype(np.float32) * 3.0
    return fake, real


def test_hinge_losses_match_reference(logits):
    fake, real = logits
    tf, tr = torch.from_numpy(fake), torch.from_numpy(real)
    # ctvit.py:86-90
    ref_d = (torch.relu(1 + tf) + torch.relu(1 - tr)).mean().item()
    ref_g = (-tf.mean()).item()
    np.testing.assert_allclose(float(hinge_discr_loss(fake, real)), ref_d,
                               rtol=1e-6)
    np.testing.assert_allclose(float(hinge_gen_loss(fake)), ref_g, rtol=1e-6)


def test_bce_losses_match_reference_log_sigmoid_form(logits):
    fake, real = logits
    tf, tr = torch.from_numpy(fake), torch.from_numpy(real)
    # ctvit.py:92-96 — the reference computes the raw (overflow-prone)
    # -log(1-sigmoid(fake)) - log(sigmoid(real)); ours is the softplus
    # identity, so at moderate logits they must agree exactly
    ref_d = (-torch.log(1 - torch.sigmoid(tf))
             - torch.log(torch.sigmoid(tr))).mean().item()
    ref_g = (-torch.log(torch.sigmoid(tf))).mean().item()
    np.testing.assert_allclose(float(bce_discr_loss(fake, real)), ref_d,
                               rtol=1e-5)
    np.testing.assert_allclose(float(bce_gen_loss(fake)), ref_g, rtol=1e-5)


def test_bce_losses_stable_where_reference_overflows():
    # at logit 100 the reference form yields -log(0) = inf; the softplus
    # identity gives the exact finite limit (softplus(100) == 100)
    fake = np.full((2, 2), 100.0, np.float32)
    real = np.full((2, 2), -100.0, np.float32)
    out = float(bce_discr_loss(fake, real))
    assert np.isfinite(out)
    np.testing.assert_allclose(out, 200.0, rtol=1e-6)
    # generator: -log(sigmoid(fake)) overflows at large NEGATIVE logits
    np.testing.assert_allclose(float(bce_gen_loss(-fake)), 100.0, rtol=1e-6)


def test_gradient_penalty_matches_torch_autograd_oracle():
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((3, 1, 5, 5)).astype(np.float32)
    w = rng.standard_normal((1, 1, 5, 5)).astype(np.float32)

    # shared analytic per-sample discriminator: D(x) = sum(sin(x) * w)
    def discr_apply(params, x):
        return jnp.sum(jnp.sin(x) * params, axis=(1, 2, 3))

    ours = float(gradient_penalty(discr_apply, jnp.asarray(w),
                                  jnp.asarray(imgs), weight=10.0))

    # ctvit.py:60-73: torch_grad(outputs=D(x), grad_outputs=ones) on the
    # per-sample outputs == grad of the summed score
    tx = torch.from_numpy(imgs).requires_grad_(True)
    tout = (torch.sin(tx) * torch.from_numpy(w)).sum(dim=(1, 2, 3))
    grads = torch.autograd.grad(tout, tx, torch.ones_like(tout),
                                create_graph=False)[0]
    ref = 10.0 * ((grads.reshape(3, -1).norm(2, dim=1) - 1) ** 2).mean()
    np.testing.assert_allclose(ours, ref.item(), rtol=1e-5)


def test_adaptive_gen_weight_safe_div_and_clamp():
    # ctvit.py:81-82, 515-517: safe_div(a, b) = a / (b + 1e-8), clamp max 1e4
    np.testing.assert_allclose(
        float(adaptive_gen_weight(3.0, 2.0)), 3.0 / (2.0 + 1e-8), rtol=1e-7)
    assert float(adaptive_gen_weight(5.0, 0.0)) == pytest.approx(1e4)
    assert float(adaptive_gen_weight(0.0, 7.0)) == 0.0


def test_pick_random_frames_gathers_one_frame_per_sample():
    rng = np.random.default_rng(2)
    video = rng.standard_normal((4, 2, 6, 3, 3)).astype(np.float32)
    out = np.asarray(pick_random_frames(jnp.asarray(video),
                                        jax.random.PRNGKey(0)))
    assert out.shape == (4, 2, 3, 3)
    # every output must be exactly one of the sample's own frames
    # (ctvit.py:108-116 batch-indexed gather)
    for b in range(4):
        matches = [np.array_equal(out[b], video[b, :, f]) for f in range(6)]
        assert sum(matches) >= 1
