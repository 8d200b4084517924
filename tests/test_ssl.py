"""MLM + visual SSL tests (off-by-default capabilities, SURVEY §2.1)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vit_exp_tpu.models.mlm import mask_subset_with_prob, mlm_corrupt, mlm_loss
from vit_exp_tpu.models.visual_ssl import (
    ProjectionMLP,
    PredictionMLP,
    nt_xent_loss,
    random_augment_3d,
    simsiam_loss,
    simsiam_step,
    simclr_step,
)


def test_mask_subset_respects_validity_and_prob():
    rng = jax.random.PRNGKey(0)
    valid = jnp.asarray(np.tile([True] * 8 + [False] * 4, (5, 1)))
    mask = mask_subset_with_prob(rng, valid, 0.25)
    assert mask.shape == valid.shape
    assert not bool(jnp.any(mask & ~valid))
    np.testing.assert_array_equal(np.asarray(mask.sum(-1)), 2)  # ceil(.25*8)


def test_mlm_corrupt_and_loss():
    rng = jax.random.PRNGKey(1)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(5, 90, (4, 16)), jnp.int32
    )
    corrupted, loss_mask = mlm_corrupt(
        rng, ids, mask_token_id=103, vocab_size=100, pad_id=0,
        special_ids=(101, 102),
    )
    changed = corrupted != ids
    assert bool(jnp.all(changed <= loss_mask))  # only selected positions
    assert int(loss_mask.sum()) > 0
    logits = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 100))
    loss = mlm_loss(logits, ids, loss_mask)
    assert np.isfinite(float(loss))
    # oracle: torch CE over the masked positions
    lm = np.asarray(loss_mask)
    ref = F.cross_entropy(
        torch.tensor(np.asarray(logits)[lm]),
        torch.tensor(np.asarray(ids)[lm]).long(),
    )
    assert abs(float(loss) - float(ref)) < 1e-5


def test_nt_xent_matches_torch_oracle():
    rng = np.random.default_rng(3)
    z1 = rng.standard_normal((6, 8)).astype(np.float32)
    z2 = rng.standard_normal((6, 8)).astype(np.float32)
    temp = 0.1
    ours = float(nt_xent_loss(jnp.asarray(z1), jnp.asarray(z2), temp))
    z = torch.tensor(np.concatenate([z1, z2]))
    z = F.normalize(z, dim=-1)
    sim = (z @ z.T) / temp
    sim.fill_diagonal_(float("-inf"))
    targets = torch.tensor(
        list(range(6, 12)) + list(range(6))
    )
    ref = float(F.cross_entropy(sim, targets))
    assert abs(ours - ref) < 1e-5


def test_simsiam_components():
    rng = np.random.default_rng(4)
    p1, z1 = rng.standard_normal((3, 8)), rng.standard_normal((3, 8))
    p2, z2 = rng.standard_normal((3, 8)), rng.standard_normal((3, 8))
    loss = float(simsiam_loss(*(jnp.asarray(x) for x in (p1, z1, p2, z2))))
    assert -1.0 <= loss <= 1.0

    video = jnp.asarray(rng.uniform(0, 1, (2, 1, 4, 6, 6)), jnp.float32)
    aug = random_augment_3d(jax.random.PRNGKey(0), video)
    assert aug.shape == video.shape

    proj = ProjectionMLP(hidden=16, out=8)
    pred = PredictionMLP(hidden=8, out=8)
    pvars = proj.init(jax.random.PRNGKey(1), jnp.zeros((1, 10)))
    dvars = pred.init(jax.random.PRNGKey(2), jnp.zeros((1, 8)))

    def encode(v):
        return v.reshape(v.shape[0], -1)[:, :10]

    loss = simsiam_step(
        jax.random.PRNGKey(3), encode,
        lambda x: proj.apply(pvars, x), lambda x: pred.apply(dvars, x),
        video,
    )
    assert np.isfinite(float(loss))
    loss2 = simclr_step(
        jax.random.PRNGKey(4), encode, lambda x: proj.apply(pvars, x), video
    )
    assert np.isfinite(float(loss2))


def test_mlm_ssl_wired_into_train_step():
    """use_mlm + use_visual_ssl reach the jitted imagereport step end to end
    (VERDICT item 7): extra loss terms appear in metrics, grads flow into
    the SSL heads, and the reference weight-combine applies
    (ct_clip.py:1761-1765)."""
    import flax.linen as nn

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.core.precision import FP32_POLICY
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.ctclip import CTCLIP
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.train.optimizer import build_optimizer
    from vit_exp_tpu.train.steps import create_train_state, make_train_steps

    for ssl_type in ("simsiam", "simclr"):
        config = ExperimentConfig.from_dict(
            {
                "trainer": {"lr": 1e-3, "max_grad_norm": 1.0},
                "arch": {
                    "dim": 24, "image_size": 8, "patch_size": 4,
                    "temporal_size": 8, "temporal_patch_size": 4,
                    "transformer_blocks": 1, "dim_head": 4, "heads": 2,
                },
                "ct_clip_arch": {
                    "use_mlm": True,
                    "use_visual_ssl": True,
                    "visual_ssl_type": ssl_type,
                    "mlm_mask_token_id": 3,
                },
            }
        )
        bc = BertConfig.tiny()
        model = build_ctclip(config, bert_config=bc, policy=FP32_POLICY,
                             dim_latent=16)
        video = jnp.ones((2, 1, 8, 8, 8), jnp.float32)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(4, bc.vocab_size, (2, 12)),
            jnp.int32,
        )
        params = nn.unbox(
            model.init(jax.random.PRNGKey(0), video, ids,
                       method=CTCLIP.init_all)
        )["params"]
        assert "mlm_head" in params and "ssl_projector" in params
        if ssl_type == "simsiam":
            assert "ssl_predictor" in params

        tx = build_optimizer(config.trainer)
        state = create_train_state(params, tx)
        # snapshot before the step call — the jitted step donates `state`
        kernel_before = np.asarray(state.params["mlm_head"]["kernel"]).copy()
        steps = make_train_steps(model, tx, config)
        batch = {
            "image": video,
            "input_ids": ids,
            "attention_mask": jnp.ones_like(ids),
        }
        new_state, metrics = steps["imagereport"](state, batch, 1.0)
        assert "text_ssl_loss" in metrics and "image_ssl_loss" in metrics
        total = float(metrics["loss"])
        expect = (0.9 * float(metrics["cl_loss"])
                  + 0.05 * float(metrics["text_ssl_loss"])
                  + 0.05 * float(metrics["image_ssl_loss"]))
        np.testing.assert_allclose(total, expect, rtol=1e-5)
        # SSL head params actually updated (grads flowed)
        moved = np.abs(
            np.asarray(new_state.params["mlm_head"]["kernel"])
            - kernel_before
        ).max()
        assert moved > 0
