"""Loss parity vs torch oracles (formalizes demo_tests/test_loss_type.py and
test_tversky_loss.py methodology: fixed tensors, two implementations)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vit_exp_tpu.models import losses


def _latents(b=6, d=8, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((b, d)).astype(np.float32)
    i = rng.standard_normal((b, d)).astype(np.float32)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    i /= np.linalg.norm(i, axis=-1, keepdims=True)
    return t, i


def _torch_infonce(t, i, temp, bs_local, decoupled=False):
    """Literal exp/log form of ct_clip.py:1347-1382 (the reference math)."""
    t, i = torch.tensor(t), torch.tensor(i)
    t2i = torch.einsum("td,id->ti", t, i) * torch.tensor(temp).exp()
    i2t = t2i.T
    t2i_exp, i2t_exp = t2i.exp(), i2t.exp()
    pos_t2i, pos_i2t = t2i_exp.diagonal(), i2t_exp.diagonal()
    if decoupled:
        mask = torch.eye(t.shape[0], dtype=torch.bool)
        t2i_exp = t2i_exp.masked_fill(mask, 0.0)
        i2t_exp = i2t_exp.masked_fill(mask, 0.0)
    loss_t2i = (-pos_t2i.log() + t2i_exp.sum(-1).log()).mean()
    loss_i2t = (-pos_i2t.log() + i2t_exp.sum(-1).log()).mean()
    return float((loss_t2i + loss_i2t) / 2 / bs_local)


def test_infonce_matches_reference_form():
    t, i = _latents()
    temp = 0.3
    ours = float(
        losses.infonce_loss(jnp.asarray(t), jnp.asarray(i), jnp.asarray(temp))
    )
    assert abs(ours - _torch_infonce(t, i, temp, bs_local=6)) < 1e-5


def test_infonce_local_batch_quirk():
    """Global batch 6, 2 'devices' → divide by local bs 3 (ct_clip.py:1379)."""
    t, i = _latents(seed=1)
    ours = float(
        losses.infonce_loss(
            jnp.asarray(t), jnp.asarray(i), jnp.asarray(0.0), local_batch_size=3
        )
    )
    assert abs(ours - _torch_infonce(t, i, 0.0, bs_local=3)) < 1e-5


def test_infonce_decoupled():
    t, i = _latents(seed=2)
    ours = float(
        losses.infonce_loss(
            jnp.asarray(t), jnp.asarray(i), jnp.asarray(0.1), decoupled=True
        )
    )
    assert abs(ours - _torch_infonce(t, i, 0.1, bs_local=6, decoupled=True)) < 1e-5


def test_seg_bce_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 3, 4, 4, 4)).astype(np.float32)
    mask = (rng.random((2, 3, 4, 4, 4)) > 0.5).astype(np.float32)
    ours = float(losses.seg_bce_loss(jnp.asarray(logits), jnp.asarray(mask)))
    ref = float(
        torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(mask))
    )
    assert abs(ours - ref) < 1e-6


def test_dice_scores_match_torch():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((2, 3, 4, 4, 4)).astype(np.float32)
    mask = (rng.random((2, 3, 4, 4, 4)) > 0.3).astype(np.float32)
    ours = np.asarray(losses.dice_scores(jnp.asarray(logits), jnp.asarray(mask)))
    p = (torch.sigmoid(torch.tensor(logits)) > 0.5).float()
    g = torch.tensor(mask)
    inter = (p * g).sum(dim=(2, 3, 4))
    union = p.sum(dim=(2, 3, 4)) + g.sum(dim=(2, 3, 4))
    ref = (2 * inter / union).mean(dim=0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _open_seg_inputs(B=2, L=12, C=3, h=5, seed=5):
    rng = np.random.default_rng(seed)
    preds = rng.standard_normal((B, L, h)).astype(np.float32)
    mask = (rng.random((B, L, C)) > 0.6).astype(np.float32)
    prompts = rng.standard_normal((B, C, h)).astype(np.float32)
    return preds, mask, prompts


def _torch_sim01(preds, prompts):
    return (
        F.cosine_similarity(
            torch.tensor(preds).unsqueeze(2), torch.tensor(prompts).unsqueeze(1),
            dim=-1,
        )
        + 1
    ) / 2


def test_cos_sim_l2_matches_torch():
    preds, mask, prompts = _open_seg_inputs()
    ours = float(
        losses.open_seg_loss(
            jnp.asarray(preds), jnp.asarray(mask), jnp.asarray(prompts),
            loss_type="cos_sim_l2",
        )
    )
    # reference: per-class loop of F.mse_loss against each mask channel
    ref = 0.0
    for c in range(mask.shape[-1]):
        sim_c = (
            F.cosine_similarity(
                torch.tensor(preds),
                torch.tensor(prompts)[:, c, :].unsqueeze(1),
                dim=-1,
            )
            + 1
        ) / 2
        ref += float(F.mse_loss(sim_c, torch.tensor(mask)[:, :, c]))
    assert abs(ours - ref) < 1e-6


def test_clip_loss_matches_torch():
    preds, mask, prompts = _open_seg_inputs(seed=6)
    temp = 0.1
    ours = float(
        losses.open_seg_loss(
            jnp.asarray(preds), jnp.asarray(mask), jnp.asarray(prompts),
            loss_type="clip_loss", hyper={"temp": temp},
        )
    )
    logits = torch.einsum(
        "bld,bcd->blc", torch.tensor(preds), torch.tensor(prompts)
    ) / temp
    C = mask.shape[-1]
    ref = float(
        F.cross_entropy(logits.reshape(-1, C), torch.tensor(mask).reshape(-1, C))
    )
    assert abs(ours - ref) < 1e-5


def test_clip_bce_matches_torch():
    preds, mask, prompts = _open_seg_inputs(seed=7)
    ours = float(
        losses.open_seg_loss(
            jnp.asarray(preds), jnp.asarray(mask), jnp.asarray(prompts),
            loss_type="clip_bce_loss",
        )
    )
    sim = _torch_sim01(preds, prompts)
    C = mask.shape[-1]
    ref = float(
        torch.nn.BCELoss()(sim.reshape(-1, C), torch.tensor(mask).reshape(-1, C))
    )
    assert abs(ours - ref) < 1e-5


def test_weighted_bce_matches_torch():
    preds, mask, prompts = _open_seg_inputs(seed=8)
    ours, class_loss = losses.open_seg_loss(
        jnp.asarray(preds), jnp.asarray(mask), jnp.asarray(prompts),
        loss_type="weighted_bce_loss", return_class_loss=True,
    )
    sim = _torch_sim01(preds, prompts)
    C = mask.shape[-1]
    sim = sim.reshape(-1, C)
    tf = torch.tensor(mask).reshape(-1, C)
    pos, neg = tf == 1, tf == 0
    n_pos = pos.sum(0) + 1e-6
    n_neg = neg.sum(0) + 1e-6
    n_tot = n_pos + n_neg
    w = (n_tot / (2 * n_pos)) * pos + (n_tot / (2 * n_neg)) * neg
    per = torch.nn.BCELoss(reduction="none")(sim, tf) * w
    assert abs(float(ours) - float(per.mean())) < 1e-5
    np.testing.assert_allclose(
        np.asarray(class_loss), per.mean(dim=0).numpy(), atol=1e-5
    )


def test_clip_focal_matches_torch():
    preds, mask, prompts = _open_seg_inputs(seed=9)
    gamma, alpha = 2, 0.25
    ours = float(
        losses.open_seg_loss(
            jnp.asarray(preds), jnp.asarray(mask), jnp.asarray(prompts),
            loss_type="clip_focal_loss", hyper={"gamma": gamma, "alpha": alpha},
        )
    )
    sim = _torch_sim01(preds, prompts)
    C = mask.shape[-1]
    p = sim.reshape(-1, C)
    t = torch.tensor(mask).reshape(-1, C)
    bce = torch.nn.BCELoss(reduction="none")(p, t)
    p_t = p * t + (1 - p) * (1 - t)
    loss = bce * ((1 - p_t) ** gamma)
    loss = (alpha * t + (1 - alpha) * (1 - t)) * loss
    assert abs(ours - float(loss.mean())) < 1e-5


def test_tversky_alpha_beta_half_equals_dice():
    """demo_tests/test_tversky_loss.py methodology: α=β=0.5 ≡ 1 - dice."""
    preds, mask, prompts = _open_seg_inputs(seed=10)
    ours = float(
        losses.open_seg_loss(
            jnp.asarray(preds), jnp.asarray(mask), jnp.asarray(prompts),
            loss_type="tversky_loss",
            hyper={"alpha": 0.5, "beta": 0.5, "gamma": 1.0, "smooth": 0.0},
        )
    )
    sim = _torch_sim01(preds, prompts).permute(0, 2, 1)
    t = torch.tensor(mask).permute(0, 2, 1)
    inter = (sim * t).sum()
    dice = 2 * inter / (sim.sum() + t.sum())
    assert abs(ours - float(1 - dice)) < 1e-5


def test_fusion_focal_runs():
    preds, mask, prompts = _open_seg_inputs(seed=11)

    def fusion(x):  # stand-in fusion head: sum to one logit
        return jnp.sum(x, axis=-1, keepdims=True)

    loss = losses.open_seg_loss(
        jnp.asarray(preds), jnp.asarray(mask), jnp.asarray(prompts),
        loss_type="fusion_focal_loss", fusion_head_apply=fusion,
    )
    assert np.isfinite(float(loss))


def test_choose_cls_subsets():
    preds, mask, prompts = _open_seg_inputs(seed=12)
    full = losses.open_seg_loss(
        jnp.asarray(preds), jnp.asarray(mask[:, :, :2]),
        jnp.asarray(prompts[:, :2]), loss_type="clip_bce_loss",
    )
    subset = losses.open_seg_loss(
        jnp.asarray(preds), jnp.asarray(mask), jnp.asarray(prompts),
        loss_type="clip_bce_loss", hyper={"choose_cls": [0, 1]},
    )
    assert abs(float(full) - float(subset)) < 1e-6


def test_decoupled_contrastive_learning_wired_end_to_end():
    """VERDICT r3 item 4: the `decoupled_contrastive_learning` config flag
    reaches the jitted imagereport step (ct_clip.py:497,639 ctor flag,
    applied at ct_clip.py:1366-1368).  Same params + batch, flag flipped →
    the contrastive loss changes by exactly the diagonal's removal from the
    denominator (checked against infonce_loss called directly)."""
    import jax
    import flax.linen as nn

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.core.precision import FP32_POLICY
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.train.optimizer import build_optimizer
    from vit_exp_tpu.train.steps import create_train_state, make_train_steps

    arch = {
        "dim": 24, "image_size": 8, "patch_size": 4,
        "temporal_size": 8, "temporal_patch_size": 4,
        "transformer_blocks": 1, "dim_head": 4, "heads": 2,
    }
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((3, 1, 8, 8, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, 100, (3, 12)), jnp.int32)
    batch = {"image": video, "input_ids": ids,
             "attention_mask": jnp.ones_like(ids)}
    bc = BertConfig.tiny()

    vals = {}
    for decoupled in (False, True):
        config = ExperimentConfig.from_dict({
            "trainer": {"lr": 1e-3, "max_grad_norm": 1.0},
            "arch": arch,
            "ct_clip_arch": {
                "decoupled_contrastive_learning": decoupled},
        })
        assert (config.ct_clip_arch.decoupled_contrastive_learning
                is decoupled)
        model = build_ctclip(config, bert_config=bc, policy=FP32_POLICY,
                             dim_latent=16)
        params = nn.unbox(
            model.init(jax.random.PRNGKey(0), video, ids,
                       batch["attention_mask"])
        )["params"]
        # direct-oracle BEFORE the step — the jitted step donates the state
        # (params included), deleting these buffers
        out = model.apply({"params": params}, video, ids,
                          batch["attention_mask"])
        direct = float(losses.infonce_loss(
            out["text_latents"], out["image_latents"], out["temperature"],
            decoupled=decoupled))
        tx = build_optimizer(config.trainer)
        steps = make_train_steps(model, tx, config)
        _, metrics = steps["imagereport"](
            create_train_state(params, tx), batch, 1.0)
        vals[decoupled] = float(metrics["cl_loss"])
        assert abs(vals[decoupled] - direct) < 1e-5

    # DCL removes the positive from the denominator → strictly smaller loss
    assert vals[True] < vals[False] - 1e-4
