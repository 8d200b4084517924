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
