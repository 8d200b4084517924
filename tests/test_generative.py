"""Legacy generative stack tests: VQ, CTViT encode/decode, MaskGIT."""

import numpy as np

import jax
import jax.numpy as jnp

from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.models.ctvit import CTViT, ContinuousPositionBias
from vit_exp_tpu.models.maskgit import (
    MaskGit,
    cosine_schedule,
    maskgit_loss,
    maskgit_sample,
    maskgit_train_masking,
)
from vit_exp_tpu.models.vq import VectorQuantize


def test_vq_roundtrip_and_commit():
    vq = VectorQuantize(dim=8, codebook_size=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8))
    vars_ = vq.init(jax.random.PRNGKey(1), x)
    (q, idx, commit), _ = vq.apply(x=x, variables=vars_, mutable=["codebook"])
    assert q.shape == x.shape
    assert idx.shape == (4, 10)
    assert idx.max() < 16 and float(commit) >= 0
    # quantized vectors are l2-normalized codebook rows
    norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # straight-through: gradient flows to input
    g = jax.grad(
        lambda x: jnp.sum(vq.apply(vars_, x, mutable=["codebook"])[0][0] ** 2)
    )(x)
    assert float(jnp.max(jnp.abs(g))) > 0


def _tiny_ctvit():
    return CTViT(
        dim=16, codebook_size=32, image_size=8, patch_size=4,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=4, heads=2, policy=FP32_POLICY,
    )


def test_ctvit_encode_decode_shapes():
    model = _tiny_ctvit()
    # T = 1 + k*pt: first frame + temporal patches (ctvit.py:163-168)
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 5, 8, 8))
    # init through the full recon path so decoder/vq params materialize
    vars_ = model.init(jax.random.PRNGKey(1), video,
                       return_encoded_tokens=False, return_recons=True)
    tokens = model.apply(vars_, video, return_encoded_tokens=True)
    # t = 1 (first frame) + 2 (4 rest frames / pt 2); h = w = 2
    assert tokens.shape == (2, 3, 2, 2, 16)
    (recon, idx, commit), _ = model.apply(
        vars_, video, return_encoded_tokens=False, return_recons=True,
        mutable=["codebook"],
    )
    assert recon.shape == video.shape
    assert idx.shape == (2, 3, 2, 2)
    assert np.isfinite(float(commit))


def test_ctvit_decode_from_indices():
    model = _tiny_ctvit()
    video = jnp.ones((1, 1, 5, 8, 8))
    vars_ = model.init(jax.random.PRNGKey(0), video,
                       return_encoded_tokens=False, return_recons=True)
    idx = jnp.zeros((1, 3, 2, 2), jnp.int32)
    recon = model.apply(vars_, idx, method=CTViT.decode_from_indices)
    assert recon.shape == (1, 1, 5, 8, 8)


def test_continuous_position_bias_shape():
    cpb = ContinuousPositionBias(dim=8, heads=2)
    vars_ = cpb.init(jax.random.PRNGKey(0), 3, 3)
    bias = cpb.apply(vars_, 3, 3)
    assert bias.shape == (1, 2, 9, 9)


def test_cosine_schedule_endpoints():
    assert abs(float(cosine_schedule(jnp.asarray(0.0))) - 1.0) < 1e-6
    assert abs(float(cosine_schedule(jnp.asarray(1.0)))) < 1e-6


def test_maskgit_train_and_sample():
    mg = MaskGit(num_tokens=32, max_seq_len=12, dim=16, depth=1, heads=2,
                 dim_head=4)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    vars_ = mg.init(jax.random.PRNGKey(2), ids, context=ctx)

    masked, mask = maskgit_train_masking(jax.random.PRNGKey(3), ids,
                                         mg.mask_id)
    assert bool(jnp.all(jnp.where(mask, masked == mg.mask_id,
                                  masked == ids)))
    assert int(mask.sum(axis=-1).min()) >= 1

    logits = mg.apply(vars_, masked, context=ctx)
    assert logits.shape == (2, 12, 32)
    loss = maskgit_loss(logits, ids, mask)
    assert np.isfinite(float(loss))

    # CFG path differs from plain conditional logits
    cfg = mg.forward_with_cond_scale(vars_, masked, context=ctx,
                                     context_mask=None, cond_scale=3.0)
    assert cfg.shape == logits.shape
    assert float(jnp.max(jnp.abs(cfg - logits))) > 1e-6

    out = maskgit_sample(
        mg, vars_, jax.random.PRNGKey(4), batch=2, seq_len=12,
        context=ctx, steps=4, cond_scale=1.5,
    )
    assert out.shape == (2, 12)
    assert int(out.max()) < 32 and int(out.min()) >= 0


def test_t5_conditioning_adapter():
    """T5 conditioning restored for MaskGIT (t5.py:64-104 parity surface):
    HF Flax T5 encoder states (pads zeroed, frozen) drive MaskGit
    cross-attention via the t5_text_encode adapter."""
    import pytest

    t5_adapter = pytest.importorskip("vit_exp_tpu.models.t5_adapter")
    if not t5_adapter.available():
        pytest.skip("FlaxT5EncoderModel unavailable")

    from vit_exp_tpu.models.maskgit_pipeline import t5_text_encode

    enc = t5_adapter.T5TextEncoder()  # offline tiny T5Config, random init
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 7), 0, 512)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1]],
                       jnp.int32)
    states, m2 = enc(ids, mask)
    assert states.shape == (2, 7, enc.ctx_dim)
    # pads zeroed (t5.py:96-104 masked_fill)
    assert float(jnp.abs(states[0, 4:]).max()) == 0.0
    assert float(jnp.abs(states[0, :4]).max()) > 0.0

    mg = MaskGit(num_tokens=16, max_seq_len=10, dim=16, depth=1, heads=2,
                 dim_head=4, dim_context=enc.ctx_dim)
    tok = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 16)
    encode = t5_text_encode(enc)
    ctx = encode(ids, mask)
    vars_ = mg.init(jax.random.PRNGKey(2), tok, context=ctx,
                    context_mask=mask)
    logits = mg.apply(vars_, tok, context=ctx, context_mask=mask)
    assert logits.shape == (2, 10, 16)
    assert np.isfinite(np.asarray(logits)).all()


def test_run_maskgit_sample_cli(tmp_path):
    """Standalone text→CT generation driver (train_transformer.py:303-311
    sampling surface): tiny CTViT+MaskGit+T5, two prompts → scene-chained
    NIfTI out."""
    import pytest

    from vit_exp_tpu.models import t5_adapter

    if not t5_adapter.available():
        pytest.skip("FlaxT5EncoderModel unavailable")

    from vit_exp_tpu.cli.run_maskgit_sample import main as mg_main
    from vit_exp_tpu.data.nifti import read_nifti

    out = tmp_path / "gen"
    mg_main([
        "--results_folder", str(out),
        "--prompt", "pleural effusion", "--prompt", "follow-up",
        "--dim", "24", "--codebook_size", "16",
        "--image_size", "8", "--patch_size", "4",
        "--temporal_patch_size", "2", "--num_frames", "5",
        "--mg_dim", "16", "--mg_depth", "1", "--mg_heads", "2",
        "--mg_dim_head", "4", "--steps", "2", "--max_text_len", "8",
    ])
    vol = read_nifti(str(out / "sample.nii.gz"))
    # two chained 5-frame scenes, (H, W, S) axis order
    assert vol.shape == (8, 8, 10)
    assert np.isfinite(vol).all()
