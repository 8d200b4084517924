"""Preprocess-chain parity vs torch oracles (SURVEY.md §7 hard-part #5)."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vit_exp_tpu.ops import preprocess as pp


def test_trilinear_matches_torch_interpolate():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 9, 11)).astype(np.float32)
    new_shape = (13, 5, 8)
    ours = np.asarray(pp.resize_trilinear(jnp.asarray(x), new_shape))
    ref = F.interpolate(
        torch.tensor(x)[None, None], size=new_shape, mode="trilinear",
        align_corners=False,
    )[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_trilinear_upsample_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 4, 4)).astype(np.float32)
    ours = np.asarray(pp.resize_trilinear(jnp.asarray(x), (9, 7, 12)))
    ref = F.interpolate(
        torch.tensor(x)[None, None], size=(9, 7, 12), mode="trilinear",
        align_corners=False,
    )[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("in_shape,out_shape", [
    ((1, 9, 11), (5, 3, 2)),    # single-slice input broadcast up
    ((7, 9, 11), (7, 9, 11)),   # identity sizes
    ((16, 3, 3), (1, 3, 5)),    # collapse an axis to 1
    ((2, 2, 2), (3, 3, 3)),     # tiny upsample (all boundary weights)
    ((5, 1, 7), (4, 6, 1)),     # size-1 axes on both sides
])
def test_trilinear_edge_shapes_match_torch(in_shape, out_shape):
    """align_corners=False boundary handling at degenerate sizes (size-1
    axes, identity, axis collapse) — the cases where half-pixel centers
    clamp and an off-by-one diverges from the reference resample."""
    rng = np.random.default_rng(sum(in_shape))
    x = rng.standard_normal(in_shape).astype(np.float32)
    ours = np.asarray(pp.resize_trilinear(jnp.asarray(x), out_shape))
    ref = F.interpolate(
        torch.tensor(x)[None, None], size=out_shape, mode="trilinear",
        align_corners=False,
    )[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5,
                               err_msg=f"{in_shape}->{out_shape}")


def test_offline_volume_matches_reference_chain():
    """Oracle: HU rescale/clip/scale + transpose + torch trilinear, the
    process_file chain (preprocess_ctrate_train.py:69-117)."""
    rng = np.random.default_rng(2)
    img_hwd = rng.integers(-500, 3000, (20, 22, 9)).astype(np.float32)
    slope, intercept = 1.0, -1024.0
    spacing = (2.5, 0.7, 0.7)  # (z, xy, xy)
    new_shape = pp.spacing_resample_shape((9, 20, 22), spacing)
    assert new_shape == (int(9 * 2.5 / 1.5), int(20 * 0.7 / 0.75),
                         int(22 * 0.7 / 0.75))

    ours = np.asarray(
        pp.preprocess_offline_volume(
            jnp.asarray(img_hwd), slope=slope, intercept=intercept,
            new_shape=new_shape,
        )
    )

    ref = np.clip(img_hwd * slope + intercept, -1000, 1000) / 1000
    ref = ref.transpose(2, 0, 1).astype(np.float32)
    ref = F.interpolate(
        torch.tensor(ref)[None, None], size=new_shape, mode="trilinear",
        align_corners=False,
    )[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _runtime_oracle(img_dhw, target=(480, 480, 240)):
    """Torch oracle of npz_to_tensor (data.py:49-111)."""
    x = np.transpose(img_dhw, (1, 2, 0))
    x = np.clip(x, -1, 1)
    x = (x - (-1)) / 2
    t = torch.tensor(x.astype(np.float32))
    dh, dw, dd = target
    h, w, d = t.shape
    hs = max((h - dh) // 2, 0)
    ws = max((w - dw) // 2, 0)
    ds = max((d - dd) // 2, 0)
    t = t[hs:min(hs + dh, h), ws:min(ws + dw, w), ds:min(ds + dd, d)]
    pads = []
    for size, tgt in zip(reversed(t.shape), reversed(target)):
        before = (tgt - size) // 2
        pads.extend([before, tgt - size - before])
    t = F.pad(t, pads, value=-1)
    return t.permute(2, 0, 1).unsqueeze(0).numpy()


def test_runtime_crop_pad_small_volume():
    rng = np.random.default_rng(3)
    img = rng.uniform(-1.5, 1.5, (10, 30, 26)).astype(np.float32)
    target = (24, 20, 16)  # (H, W, D)
    ours = np.asarray(pp.preprocess_runtime_volume(jnp.asarray(img), target))
    ref = _runtime_oracle(img, target)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    np_twin = pp.preprocess_runtime_numpy(img, target)
    np.testing.assert_allclose(np_twin, ref, atol=1e-6)


def test_runtime_crop_pad_large_volume():
    rng = np.random.default_rng(4)
    img = rng.uniform(-2, 2, (40, 12, 14)).astype(np.float32)
    target = (8, 10, 12)
    ours = np.asarray(pp.preprocess_runtime_volume(jnp.asarray(img), target))
    ref = _runtime_oracle(img, target)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mask_crop_pad():
    rng = np.random.default_rng(5)
    mask = (rng.random((2, 6, 10, 12)) > 0.5).astype(np.float32)
    out = pp.preprocess_mask_numpy(mask, (8, 8, 8))
    assert out.shape == (2, 8, 8, 8)
    # cropping then padding back must preserve the center content
    center = mask[:, :, 1:9, 2:10]
    np.testing.assert_allclose(out[:, 1:7], center, atol=0)
