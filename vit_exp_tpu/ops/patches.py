"""3D patch extraction and the segmentation un-patchify.

Pure reshape/transpose ops — XLA folds these into surrounding fusions, so no
Pallas kernel is needed; what matters is exact index-order parity with the
reference (SURVEY.md §7 hard-part #4), which these functions reproduce:

- patchify_3d: einops 'b c (t pt) (h p1) (w p2) -> b t h w (c pt p1 p2)'
  (ctvit3d.py:239-244).
- unpatchify_heads: per-token head output (b, d, w, h, pd*pw*ph*C) → voxel
  grid (b, C, D, W, H) via view + permute(0,7,1,4,2,5,3,6)
  (ct_clip.py:1206-1207 / 1118-1119).  NOTE the reference names the token
  grid dims (d, w, h) and divides p_h, p_w, p_d = H//h, W//w, D//d — for the
  production cube these all coincide; we follow the same axis naming.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify_3d(video: jnp.ndarray, pt: int, p1: int, p2: int) -> jnp.ndarray:
    """(b, c, T, H, W) → (b, t, h, w, c*pt*p1*p2) with reference feature order."""
    b, c, T, H, W = video.shape
    t, h, w = T // pt, H // p1, W // p2
    x = video.reshape(b, c, t, pt, h, p1, w, p2)
    # target feature order is (c, pt, p1, p2) per patch
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, t, h, w, c * pt * p1 * p2)


def unpatchify_heads(
    tokens: jnp.ndarray, p_d: int, p_w: int, p_h: int
) -> jnp.ndarray:
    """(b, d, w, h, p_d*p_w*p_h*C) head output → (b, C, D, W, H) voxel logits.

    Inverse of the reference's ``seg_logits.view(b, d, w, h, p_d, p_w, p_h,
    -1).permute(0, 7, 1, 4, 2, 5, 3, 6)`` (ct_clip.py:1206-1207).  The head's
    out-feature axis is laid out as (p_d, p_w, p_h, C).
    """
    b, d, w, h, f = tokens.shape
    C = f // (p_d * p_w * p_h)
    x = tokens.reshape(b, d, w, h, p_d, p_w, p_h, C)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(b, C, d * p_d, w * p_w, h * p_h)
