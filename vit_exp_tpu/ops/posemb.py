"""Fixed (non-learned) 3D sin-cos position embedding.

Behavioral parity with the reference generator
(transformer_maskgit/ctvit3d.py:121-169): the embedding dimension is split in
three equal parts, one per axis, each encoded with the classic MAE-style
sin/cos table (omega = 1/10000^(2i/d)).

Parity quirk, reproduced deliberately: the reference builds the coordinate
grids with ``np.meshgrid(grid_t, grid_w, grid_h)`` under default ``'xy'``
indexing — which returns arrays of shape (n_w, n_t, n_h) — and then
``reshape([3, 1, n_t, n_w, n_h])``s them.  For the production cube grid
(n_t == n_h == n_w == 24) the shapes coincide, but the coordinate layout this
produces is NOT the naive (t, h, w) raster order.  We reproduce it exactly so
position tables (and therefore converted reference checkpoints and logits)
match bit-for-bit.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    # bit-for-bit the reference ops (ctvit3d.py:151-169): all-fp32 — the
    # einsum, pow and sin/cos run at the same precision so converted
    # checkpoints see the identical table
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float32)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float32), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_pos_embed_3d(embed_dim: int, grid_size: tuple[int, int, int]) -> np.ndarray:
    """Return (n_t*n_h*n_w, embed_dim) float32 table.

    grid_size is (n_t, n_h, n_w) — temporal patches first, matching
    ctvit3d.py:278-280 init order.
    """
    assert embed_dim % 6 == 0, "dim must split into 3 even sin/cos parts"
    n_t, n_h, n_w = grid_size
    axes = [
        np.arange(n_t, dtype=np.float32),
        np.arange(n_h, dtype=np.float32),
        np.arange(n_w, dtype=np.float32),
    ]
    # meshgrid(t, w, h) with default 'xy' indexing → shape (n_w, n_t, n_h);
    # the reference then reinterprets the buffer as (n_t, n_w, n_h).  Keep it.
    grid = np.meshgrid(axes[0], axes[2], axes[1])
    grid = np.stack(grid, axis=0).reshape([3, 1, n_t, n_w, n_h])
    part = embed_dim // 3
    emb = np.concatenate(
        [_sincos_1d(part, grid[0]), _sincos_1d(part, grid[1]), _sincos_1d(part, grid[2])],
        axis=1,
    )
    return emb.astype(np.float32)


def _sincos_1d_jnp(embed_dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = pos.reshape(-1).astype(jnp.float32)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def sincos_pos_embed_3d_traced(
    embed_dim: int, grid_size: tuple[int, int, int]
) -> jnp.ndarray:
    """Traced twin of sincos_pos_embed_3d (same meshgrid quirk): built from
    jnp ops so the (tokens, dim) table is COMPUTED inside the program
    instead of embedded as a 42 MB fp32 HLO literal — the numpy constant
    inflated every remote-compile upload (and tipped the train-step program
    over the relay's request-size limit).  fp32 sin/cos instead of the
    reference generator's float64 intermediates: difference ~1e-7, far
    below the bf16 activations it is added to (np twin stays for tests)."""
    n_t, n_h, n_w = grid_size
    ax_t = jnp.arange(n_t, dtype=jnp.float32)
    ax_h = jnp.arange(n_h, dtype=jnp.float32)
    ax_w = jnp.arange(n_w, dtype=jnp.float32)
    grid = jnp.meshgrid(ax_t, ax_w, ax_h)  # 'xy' quirk, see module docstring
    grid = jnp.stack(grid, axis=0).reshape(3, 1, n_t, n_w, n_h)
    part = embed_dim // 3
    return jnp.concatenate(
        [
            _sincos_1d_jnp(part, grid[0]),
            _sincos_1d_jnp(part, grid[1]),
            _sincos_1d_jnp(part, grid[2]),
        ],
        axis=1,
    )
