"""Normalized 8-channel coordinate embedding.

Rebuilds `generate_coord` (`/root/reference/model/DCNet_model.py:23-39`).
Note the reference's channel naming is transposed (its `xv` indexes rows);
we reproduce the exact numeric layout since downstream weights depend on it.
Channels: [row_min, col_min, row_max, col_max, row_ctr, col_ctr, 1/H, 1/W],
all in [-1, 1] (or 1/size for the last two).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_coord(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Returns (8, H, W); broadcast/tile over batch at the call site."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0).astype(dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1).astype(dtype)
    r_min = (rows * 2 - width) / width
    c_min = (cols * 2 - height) / height
    r_max = ((rows + 1) * 2 - width) / width
    c_max = ((cols + 1) * 2 - height) / height
    r_ctr = (r_min + r_max) / 2
    c_ctr = (c_min + c_max) / 2
    hmap = jnp.full((height, width), 1.0 / height, dtype)
    wmap = jnp.full((height, width), 1.0 / width, dtype)
    return jnp.stack([r_min, c_min, r_max, c_max, r_ctr, c_ctr, hmap, wmap], axis=0)
