"""Phrase attention over language context.

Rebuilds `PhraseAttention` (`/root/reference/model/DCNet_model.py:190-219`):
a 1-unit linear scorer over the BiLSTM context, softmax over the sequence,
zero-masked at pad positions (ids == 0), renormalized, then used to pool the
word embeddings into one phrase vector.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PhraseAttention(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, context: jnp.ndarray, embedded: jnp.ndarray, word_ids: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """context (B, L, D), embedded (B, L, E), word_ids (B, L) ->
        (attn (B, L), weighted_emb (B, E))."""
        scores = nn.Dense(1, dtype=self.dtype, name="fc")(context)[..., 0]
        attn = nn.softmax(scores, axis=-1)
        not_pad = (word_ids != 0).astype(attn.dtype)
        attn = attn * not_pad
        attn = attn / (jnp.sum(attn, axis=1, keepdims=True) + 1e-12)
        weighted = jnp.einsum("bl,ble->be", attn, embedded)
        return attn, weighted
