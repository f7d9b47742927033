"""Dual correspondence sampling, fully vectorized.

Rebuilds the two Python-loop hot spots of the reference with static-shape
ops and explicit PRNG keys (SURVEY.md §3 hot loops #2/#3):

- inter-frame patch pairing (`/root/reference/model/DCNet_model.py:379-430`):
  dense 64x64 patch correlation on the coarsest scale, global top-k entries
  as (query, key) pairs, plus `neg_n` random negative patches from frame 2
  excluding the matched one.
- cross-modal pairing (`model/DCNet_model.py:41-112,624-637`): top-1 word per
  patch from the smoothed word-patch map, plus random negative patches.

Negative sampling is without replacement (reference `random.sample`), done
via Gumbel-style top-k on masked uniforms — per-element GPU syncs of the
reference become one fused kernel.

Deliberate fix (documented deviation): the reference's cross-modal negative
loop (`DCNet_model.py:81-94`) overwrites its accumulator so negatives always
come from the *last* batch element; we implement the intended semantics —
negatives drawn from the same image, excluding the positive patch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ContrastiveSamples(NamedTuple):
    q: jnp.ndarray    # (B, K, C) query features
    k: jnp.ndarray    # (B, K, Kpos, C) positive key features (Kpos=1 usually)
    neg: jnp.ndarray  # (B, K, N, C) negative features


def _sample_negatives_excluding(
    rng: jax.Array, pos_idx: jnp.ndarray, num_items: int, neg_n: int
) -> jnp.ndarray:
    """Sample `neg_n` indices from [0, num_items) without replacement,
    excluding pos_idx. pos_idx: (...,). Returns (..., neg_n) int32."""
    u = jax.random.uniform(rng, pos_idx.shape + (num_items,))
    onehot = jax.nn.one_hot(pos_idx, num_items, dtype=u.dtype)
    u = u - onehot * 2.0  # the positive can never reach the top-neg_n
    _, idx = jax.lax.top_k(u, neg_n)
    return idx.astype(jnp.int32)


def interframe_pairs(
    f1: jnp.ndarray, f2: jnp.ndarray, top_k: int, neg_n: int, rng: jax.Array
) -> ContrastiveSamples:
    """f1, f2: (B, H, W, C) coarsest-scale mapped features of the two frames.

    corr[b, p, q] = <f1_p, f2_q>; global top-k over the flattened (P*P) map
    gives pairs (p = idx // P, q = idx % P) exactly like the reference's
    `index[jj] // (patch*patch)` / `% (patch*patch)` on the (P, P)-flattened
    map (DCNet_model.py:390-409 flattens to (P*P,) per sample).
    """
    b, h, w, c = f1.shape
    p = h * w
    assert top_k <= p * p, f"top_k {top_k} > {p * p} correlation entries"
    assert neg_n <= p - 1, f"neg_n {neg_n} > {p - 1} available negatives"
    pf1 = f1.reshape(b, p, c)
    pf2 = f2.reshape(b, p, c)
    corr = jnp.einsum("bpc,bqc->bpq", pf1, pf2).reshape(b, p * p)
    _, idx = jax.lax.top_k(corr, top_k)                 # (B, K)
    q_idx = (idx // p).astype(jnp.int32)
    k_idx = (idx % p).astype(jnp.int32)
    q = jnp.take_along_axis(pf1, q_idx[..., None], axis=1)      # (B, K, C)
    k = jnp.take_along_axis(pf2, k_idx[..., None], axis=1)      # (B, K, C)
    neg_idx = _sample_negatives_excluding(rng, k_idx, p, neg_n)  # (B, K, N)
    neg = jax.vmap(lambda feats, ids: feats[ids])(pf2, neg_idx)  # (B, K, N, C)
    return ContrastiveSamples(q=q, k=k[:, :, None, :], neg=neg)


def crossmodal_pairs(
    word_patch_map: jnp.ndarray,  # (B, L, P) smoothed+softmaxed word-patch map
    lang: jnp.ndarray,            # (B, L, C) interpolated language context
    vit: jnp.ndarray,             # (B, P, C) patch features (patch-axis norm'd)
    top_k: int, neg_n: int, rng: jax.Array,
) -> ContrastiveSamples:
    """Top-`top_k` words per patch as positives; `neg_n` random other patches
    of the same image as negatives (see module docstring on the fix)."""
    b, l, p = word_patch_map.shape
    # per patch: top-k words (reference topk over dim=2 of (B, P, L))
    _, cols = jax.lax.top_k(jnp.swapaxes(word_patch_map, 1, 2), top_k)  # (B, P, K)
    k = jax.vmap(lambda lf, ids: lf[ids])(lang, cols.astype(jnp.int32))  # (B, P, K, C)
    patch_ids = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None], (b, p))
    neg_idx = _sample_negatives_excluding(rng, patch_ids, p, neg_n)      # (B, P, N)
    neg = jax.vmap(lambda feats, ids: feats[ids])(vit, neg_idx)          # (B, P, N, C)
    return ContrastiveSamples(q=vit, k=k, neg=neg)
