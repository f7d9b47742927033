"""BiLSTM language encoder, TPU-native.

Rebuilds `RNNEncoder` (`/root/reference/model/DCNet_model.py:124-188`):
Embedding(vocab, 512) -> Dropout(0.2) -> Linear(512->512)+ReLU ->
1-layer bidirectional LSTM (hidden 512 per direction) with packed-sequence
semantics, returning (last-step output (B, 1024), full context (B, L, 1024),
mlp-transformed embedding (B, L, 512)).

TPU-first: instead of sort/pack/unsort (darknet-era host work that forces
dynamic shapes), the LSTM is a masked `lax.scan` over the static query
length. Packed-sequence behavior is reproduced exactly:
- timesteps >= length output zeros and do not advance the carry,
- the backward direction starts at each sample's own length-1.

Cell math matches torch.nn.LSTM (gate order i, f, g, o; two bias vectors)
so reference `.pth.tar` checkpoints can be converted weight-for-weight.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_scan(x: jnp.ndarray, lengths: jnp.ndarray, w_ih: jnp.ndarray,
               w_hh: jnp.ndarray, b: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Masked unidirectional LSTM over (B, L, D). Returns (B, L, H).

    Packed-sequence equivalence: positions t >= lengths[b] produce 0 and do
    not update (h, c). In reverse mode we scan from L-1 to 0 with the same
    mask, which makes each sample's reverse pass start at its own last valid
    token — identical to pack_padded_sequence + bidirectional LSTM.
    """
    b_sz, seq_len, _ = x.shape
    hidden = w_hh.shape[0]
    # Precompute input projections for all timesteps in one matmul (MXU).
    xp = jnp.einsum("bld,dh->blh", x, w_ih) + b  # (B, L, 4H)

    def step(carry, inputs):
        h, c = carry
        xp_t, valid = inputs  # (B, 4H), (B,)
        gates = xp_t + h @ w_hh  # (B, 4H)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        v = valid[:, None]
        h = jnp.where(v, h_new, h)
        c = jnp.where(v, c_new, c)
        out = jnp.where(v, h_new, jnp.zeros_like(h_new))
        return (h, c), out

    t_idx = jnp.arange(seq_len)
    valid = t_idx[None, :] < lengths[:, None]  # (B, L)
    init = (jnp.zeros((b_sz, hidden), x.dtype), jnp.zeros((b_sz, hidden), x.dtype))
    xs = (jnp.moveaxis(xp, 1, 0), jnp.moveaxis(valid, 1, 0))
    _, outs = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.moveaxis(outs, 0, 1)  # (B, L, H)


class BiLSTMEncoder(nn.Module):
    """Drop-in RNNEncoder equivalent (LSTM language path)."""

    vocab_size: int
    word_embedding_size: int = 512
    word_vec_size: int = 512
    hidden_size: int = 512
    input_dropout_p: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, word_ids: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """word_ids: (B, L) int32. Returns (sent (B, 2H), context (B, L, 2H),
        embedded (B, L, word_vec_size))."""
        lengths = jnp.sum((word_ids != 0).astype(jnp.int32), axis=1)
        # The reference guards empty phrases implicitly (lengths always >= 1
        # because pad ids are nonzero); clamp for safety.
        lengths = jnp.maximum(lengths, 1)

        emb = nn.Embed(self.vocab_size, self.word_embedding_size,
                       dtype=self.dtype, name="embedding")(word_ids)
        emb = nn.Dropout(self.input_dropout_p, deterministic=not train)(emb)
        emb = nn.relu(nn.Dense(self.word_vec_size, dtype=self.dtype,
                               name="mlp")(emb))

        h4 = 4 * self.hidden_size
        k_init = nn.initializers.uniform(scale=1.0 / self.hidden_size ** 0.5)

        def direction(prefix: str, reverse: bool) -> jnp.ndarray:
            w_ih = self.param(f"{prefix}_w_ih", k_init, (self.word_vec_size, h4))
            w_hh = self.param(f"{prefix}_w_hh", k_init, (self.hidden_size, h4))
            b_ih = self.param(f"{prefix}_b_ih", k_init, (h4,))
            b_hh = self.param(f"{prefix}_b_hh", k_init, (h4,))
            # cast to the compute dtype so the scan carry type is stable
            return _lstm_scan(emb, lengths, w_ih.astype(emb.dtype),
                              w_hh.astype(emb.dtype),
                              (b_ih + b_hh).astype(emb.dtype), reverse)

        fwd = direction("fwd", reverse=False)
        bwd = direction("bwd", reverse=True)
        context = jnp.concatenate([fwd, bwd], axis=-1)  # (B, L, 2H)

        # last valid step of the packed output (DCNet_model.py:185-188)
        last = jnp.take_along_axis(
            context, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        return last, context, emb


def convert_torch_lstm_params(state: dict, prefix: str = "textmodel.") -> dict:
    """Map a torch RNNEncoder state_dict slice to BiLSTMEncoder params.

    torch stores weight_ih_l0 (4H, D): ours is (D, 4H) => transpose.
    reverse direction keys end with `_reverse`.
    """
    import numpy as np

    def t(key):
        return np.asarray(state[prefix + key])

    return {
        "embedding": {"embedding": t("embedding.weight")},
        "mlp": {"kernel": t("mlp.0.weight").T, "bias": t("mlp.0.bias")},
        "fwd_w_ih": t("rnn.weight_ih_l0").T,
        "fwd_w_hh": t("rnn.weight_hh_l0").T,
        "fwd_b_ih": t("rnn.bias_ih_l0"),
        "fwd_b_hh": t("rnn.bias_hh_l0"),
        "bwd_w_ih": t("rnn.weight_ih_l0_reverse").T,
        "bwd_w_hh": t("rnn.weight_hh_l0_reverse").T,
        "bwd_b_ih": t("rnn.bias_ih_l0_reverse"),
        "bwd_b_hh": t("rnn.bias_hh_l0_reverse"),
    }
