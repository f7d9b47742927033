"""BERT language encoder (flax, from scratch).

Rebuilds the reference's BERT path (`/root/reference/model/DCNet_model.py:
248-249,477-484`): sentence feature = mean of the [CLS] vectors of the last
4 encoder layers, detached (frozen BERT).

Deliberate fixes (the reference BERT branch cannot execute as written —
SURVEY.md §7 "reference bugs"):
- `context`/`embedded` are undefined in the reference's BERT branch (it
  would NameError at DCNet_model.py:525); here `context` = last hidden
  states (B, L, H) and `embedded` = a learned Dense(H -> proj_dim)
  projection so PhraseAttention pooling and the cross-modal branch get the
  512-d features the trunk expects.
- The whole encoder is frozen via stop_gradient (the reference only
  detaches the sentence feature; freezing everything matches the stated
  intent "fix bert during training").

Weight-compatible with HuggingFace `BertModel` checkpoints via
`convert_hf_bert_params` (pytorch_pretrained_bert used the same layout).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1

    @classmethod
    def for_model(cls, bert_model: str) -> "BertConfig":
        if "large" in bert_model:
            return cls(hidden_size=1024, num_layers=24, num_heads=16,
                       intermediate_size=4096)
        if "mini" in bert_model or "tiny" in bert_model:
            # tiny variant for smoke runs and the BERT accuracy lock
            # (tools/make_converge32.py --bert): same id space, 4 layers
            return cls(hidden_size=128, num_layers=4, num_heads=4,
                       intermediate_size=512)
        return cls()


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, train):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x)
        b, l, _ = x.shape

        def split(t):
            return t.reshape(b, l, c.num_heads, head_dim)

        logits = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        logits = logits / math.sqrt(head_dim) + attn_bias
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(c.dropout, deterministic=not train)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v))
        return ctx.reshape(b, l, c.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, train):
        c = self.cfg
        attn = BertSelfAttention(c, self.dtype, name="attention_self")(
            x, attn_bias, train)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype,
                        name="attention_output")(attn)
        attn = nn.Dropout(c.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="attention_layernorm")(x + attn)
        inter = nn.Dense(c.intermediate_size, dtype=self.dtype,
                         name="intermediate")(x)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(c.dropout, deterministic=not train)(out)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="output_layernorm")(x + out)


class BertModel(nn.Module):
    """Returns all encoder hidden states (list of (B, L, H))."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 train: bool = False) -> List[jnp.ndarray]:
        c = self.cfg
        b, l = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, l), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, l), jnp.int32)
        pos = jnp.arange(l)[None, :]
        x = (nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                      name="word_embeddings")(input_ids)
             + nn.Embed(c.max_position, c.hidden_size, dtype=self.dtype,
                        name="position_embeddings")(pos)
             + nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                        name="token_type_embeddings")(token_type_ids))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_layernorm")(x)
        x = nn.Dropout(c.dropout, deterministic=not train)(x)

        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) \
            * -10000.0
        hidden_states = []
        for i in range(c.num_layers):
            x = BertLayer(c, self.dtype, name=f"layer_{i}")(x, attn_bias, train)
            hidden_states.append(x)
        return hidden_states


class BertEncoder(nn.Module):
    """DCNet-facing wrapper with the (sentence, context, embedded) contract
    of the LSTM encoder. `word_mask` is derived from ids != 0 like the
    loader's attention mask."""

    bert_model: str = "bert-base-uncased"
    proj_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, word_ids: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = BertConfig.for_model(self.bert_model)
        mask = (word_ids != 0).astype(jnp.int32)
        layers = BertModel(cfg, self.dtype, name="bert")(
            word_ids, attention_mask=mask, train=train)
        # frozen encoder: no gradients into BERT
        layers = [jax.lax.stop_gradient(h) for h in layers]
        raw_flang = sum(h[:, 0] for h in layers[-4:]) / 4.0
        context = layers[-1]
        embedded = nn.Dense(self.proj_dim, dtype=self.dtype,
                            name="proj")(context)
        return raw_flang, context, embedded


def convert_hf_bert_params(state_dict: Dict[str, Any],
                           cfg: BertConfig) -> Dict[str, Any]:
    """HuggingFace / pytorch_pretrained_bert BertModel state_dict -> our
    BertModel param tree (transpose Linear kernels)."""
    import numpy as np

    sd = {k: np.asarray(v.cpu() if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        # pytorch_pretrained_bert used gamma/beta; HF uses weight/bias
        w = sd.get(f"{prefix}.weight", sd.get(f"{prefix}.gamma"))
        b = sd.get(f"{prefix}.bias", sd.get(f"{prefix}.beta"))
        return {"scale": w, "bias": b}

    params: Dict[str, Any] = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embeddings_layernorm": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention_self": {
                "query": lin(f"{p}.attention.self.query"),
                "key": lin(f"{p}.attention.self.key"),
                "value": lin(f"{p}.attention.self.value"),
            },
            "attention_output": lin(f"{p}.attention.output.dense"),
            "attention_layernorm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "output_layernorm": ln(f"{p}.output.LayerNorm"),
        }
    return params
