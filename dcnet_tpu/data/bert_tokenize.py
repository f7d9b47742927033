"""BERT input encoding for the non-LSTM language path.

Rebuilds the `read_examples` / `convert_examples_to_features` shim
(`/root/reference/dataset/vid_loader.py:36-141`): [CLS] + tokens + [SEP],
zero-padded to `seq_length`, with a 1/0 attention mask. Uses the
HuggingFace tokenizer (transformers is baked into this image) in place of
pytorch_pretrained_bert.
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np

_TOKENIZER_CACHE = {}


class FallbackBertTokenizer:
    """Offline stand-in when no HF vocab is available (this image has zero
    egress): lowercase whitespace/punct word tokenization with stable hashed
    ids in the BERT id space. NOT WordPiece — fine for smoke/synthetic runs;
    supply a local vocab path for real-data parity."""

    CLS_ID, SEP_ID, VOCAB = 101, 102, 30522

    def tokenize(self, text: str):
        out = []
        word = ""
        for ch in text.lower():
            if ch.isalnum():
                word += ch
            else:
                if word:
                    out.append(word)
                    word = ""
                if not ch.isspace():
                    out.append(ch)
        if word:
            out.append(word)
        return out

    def convert_tokens_to_ids(self, tokens):
        import hashlib
        ids = []
        for t in tokens:
            if t == "[CLS]":
                ids.append(self.CLS_ID)
            elif t == "[SEP]":
                ids.append(self.SEP_ID)
            else:
                h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                ids.append(1000 + h % (self.VOCAB - 1000))
        return ids


def get_bert_tokenizer(bert_model: str = "bert-base-uncased"):
    if bert_model not in _TOKENIZER_CACHE:
        import os
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        try:
            from transformers import BertTokenizer
            _TOKENIZER_CACHE[bert_model] = BertTokenizer.from_pretrained(
                bert_model, do_lower_case=True)
        except Exception:
            _TOKENIZER_CACHE[bert_model] = FallbackBertTokenizer()
    return _TOKENIZER_CACHE[bert_model]


def encode_phrase(tokenizer, phrase: str, seq_length: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (input_ids, input_mask) each (seq_length,) int32."""
    # text_a ||| text_b split (read_examples, vid_loader.py:36-55)
    m = re.match(r"^(.*) \|\|\| (.*)$", phrase.strip())
    text_a = m.group(1) if m else phrase.strip()
    tokens_a = tokenizer.tokenize(text_a)
    if len(tokens_a) > seq_length - 2:
        tokens_a = tokens_a[: seq_length - 2]
    tokens = ["[CLS]"] + tokens_a + ["[SEP]"]
    ids = tokenizer.convert_tokens_to_ids(tokens)
    mask = [1] * len(ids)
    while len(ids) < seq_length:
        ids.append(0)
        mask.append(0)
    return (np.asarray(ids, np.int32), np.asarray(mask, np.int32))
