"""Typed configuration for the DCNet-TPU framework.

Replaces the ~30 argparse flags duplicated across the reference entry points
(`/root/reference/train_DCNet.py:335-375`, `test_DCNet.py:140-179`,
`post_processing.py:66-104`) and the magic numbers bound to them:
`Linear(1344, emb)` (sum of grid sizes squared for size=256,
`/root/reference/model/DCNet_model.py:259`) and `Conv1d(in_channels=20)`
(query length, `:288`) are derived here instead of hardcoded.

Anchor tables follow `/root/reference/train_DCNet.py:398-406`. The reference
has a `'refeit'` typo that silently routes ReferIt to the COCO anchors; we
implement the intended behavior (ReferIt gets its own k-means anchors) and
keep a `legacy_anchor_typo` switch for bit-parity with reference checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# k-means anchors computed at anchor_imsize=416, listed small->large in the
# source strings; the reference reverses them so index 0..2 = coarsest scale
# (/32), 3..5 = /16, 6..8 = /8 (train_DCNet.py:406).
_ANCHOR_TABLES = {
    "referit": (
        (30, 36), (78, 46), (48, 86), (149, 79), (82, 148),
        (331, 93), (156, 207), (381, 163), (329, 285),
    ),
    "flickr": (
        (29, 26), (55, 58), (137, 71), (82, 121), (124, 205),
        (204, 132), (209, 263), (369, 169), (352, 294),
    ),
    # COCO anchors: default for VID / unc / unc+ / gref / everything else.
    "coco": (
        (10, 13), (16, 30), (33, 23), (30, 61), (62, 45),
        (59, 119), (116, 90), (156, 198), (373, 326),
    ),
}

NUM_SCALES = 3
ANCHORS_PER_SCALE = 3
BOX_ATTRS = 5  # tx, ty, tw, th, conf


def anchors_for_dataset(dataset: str, legacy_anchor_typo: bool = False) -> Tuple[Tuple[float, float], ...]:
    """Return the 9 (w, h) anchors, reversed so anchors[0:3] serve scale /32.

    `legacy_anchor_typo=True` reproduces the reference bug where
    dataset='referit' falls through to the COCO table
    (train_DCNet.py:399 tests for the misspelled 'refeit').
    """
    if dataset == "flickr":
        table = _ANCHOR_TABLES["flickr"]
    elif dataset == "referit" and not legacy_anchor_typo:
        table = _ANCHOR_TABLES["referit"]
    else:
        table = _ANCHOR_TABLES["coco"]
    return tuple(reversed(table))


@dataclasses.dataclass(frozen=True)
class DCNetConfig:
    """One typed config from which every derived shape is computed."""

    dataset: str = "VID"
    image_size: int = 256          # --size
    anchor_imsize: int = 416       # --anchor_imsize
    emb_size: int = 512            # --emb_size
    query_len: int = 20            # --time
    n_frames_train: int = 2        # train clip length (vid_loader num_frame_k)
    n_frames_test: int = 5         # test clip length (test_DCNet --num_frame_k)
    coordmap: bool = True
    light: bool = False
    use_lstm: bool = True          # --lstm (else BERT)
    bert_model: str = "bert-base-uncased"
    corpus_size: int = 0           # vocab size when use_lstm
    # Language encoder dims (DCNet_model.py:240: lstm => textdim 1024, embdim 512)
    lstm_hidden: int = 512
    word_embedding_size: int = 512
    jemb_dropout: float = 0.1
    input_dropout: float = 0.2
    # Correspondence hyperparams (DCNet_model.py:392-393, 53-54)
    interframe_top_k: int = 30
    interframe_neg_n: int = 10
    crossmodal_top_k: int = 1
    crossmodal_neg_n: int = 5
    coattn_temperature: float = 10.0
    infonce_temperature: float = 0.07
    # Loss weights (train_DCNet.py:642)
    w_rank: float = 100.0
    w_interframe: float = 100.0
    w_crossmodal: float = 1.0
    w_loc: float = 1.0
    yolo_coord_weight: float = 5.0
    rank_margin: float = 0.1
    # Optimizer (train_DCNet.py:341-344,527-534)
    lr: float = 1e-4
    backbone_lr_scale: float = 0.1
    weight_decay: float = 5e-4
    poly_power: float = 0.9
    nb_epoch: int = 100
    batch_size: int = 8
    optimizer: str = "rmsprop"
    seed: int = 13
    legacy_anchor_typo: bool = False
    # TPU-specific
    compute_dtype: str = "float32"  # "bfloat16" for the fast path
    use_fused_coattn: bool = True   # Pallas kernel for co-attention on TPU
    use_fused_locgram: bool = True  # retained for config compat; the
                                    # location-Gram chain now always uses the
                                    # exact rank-8 factorization
                                    # (heads.DenseBNReLU gram_factors), which
                                    # supersedes the Pallas kernel
    tp_internals: bool = False      # annotate the big internal matrices
                                    # (location Gram, co-attention logits)
                                    # for sharding over a 'model' mesh axis
    remat_backbone: bool = False    # rematerialize backbone activations
                                    # in backward (HBM for FLOPs trade)
    coattn_batch_refs: bool = False  # eval/serving corr stage: one batched
                                    # dot_general over all references
                                    # (ops.coattention_center_batched)
                                    # instead of the per-reference loop
                                    # (A/B: bench --coattn_batch_refs)
    coattn_multiref: bool = False   # eval/serving corr stage: ONE Pallas
                                    # kernel attends the center frame to all
                                    # n_frame-1 references straight off the
                                    # (B, n_frame, h, w, C) ring — grid over
                                    # (batch, refs, row tiles); the center
                                    # row tile and the (P, C) ref block live
                                    # in VMEM, no HBM ref/center copies and
                                    # no (P, P) logits in HBM (the failure
                                    # mode of coattn_batch_refs, -39%
                                    # serving). Reads int8 rings natively.
                                    # (A/B: bench --coattn_multiref)
    coattn_int8_logits: bool = False  # eval/serving co-attention QK logits
                                    # on the int8 MXU path; static scale
                                    # 1/127 is exact-bound because mapped
                                    # features are l2-normalized (no
                                    # calibration). Opt-in pending the
                                    # accuracy-lock A/B
                                    # (bench --coattn_int8)
    split_corr_conv: bool = True    # eval_features: hoist the center half
                                    # of the corr_conv 1x1 contraction
                                    # across the n_frame-1 references
                                    # (exact in int8, fp add-order noise in
                                    # float; see heads.QuantConv2D). False
                                    # = the naive per-reference concat conv
                                    # (A/B: bench --no_split_corr).
                                    # Measured: +2.5% offline eval (queue
                                    # G) but -9% streaming serving (queue
                                    # M adjacent pair) — serving paths
                                    # (bench --serving, cli.serve) flip
                                    # it off
    trunk_quant: str = "off"        # static-scale int8 PTQ of the trunk
                                    # convs (mapping_visu/corr_conv/fcn —
                                    # the ~20% of the eval step the int8
                                    # backbone doesn't cover). "off" |
                                    # "calib" (float pass recording per-conv
                                    # input abs-max into the mutable 'quant'
                                    # collection) | "int8" (quantized eval
                                    # using the calibrated scales)

    def __post_init__(self):
        # Clamp correspondence sampling to what the coarsest grid offers
        # (reference constants 30/10/5 assume size=256 -> 64 patches).
        p = (self.image_size // 32) ** 2
        object.__setattr__(self, "interframe_top_k",
                           min(self.interframe_top_k, p * p))
        object.__setattr__(self, "interframe_neg_n",
                           min(self.interframe_neg_n, max(p - 1, 1)))
        object.__setattr__(self, "crossmodal_neg_n",
                           min(self.crossmodal_neg_n, max(p - 1, 1)))

    # ---- derived ----

    @property
    def textdim(self) -> int:
        if self.use_lstm:
            return 2 * self.lstm_hidden  # BiLSTM output dim (1024)
        return 768 if self.bert_model == "bert-base-uncased" else 1024

    @property
    def strides(self) -> Tuple[int, ...]:
        # scale 0 = coarsest (/32), matching the reference ordering of the
        # three Darknet feature maps (model/darknet.py:431).
        return (32, 16, 8)

    @property
    def grids(self) -> Tuple[int, ...]:
        """Grid size per scale: size // (32 // 2**scale) (train_DCNet.py:269)."""
        return tuple(self.image_size // s for s in self.strides)

    @property
    def all_positions(self) -> int:
        """Sum of grid**2 over scales — 1344 at size=256 (DCNet_model.py:259)."""
        return sum(g * g for g in self.grids)

    @property
    def num_anchor_slots(self) -> int:
        """3 anchors x all positions — the flat conf-logit length (4032 @256)."""
        return ANCHORS_PER_SCALE * self.all_positions

    @property
    def anchors_full(self) -> Tuple[Tuple[float, float], ...]:
        return anchors_for_dataset(self.dataset, self.legacy_anchor_typo)

    def scaled_anchors(self, scale: int) -> Tuple[Tuple[float, float], ...]:
        """Anchors for `scale`, rescaled from anchor_imsize to that grid.

        Mirrors train_DCNet.py:293-296: anchor / (anchor_imsize / grid).
        """
        grid = self.grids[scale]
        ratio = self.anchor_imsize / grid
        sel = self.anchors_full[3 * scale: 3 * scale + 3]
        return tuple((w / ratio, h / ratio) for w, h in sel)

    def scale_offsets(self) -> Tuple[int, ...]:
        """Start offset of each scale inside the flat 3*grid^2 conf vector."""
        offs = []
        acc = 0
        for g in self.grids:
            offs.append(acc)
            acc += ANCHORS_PER_SCALE * g * g
        return tuple(offs)

    def position_offsets(self) -> Tuple[int, ...]:
        """Start offset of each scale inside the flat grid^2 position vector
        (the `all_positions`-long layout used by sim/loc score maps)."""
        offs = []
        acc = 0
        for g in self.grids:
            offs.append(acc)
            acc += g * g
        return tuple(offs)
