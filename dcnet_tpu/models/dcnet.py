"""DCNet grounding model — TPU-native (flax linen, NHWC, static shapes).

Rebuilds the three reference model variants as one parameter-sharing module:
- training forward (2-frame clips, dual correspondence + contrastive
  sampling): `/root/reference/model/DCNet_model.py:221-651`
- inference forward (n-frame clips, center-vs-reference co-attention
  averaged): `model/test_DCNet_model.py:138-483`
- correspondence-free baseline (single image):
  `model/grounding_model_semantic_attn.py:138-385`

Deliberate deviations (intended semantics instead of reference crashes,
SURVEY.md §7 "reference bugs"):
- The reference eval model concatenates center-frame correspondence features
  (batch B) with per-frame language tiles (batch B*n_frame), which cannot
  execute as written (test_DCNet_model.py:357-366). Here the eval trunk is
  per-clip: one phrase (the center frame's), outputs for the center frame.
- Python-loop top-k/negative sampling becomes `lax.top_k` + PRNG gathers
  (ops/correspondence.py); randomness is keyed by the 'sampling' RNG.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models.attention import PhraseAttention
from dcnet_tpu.models.darknet import DarknetBackbone, yolov3_layer_defs
from dcnet_tpu.models.heads import (
    ConvBNReLU, DenseBNReLU, FusionFCN, MappingLang, l2_normalize,
    tile_language,
)
from dcnet_tpu.models.lstm import BiLSTMEncoder
from dcnet_tpu.ops.coattention import (
    coattention_center, coattention_center_batched, coattention_pair,
)
from dcnet_tpu.ops.coords import generate_coord
from dcnet_tpu.ops.correspondence import (
    ContrastiveSamples, crossmodal_pairs, interframe_pairs,
)


class TrainOutputs(NamedTuple):
    outbox: List[jnp.ndarray]       # per scale (2B, 3, 5, g, g)
    sim_score: List[jnp.ndarray]    # per scale (2B, g, g)
    loc_score: List[jnp.ndarray]    # per scale (2B, g, g)
    corr_feat: List[jnp.ndarray]    # per scale (2B, g, g, C) fused features
    flang_attn: jnp.ndarray         # (2B, C) subject-attended phrase
    interframe: ContrastiveSamples
    crossmodal: ContrastiveSamples
    only_obj: List[jnp.ndarray]     # per scale (2B, g, g) raw objectness


class EvalOutputs(NamedTuple):
    outbox: List[jnp.ndarray]       # per scale (B, 3, 5, g, g) center frame
    sim_score: List[jnp.ndarray]
    loc_score: List[jnp.ndarray]
    corr_feat: List[jnp.ndarray]    # (B, g, g, C) — cache features
    only_obj: List[jnp.ndarray]


class DCNet(nn.Module):
    cfg: DCNetConfig
    dtype: Any = jnp.float32
    # override for tests/smoke runs (e.g. darknet.mini_backbone_defs())
    backbone_defs: Optional[Tuple] = None

    def setup(self):
        cfg = self.cfg
        defs = self.backbone_defs if self.backbone_defs is not None \
            else yolov3_layer_defs()
        backbone_cls = DarknetBackbone
        if cfg.remat_backbone:
            # jax.checkpoint over the 75-conv stack: recompute activations in
            # the backward pass instead of holding them in HBM
            backbone_cls = nn.remat(DarknetBackbone, static_argnums=(2,))
        self.backbone = backbone_cls(
            layer_defs=defs, dtype=self.dtype, name="visumodel")
        self.mapping_visu = tuple(
            ConvBNReLU(cfg.emb_size, 1, dtype=self.dtype,
                       quant=cfg.trunk_quant, name=f"mapping_visu_{i}")
            for i in range(3))
        if cfg.use_lstm:
            self.textmodel = BiLSTMEncoder(
                vocab_size=cfg.corpus_size,
                word_embedding_size=cfg.word_embedding_size,
                word_vec_size=cfg.textdim // 2,
                hidden_size=cfg.textdim // 2,
                input_dropout_p=cfg.input_dropout,
                dtype=self.dtype, name="textmodel")
        else:
            from dcnet_tpu.models.bert import BertEncoder
            # proj_dim follows emb_size: `embedded` feeds PhraseAttention,
            # whose output dots against the emb_size-channel corr features
            # (sim_score, dcnet.py _trunk) — 512 only matches by default
            self.textmodel = BertEncoder(
                bert_model=cfg.bert_model, proj_dim=cfg.emb_size,
                dtype=self.dtype, name="textmodel")
        self.mapping_lang = MappingLang(
            cfg.emb_size, dropout=cfg.jemb_dropout, dtype=self.dtype,
            name="mapping_lang")
        self.corr_conv = tuple(
            ConvBNReLU(cfg.emb_size, 1, dtype=self.dtype,
                       quant=cfg.trunk_quant, name=f"corr_conv_{i}")
            for i in range(3))
        # Conv1d(query_len -> query_len, k=3) smoothing of the word-patch map
        self.feature_map_conv = nn.Conv(
            cfg.query_len, (3,), padding=[(1, 1)], dtype=self.dtype,
            name="feature_map")
        self.sub_attn = PhraseAttention(dtype=self.dtype, name="sub_attn")
        self.loc_attn = PhraseAttention(dtype=self.dtype, name="loc_attn")
        self.loc_embedding = DenseBNReLU(8, dtype=self.dtype, name="loc_embedding")
        self.loc_text_embedding = DenseBNReLU(
            cfg.emb_size, dtype=self.dtype, name="loc_text_embedding")
        self.fcn = tuple(
            FusionFCN(cfg.emb_size, light=cfg.light, dtype=self.dtype,
                      quant=cfg.trunk_quant, name=f"fcn_{i}")
            for i in range(3))

    # ------------------------------------------------------------------
    # shared pieces
    # ------------------------------------------------------------------

    def _visual_features(self, images: jnp.ndarray, train: bool) -> List[jnp.ndarray]:
        """Backbone + per-scale mapping + channel L2-norm
        (DCNet_model.py:344-359). images NHWC."""
        raw = self.backbone(images, train)  # positional: remat static_argnums
        return self.map_features(raw, train)

    def map_features(self, raw: Sequence[jnp.ndarray],
                     train: bool = False) -> List[jnp.ndarray]:
        """Per-scale mapping + channel L2-norm over raw backbone features —
        exposed so alternative backbone executors (the int8-quantized stack,
        ops/quant.py) can reuse the float head."""
        return [l2_normalize(self.mapping_visu[i](raw[i], train), axis=-1)
                for i in range(3)]

    def _coattn(self, f1: jnp.ndarray, f2: jnp.ndarray):
        """Dual-direction co-attention; fused Pallas kernel on TPU when
        enabled, einsum composition elsewhere (sharded over the 'model'
        mesh axis when cfg.tp_internals)."""
        if (self.cfg.use_fused_coattn and not self.cfg.tp_internals
                and jax.default_backend() == "tpu"):
            from dcnet_tpu.ops.pallas.coattn import coattention_pair_fused
            return coattention_pair_fused(f1, f2, self.cfg.coattn_temperature)
        return coattention_pair(f1, f2, self.cfg.coattn_temperature,
                                tp_shard=self.cfg.tp_internals)

    def _coattn_center(self, f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
        """Single-direction co-attention (attended-for-f1 only) for the
        paths that never consume direction 2: the eval/serving trunk and
        the k>2 ring-pairing train step. The Pallas pair kernel is opaque
        to XLA DCE, so using it here would execute (and differentiate)
        the discarded direction."""
        if (self.cfg.use_fused_coattn and not self.cfg.tp_internals
                and jax.default_backend() == "tpu"):
            from dcnet_tpu.ops.pallas.coattn import coattention_center_fused
            return coattention_center_fused(f1, f2,
                                            self.cfg.coattn_temperature)
        return coattention_center(f1, f2, self.cfg.coattn_temperature,
                                  tp_shard=self.cfg.tp_internals)

    def _language(self, word_ids: jnp.ndarray, train: bool):
        """Returns (flang (B,C) mapped+normalized, context, embedded).

        For the LSTM path raw_flang is the packed last-step output
        (DCNet_model.py:476); for BERT it is the detached mean of the [CLS]
        features of the last 4 layers (DCNet_model.py:478-484), both produced
        as the encoder's first return value.
        """
        raw_flang, context, embedded = self.textmodel(word_ids, train=train)
        flang = self.mapping_lang(raw_flang, train)
        return l2_normalize(flang, axis=-1), context, embedded

    def _trunk(
        self, corr_feat: Sequence[jnp.ndarray], flang: jnp.ndarray,
        context: jnp.ndarray, embedded: jnp.ndarray, word_ids: jnp.ndarray,
        train: bool,
    ):
        """Fusion FCN + subject/location attention + conf modulation
        (DCNet_model.py:489-621). All inputs batch-aligned."""
        cfg = self.cfg
        b = corr_feat[0].shape[0]

        coord_list = [
            jnp.broadcast_to(
                jnp.transpose(generate_coord(f.shape[1], f.shape[2]), (1, 2, 0)
                              )[None], (b, f.shape[1], f.shape[2], 8))
            for f in corr_feat]

        outbox = []
        for i, f in enumerate(corr_feat):
            fused_in = jnp.concatenate(
                [f, tile_language(flang, f.shape[1], f.shape[2]), coord_list[i]],
                axis=-1)
            _, ob = self.fcn[i](fused_in, train)
            outbox.append(ob)

        # subject attention -> similarity score per position
        _, flang_attn = self.sub_attn(context, embedded, word_ids)
        flang_attn = l2_normalize(flang_attn, axis=-1)
        sim_score = [jnp.einsum("bc,bhwc->bhw", flang_attn, f) for f in corr_feat]

        # raw objectness and sim-modulated obj map
        only_obj = [jnp.mean(ob[:, :, 4], axis=1) for ob in outbox]  # (B, g, g)
        obj_score = [oo * ss for oo, ss in zip(only_obj, sim_score)]

        # location attention over the coordinate-relation Gram matrix
        _, flang_loc = self.loc_attn(context, embedded, word_ids)
        flang_loc = l2_normalize(flang_loc, axis=-1)
        coord_map = jnp.concatenate(
            [c.reshape(b, -1, 8) for c in coord_list], axis=1)   # (B, P, 8)
        obj_map = jnp.concatenate(
            [o.reshape(b, -1) for o in obj_score], axis=1)        # (B, P)
        obj_map = l2_normalize(obj_map, axis=-1)

        coord_emb = self.loc_embedding(coord_map.reshape(-1, 8), train)
        coord_emb = l2_normalize(coord_emb.reshape(b, -1, 8), axis=2)
        # The (P, P) coordinate Gram (1344^2 at 256px, reference hot loop #5,
        # DCNet_model.py:585-597) has rank <= 8, so the whole
        # Gram -> column-scale -> project chain factors exactly through the
        # 8-dim side (see DenseBNReLU.gram_factors) — no quadratic
        # intermediate on either the train or eval path. Supersedes the
        # fused Pallas kernel in ops/pallas/locgram.py.
        rel = self.loc_text_embedding(
            None, train, gram_factors=(coord_emb, obj_map))
        rel = rel.reshape(b, cfg.all_positions, -1)
        rel = l2_normalize(rel, axis=2)
        loc_map = jnp.einsum("bpc,bc->bp", rel, flang_loc)        # (B, P)
        lo = jnp.min(loc_map, axis=1, keepdims=True)
        hi = jnp.max(loc_map, axis=1, keepdims=True)
        loc_map = (loc_map - lo) / (hi - lo + 1e-6)

        loc_score = []
        s = 0
        for f in corr_feat:
            g2 = f.shape[1] * f.shape[2]
            loc_score.append(loc_map[:, s:s + g2].reshape(b, f.shape[1], f.shape[2]))
            s += g2

        # confidence modulation: conf *= sim * loc (DCNet_model.py:612-621)
        modulated = []
        for ob, ss, ls in zip(outbox, sim_score, loc_score):
            conf = ob[:, :, 4] * (ss * ls)[:, None]
            modulated.append(ob.at[:, :, 4].set(conf.astype(ob.dtype)))

        return modulated, sim_score, loc_score, only_obj, flang_attn

    # ------------------------------------------------------------------
    # training forward: paired 2-frame clips
    # ------------------------------------------------------------------

    def __call__(self, images: jnp.ndarray, word_ids: jnp.ndarray,
                 train: bool = True) -> TrainOutputs:
        """images: (kB, H, W, 3) interleaved k-frame clips; word_ids (kB, L).

        k = cfg.n_frames_train. k=2 is the reference recipe
        (vid_loader.py:211 num_frame_k=2): dual-direction co-attention
        between the pair, both directions off one logits matrix. k>2
        generalizes by ring pairing — frame j attends to frame (j+1) mod k —
        which reduces exactly to the k=2 dataflow when k=2 (the ring's two
        ordered pairs are the two directions) while keeping co-attention
        cost linear in k. Inter-frame contrastive pairs are sampled per
        ring edge (the reference samples per pair, DCNet_model.py:381-430).
        """
        cfg = self.cfg
        k_frames = cfg.n_frames_train
        bk = images.shape[0]
        b = bk // k_frames
        fvisu = self._visual_features(images, train)

        if train:
            rng_inter = self.make_rng("sampling")
            rng_cross = self.make_rng("sampling")
        else:
            rng_inter = rng_cross = jax.random.PRNGKey(0)

        if k_frames == 2:
            # (2B,...) -> frame split (B,...) x2 (DCNet_model.py:365-374)
            input1 = [f.reshape(b, 2, *f.shape[1:])[:, 0] for f in fvisu]
            input2 = [f.reshape(b, 2, *f.shape[1:])[:, 1] for f in fvisu]
            interframe = interframe_pairs(
                input1[0], input2[0], cfg.interframe_top_k,
                cfg.interframe_neg_n, rng_inter)
            # dual-direction co-attention + corr conv per scale
            corr_feat = []
            for i in range(3):
                a1, a2 = self._coattn(input1[i], input2[i])
                c1 = jnp.concatenate([input1[i], a1], axis=-1)  # (B,h,w,2C)
                c2 = jnp.concatenate([input2[i], a2], axis=-1)
                both = jnp.stack([c1, c2], axis=1).reshape(bk, *c1.shape[1:])
                cf = self.corr_conv[i](both, train)
                corr_feat.append(l2_normalize(cf, axis=-1))
        else:
            # ring pairing: one batched single-direction co-attention per
            # scale over all kB frames (neighbor = next frame in the clip)
            def ring_next(f):
                per_clip = f.reshape(b, k_frames, *f.shape[1:])
                rolled = jnp.roll(per_clip, -1, axis=1)
                return rolled.reshape(bk, *f.shape[1:])

            interframe = interframe_pairs(
                fvisu[0], ring_next(fvisu[0]), cfg.interframe_top_k,
                cfg.interframe_neg_n, rng_inter)
            corr_feat = []
            for i in range(3):
                att = self._coattn_center(fvisu[i], ring_next(fvisu[i]))
                cf = self.corr_conv[i](
                    jnp.concatenate([fvisu[i], att], axis=-1), train)
                corr_feat.append(l2_normalize(cf, axis=-1))

        flang, context, embedded = self._language(word_ids, train)

        outbox, sim_score, loc_score, only_obj, flang_attn = self._trunk(
            corr_feat, flang, context, embedded, word_ids, train)

        # cross-modal correspondence on the coarsest scale
        # (DCNet_model.py:624-637): patch-axis-normalized visual patches vs
        # nearest-downsampled language context, smoothed by Conv1d + softmax.
        vit = fvisu[0].reshape(bk, -1, cfg.emb_size)       # (kB, P, C)
        vit = jnp.swapaxes(vit, 1, 2)                      # (2B, C, P)
        vit = l2_normalize(vit, axis=2)                    # normalize over patches
        if cfg.use_lstm:
            lang = context[:, :, ::2]                      # nearest x0.5 (2B, L, C)
        else:
            # BERT: 768-d context can't be channel-halved to 512; use the
            # encoder's learned projection instead (see models/bert.py).
            lang = embedded
        lang = l2_normalize(lang, axis=1)                  # over the word axis
        wp_map = jnp.einsum("blc,bcp->blp", lang, vit)     # (2B, L, P)
        # Conv1d over the patch axis mixing the word channels
        wp_map = self.feature_map_conv(jnp.swapaxes(wp_map, 1, 2))  # (2B,P,L)
        wp_map = jnp.swapaxes(wp_map, 1, 2)
        wp_map = jax.nn.softmax(wp_map, axis=1)            # softmax over words
        crossmodal = crossmodal_pairs(
            wp_map, lang, jnp.swapaxes(vit, 1, 2),
            cfg.crossmodal_top_k, cfg.crossmodal_neg_n, rng_cross)

        return TrainOutputs(
            outbox=outbox, sim_score=sim_score, loc_score=loc_score,
            corr_feat=corr_feat, flang_attn=flang_attn,
            interframe=interframe, crossmodal=crossmodal, only_obj=only_obj)

    # ------------------------------------------------------------------
    # inference forward: n-frame clip, center-frame prediction
    # ------------------------------------------------------------------

    def extract_features(self, images: jnp.ndarray,
                         train: bool = False) -> List[jnp.ndarray]:
        """Backbone + mapping for feature caching (streaming serving runs
        this once per NEW frame and reuses ring-buffered features for the
        rest of the clip)."""
        return self._visual_features(images, train)

    def encode_language(self, word_ids: jnp.ndarray, train: bool = False):
        """Language features alone — for per-stream caching in serving
        (phrases are fixed per stream, so the encoder need not rerun per
        frame). Returns (flang, context, embedded)."""
        return self._language(word_ids, train)

    def corr_features(self, per_frame: Sequence[jnp.ndarray],
                      center: Optional[int] = None, train: bool = False,
                      newest_slot=None) -> List[jnp.ndarray]:
        """Correspondence stage in isolation: center-vs-each-reference
        co-attention + corr_conv, l2-normalized and averaged over the
        references (test_DCNet_model.py:303-332). Split out of
        eval_features so the serving breakdown bench can time co-attention
        + corr_conv separately from fusion/heads.

        per_frame: per scale (B, n_frame, h, w, C) mapped+normalized
        features; see eval_features for the `newest_slot` rotating-ring
        indexing convention (None = physical order is temporal order)."""
        cfg = self.cfg
        n_frame = per_frame[0].shape[1]
        center = n_frame // 2 if center is None else center
        ref_idx = [i for i in range(n_frame) if i != center]
        n_ref = len(ref_idx)

        def _deq(x):
            # int8 feature rings (serving --int8_rings): features are
            # l2-normalized so the static dequant scale is 1/127 — the
            # mirror of ops.coattention._int8_logits' quantize side
            if x.dtype == jnp.int8:
                return x.astype(self.dtype) * (1.0 / 127.0)
            return x

        if newest_slot is None:
            def frame(i, j):  # temporal j == physical j
                return _deq(per_frame[i][:, j])
        else:
            def frame(i, j):
                phys = jax.lax.rem(newest_slot + 1 + j, n_frame)
                return _deq(jax.lax.dynamic_index_in_dim(
                    per_frame[i], phys, axis=1, keepdims=False))

        # Per-reference co-attention, q = the same center block each time
        # (batching the refs into one attention call requires materializing
        # n_ref copies of the center features, which measured slower). The
        # corr_conv uses the split-input form: the center half of the 1x1
        # contraction is shared across references and computed once —
        # (n_ref-1)/(2 n_ref) fewer corr_conv FLOPs, exact in int8 and
        # within fp add-order noise in float (see QuantConv2D).
        corr_feat = []
        for i in range(3):
            cen = frame(i, center)
            if cfg.coattn_multiref:
                # ONE Pallas kernel per scale over all references, reading
                # the ring in place (int8 rings natively); atts stacked
                # (B, R, h, w, C) in temporal order — same contract as
                # coattn_batch_refs downstream
                from dcnet_tpu.ops.pallas.coattn import coattention_ring_fused
                atts = coattention_ring_fused(
                    per_frame[i], cfg.coattn_temperature, center_t=center,
                    newest_slot=newest_slot, compute_dtype=self.dtype)
                if atts.dtype != cen.dtype:
                    atts = atts.astype(cen.dtype)
            elif cfg.coattn_batch_refs:
                # one dot_general over all references; atts stays STACKED
                # (B, R, h, w, C) through the split corr_conv
                refs = jnp.stack([frame(i, idx) for idx in ref_idx], axis=1)
                atts = coattention_center_batched(
                    cen, refs, cfg.coattn_temperature,
                    int8_logits=cfg.coattn_int8_logits)
            elif cfg.coattn_int8_logits:
                # int8 QK logits on the einsum path (the Pallas kernel is
                # float-only; gradients don't flow here — eval/serving only)
                atts = [coattention_center(
                    cen, frame(i, idx), cfg.coattn_temperature,
                    tp_shard=cfg.tp_internals, int8_logits=True)
                    for idx in ref_idx]
            else:
                atts = [self._coattn_center(cen, frame(i, idx))
                        for idx in ref_idx]
            if cfg.split_corr_conv:
                cfs = self.corr_conv[i]((cen, atts), train)
            else:  # A/B baseline: per-reference concat conv
                if cfg.coattn_batch_refs or cfg.coattn_multiref:
                    atts = [atts[:, j] for j in range(n_ref)]
                cfs = [self.corr_conv[i](
                    jnp.concatenate([cen, a], axis=-1), train)
                    for a in atts]
            if isinstance(cfs, list):
                acc = None
                for cf in cfs:
                    cf = l2_normalize(cf, axis=-1)
                    acc = cf if acc is None else acc + cf
                corr_feat.append(acc / n_ref)
            else:  # stacked (B, R, h, w, F) from the batched split conv
                corr_feat.append(
                    jnp.mean(l2_normalize(cfs, axis=-1), axis=1))
        return corr_feat

    def eval_features(self, per_frame: Sequence[jnp.ndarray],
                      word_ids: jnp.ndarray, center: Optional[int] = None,
                      train: bool = False, language=None,
                      newest_slot=None) -> EvalOutputs:
        """Trunk over pre-extracted per-frame features.

        per_frame: per scale (B, n_frame, h, w, C) mapped+normalized
        features; word_ids (B, L). Center-vs-each-reference co-attention,
        corr_conv, averaged (test_DCNet_model.py:303-332). Pass `language`
        = (flang, context, embedded) to skip the text encoder.

        newest_slot: optional traced () int32 — the serving engine's
        rotating ring stores frames in modular order (newest at
        `newest_slot`, oldest right after it) instead of shifting the
        buffer each tick. Frame at temporal position j (0 = oldest) lives
        at physical index (newest_slot + 1 + j) mod n_frame; slices are
        read by dynamic index, so one compiled program serves every slot
        value. None = physical order IS temporal order (offline eval)."""
        corr_feat = self.corr_features(per_frame, center=center,
                                       train=train, newest_slot=newest_slot)

        if language is None:
            language = self._language(word_ids, train)
        flang, context, embedded = language
        outbox, sim_score, loc_score, only_obj, _ = self._trunk(
            corr_feat, flang, context, embedded, word_ids, train)
        return EvalOutputs(outbox=outbox, sim_score=sim_score,
                           loc_score=loc_score, corr_feat=corr_feat,
                           only_obj=only_obj)

    def eval_clip(self, images: jnp.ndarray, word_ids: jnp.ndarray,
                  n_frame: int = 5, train: bool = False) -> EvalOutputs:
        """images: (B*n_frame, H, W, 3); word_ids: (B, L) — the center
        frame's phrase. Predictions for the center frame
        (test_DCNet_model.py:284-483, with per-clip semantics)."""
        bn = images.shape[0]
        b = bn // n_frame
        fvisu = self._visual_features(images, train)
        per_frame = [f.reshape(b, n_frame, *f.shape[1:]) for f in fvisu]
        return self.eval_features(per_frame, word_ids, train=train)

    # ------------------------------------------------------------------
    # correspondence-free baseline: single image
    # ------------------------------------------------------------------

    def single_image(self, images: jnp.ndarray, word_ids: jnp.ndarray,
                     train: bool = False) -> EvalOutputs:
        """The semantic-attention baseline (grounding_model_semantic_attn.py):
        fusion + sub/loc attention on the raw mapped features, no
        correspondence. Uses mapped fvisu where the full model uses
        corr_feat."""
        fvisu = self._visual_features(images, train)
        flang, context, embedded = self._language(word_ids, train)
        outbox, sim_score, loc_score, only_obj, _ = self._trunk(
            fvisu, flang, context, embedded, word_ids, train)
        return EvalOutputs(outbox=outbox, sim_score=sim_score,
                           loc_score=loc_score, corr_feat=fvisu,
                           only_obj=only_obj)
