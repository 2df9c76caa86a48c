"""GMD: the shuffling-framework grounding model.

Composition mirrors the reference (grounding/model/SpanGroundMatchDisc.py):
sentence encoder -> shared QAVE over raw & pseudo videos -> CSMM on both ->
match-prob-gated CMI span prediction on the raw video -> temporal-order
discriminator on both.

TPU-first batching: the raw and pseudo videos run through the shared video
encoder / CSMM as a single [2B] batch (one scan, one set of matmuls) rather
than two sequential calls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from .components import (MomentPoolingTOD, QueryAwareEncoder,
                         SentenceRNNEncoder, SpanPredictorBoundary,
                         VideoRNNEncoder, VideoTextSemanticMatch, cmi_apply)


class GMD(nn.Module):
    # sentence encoder
    sent_hidden: int = 256
    sent_layers: int = 2
    # video encoder
    video_encoder_name: str = 'query_aware_encoder'
    video_hidden: int = 256
    video_layers: int = 2
    nblocks: int = 2
    # grounding
    cross_name: str = 'vs'
    predictor_name: str = 'mlp'
    mlp_hidden_dim: int = 256
    span_hidden_dim: int = 128
    video_if_mask: bool = False
    # matching
    m_temp: str = 'none'
    m_temp_hidden: int = 256
    m_temp_layers: int = 2
    m_pred_hidden: int = 1024
    m_pred_activ: str = 'relu'
    # pseudo-stream span grounding (beyond reference): also predict a
    # span on the PSEUDO stream through the shared predictor, so the
    # grounding loss can supervise the translated labels directly — the
    # stress-recovery study's method-floor probe (LEARNING.md): the raw
    # stream's grounding loss anchors starts in-distribution while the
    # pseudo stream debias only via auxiliary losses
    pseudo_ground: bool = False
    # regularization / dtype
    dropout: float = 0.5
    disc_dropout: float = 0.5  # TOD head dropout; reference hardcodes 0.5
    dtype: Any = jnp.float32
    # Pallas fused LSTM recurrence: False | 'eval' | 'train'
    fused_inference: Any = False
    # remat the video-encoder blocks (backward recomputes activations)
    remat: bool = False

    def setup(self):
        self.sentence_encoder = SentenceRNNEncoder(
            self.sent_hidden, self.sent_layers, self.dropout, dtype=self.dtype,
            fused=self.fused_inference)
        if self.video_encoder_name.lower() in ('query_aware_encoder', 'qae', 'qave'):
            self.video_encoder = QueryAwareEncoder(
                self.video_hidden, self.video_layers, self.nblocks,
                self.dropout, dtype=self.dtype, fused=self.fused_inference,
                remat=self.remat)
        else:
            self.video_encoder = VideoRNNEncoder(
                self.video_hidden, self.video_layers, self.dropout,
                dtype=self.dtype, fused=self.fused_inference)
        self.span_predictor = SpanPredictorBoundary(
            self.predictor_name, self.mlp_hidden_dim, self.span_hidden_dim,
            self.dropout, dtype=self.dtype)
        self.csmm = VideoTextSemanticMatch(
            self.m_temp, self.m_temp_hidden, self.m_temp_layers,
            self.m_pred_hidden, self.m_pred_activ, self.dropout,
            dtype=self.dtype, fused=self.fused_inference)
        self.tod = MomentPoolingTOD(self.video_hidden * 2, dtype=self.dtype,
                                    dropout=self.disc_dropout)

    def __call__(self, query_feat: jnp.ndarray, query_mask: jnp.ndarray,
                 ori_video_feat: jnp.ndarray, ori_video_mask: jnp.ndarray,
                 pseudo_video_feat: jnp.ndarray, pseudo_video_mask: jnp.ndarray,
                 ori_temporal_mask: jnp.ndarray, ori_fore_mask: jnp.ndarray,
                 ori_back_mask: jnp.ndarray, pseudo_temporal_mask: jnp.ndarray,
                 pseudo_fore_mask: jnp.ndarray, pseudo_back_mask: jnp.ndarray,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        word_feat, sent_embed = self.encode_query(query_feat, deterministic)

        # Shared encoder over both streams as one [2B] batch.
        both_video = jnp.concatenate([ori_video_feat, pseudo_video_feat], axis=0)
        both_words = jnp.concatenate([word_feat, word_feat], axis=0)
        both_frame_feat = self.video_encoder(both_video, both_words, deterministic)
        return self.forward_from_frames(
            word_feat, sent_embed, both_frame_feat, ori_video_mask,
            pseudo_video_mask, ori_temporal_mask, ori_fore_mask, ori_back_mask,
            pseudo_temporal_mask, pseudo_fore_mask, pseudo_back_mask,
            deterministic)

    def encode_query(self, query_feat: jnp.ndarray,
                     deterministic: bool = True):
        """Sentence-encoder half of the pair forward, exposed so encoder-
        sharded train steps (parallel/pipeline.py) can run the video
        encoder OUTSIDE the module and rejoin at
        :meth:`forward_from_frames`."""
        return self.sentence_encoder(query_feat, deterministic)

    def forward_from_frames(self, word_feat: jnp.ndarray,
                            sent_embed: jnp.ndarray,
                            both_frame_feat: jnp.ndarray,
                            ori_video_mask: jnp.ndarray,
                            pseudo_video_mask: jnp.ndarray,
                            ori_temporal_mask: jnp.ndarray,
                            ori_fore_mask: jnp.ndarray,
                            ori_back_mask: jnp.ndarray,
                            pseudo_temporal_mask: jnp.ndarray,
                            pseudo_fore_mask: jnp.ndarray,
                            pseudo_back_mask: jnp.ndarray,
                            deterministic: bool = True
                            ) -> Dict[str, jnp.ndarray]:
        """Everything after the shared video encoder: CSMM on both
        streams, match-gated span prediction on raw, TOD on both.
        ``both_frame_feat`` is the [2B, T, 2H] raw‖pseudo encoder output
        (SpanGroundMatchDisc.py:60-100 less the encoder calls)."""
        B = word_feat.shape[0]
        ori_frame_feat = both_frame_feat[:B]
        pseudo_frame_feat = both_frame_feat[B:]

        ori_cross_feat = cmi_apply(self.cross_name, ori_frame_feat,
                                   word_feat, sent_embed)

        both_sent = jnp.concatenate([sent_embed, sent_embed], axis=0)
        both_mask = jnp.concatenate([ori_video_mask, pseudo_video_mask], axis=0)
        both_match_prob, _ = self.csmm(both_frame_feat, both_sent, both_mask,
                                       deterministic)
        ori_match_prob = both_match_prob[:B]
        pseudo_match_prob = both_match_prob[B:]

        ori_gated_feat = ori_match_prob[:, :, None] * ori_cross_feat
        start_prob, end_prob = self.span_predictor(
            ori_gated_feat,
            v_mask=ori_video_mask if self.video_if_mask else None,
            deterministic=deterministic)

        both_target = jnp.concatenate([ori_temporal_mask, pseudo_temporal_mask], 0)
        both_fore = jnp.concatenate([ori_fore_mask, pseudo_fore_mask], 0)
        both_back = jnp.concatenate([ori_back_mask, pseudo_back_mask], 0)
        both_disc = self.tod(both_frame_feat, both_target, both_fore, both_back,
                             deterministic)

        out = {
            'start_prob': start_prob,
            'end_prob': end_prob,
            'ori_match_prob': ori_match_prob,
            'pseudo_match_prob': pseudo_match_prob,
            'ori_disc_prob': both_disc[:B],
            'pseudo_disc_prob': both_disc[B:],
        }
        if self.pseudo_ground:
            # identical CMI -> match-gate -> SHARED span predictor on
            # the pseudo stream; the loss supervises these at the
            # translated framestps
            pseudo_cross_feat = cmi_apply(self.cross_name,
                                          pseudo_frame_feat, word_feat,
                                          sent_embed)
            pseudo_gated = pseudo_match_prob[:, :, None] * pseudo_cross_feat
            p_start, p_end = self.span_predictor(
                pseudo_gated,
                v_mask=pseudo_video_mask if self.video_if_mask else None,
                deterministic=deterministic)
            out['pseudo_start_prob'] = p_start
            out['pseudo_end_prob'] = p_end
        return out

    def eval_forward(self, video_feat: jnp.ndarray, query_feat: jnp.ndarray,
                     video_mask: Optional[jnp.ndarray] = None,
                     sent_mask: Optional[jnp.ndarray] = None,
                     deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Single-video inference path (SpanGroundMatchDisc.py:102-129)."""
        word_feat, sent_embed = self.sentence_encoder(query_feat, deterministic)
        frame_feat = self.video_encoder(video_feat, word_feat, deterministic)
        cross_feat = cmi_apply(self.cross_name, frame_feat, word_feat, sent_embed)
        match_prob, _ = self.csmm(frame_feat, sent_embed, video_mask,
                                  deterministic)
        gated_feat = match_prob[:, :, None] * cross_feat
        start_prob, end_prob = self.span_predictor(
            gated_feat,
            v_mask=video_mask if self.video_if_mask else None,
            deterministic=deterministic)
        return {'start_prob': start_prob, 'end_prob': end_prob,
                'match_prob': match_prob}

    def serve_cached_multi(self, rnn0_bank: jnp.ndarray,
                           query_feat: jnp.ndarray,
                           video_ids: jnp.ndarray
                           ) -> Dict[str, jnp.ndarray]:
        """Multi-resident-video serving: a bank of precomputed block-0
        recurrences [V, T, 2H] (one :meth:`precompute_video` pass over a
        [V, T, D] stack) serves mixed query traffic — query i grounds
        against video ``video_ids[i]``. The per-query gather replaces the
        single-video broadcast, everything downstream is identical."""
        return self.serve_gathered(rnn0_bank[video_ids], query_feat)

    def serve_gathered(self, rnn0_q: jnp.ndarray, query_feat: jnp.ndarray
                       ) -> Dict[str, jnp.ndarray]:
        """:meth:`serve_cached_multi` with the bank gather already done —
        the int8 corpus tier gathers AND dequantizes per-query rows in the
        serving wrapper (serving._bank_rows) before entering the model."""
        word_feat, sent_embed = self.sentence_encoder(query_feat, True)
        if hasattr(self.video_encoder, 'finish_from_rnn0'):
            frame_feat = self.video_encoder.finish_from_rnn0(rnn0_q,
                                                             word_feat)
        else:
            frame_feat = self.video_encoder(rnn0_q, word_feat, True)
        cross_feat = cmi_apply(self.cross_name, frame_feat, word_feat,
                               sent_embed)
        match_prob, _ = self.csmm(frame_feat, sent_embed, None, True)
        gated_feat = match_prob[:, :, None] * cross_feat
        start_prob, end_prob = self.span_predictor(gated_feat, v_mask=None,
                                                   deterministic=True)
        return {'start_prob': start_prob, 'end_prob': end_prob,
                'match_prob': match_prob}

    def precompute_video(self, video_feat: jnp.ndarray) -> jnp.ndarray:
        """Query-independent part of the serving encoder (block-0
        recurrence) for resident [V, T, D] video(s) — compute once per
        video, reuse across every query batch (V=1 for the single-video
        path; any V for a :meth:`serve_cached_multi` bank)."""
        if hasattr(self.video_encoder, 'block0_rnn'):
            return self.video_encoder.block0_rnn(video_feat)
        return video_feat

    def serve_cached(self, rnn0: jnp.ndarray, query_feat: jnp.ndarray,
                     video_mask: Optional[jnp.ndarray] = None
                     ) -> Dict[str, jnp.ndarray]:
        """serve_multi_query with the block-0 recurrence precomputed by
        :meth:`precompute_video`."""
        Q = query_feat.shape[0]
        word_feat, sent_embed = self.sentence_encoder(query_feat, True)
        if hasattr(self.video_encoder, 'shared_video_from_rnn0'):
            frame_feat = self.video_encoder.shared_video_from_rnn0(
                rnn0, word_feat)
        else:
            tiled = jnp.broadcast_to(rnn0, (Q,) + rnn0.shape[1:])
            frame_feat = self.video_encoder(tiled, word_feat, True)
        vmask = None
        if video_mask is not None:
            vmask = jnp.broadcast_to(video_mask, (Q, video_mask.shape[-1]))
        cross_feat = cmi_apply(self.cross_name, frame_feat, word_feat,
                               sent_embed)
        match_prob, _ = self.csmm(frame_feat, sent_embed, vmask, True)
        gated_feat = match_prob[:, :, None] * cross_feat
        start_prob, end_prob = self.span_predictor(
            gated_feat, v_mask=vmask if self.video_if_mask else None,
            deterministic=True)
        return {'start_prob': start_prob, 'end_prob': end_prob,
                'match_prob': match_prob}

    def serve_multi_query(self, video_feat: jnp.ndarray,
                          query_feat: jnp.ndarray,
                          video_mask: Optional[jnp.ndarray] = None
                          ) -> Dict[str, jnp.ndarray]:
        """Batched multi-query grounding: Q sentences x 1 resident video.

        video_feat: [1, T, D]; query_feat: [Q, N, 300]. The first QAVE
        block's recurrence runs once for the video and is shared across all
        queries (QueryAwareEncoder.shared_video); everything downstream is
        batched over Q. This is the serving configuration from
        BASELINE.json configs[4].
        """
        Q = query_feat.shape[0]
        word_feat, sent_embed = self.sentence_encoder(query_feat, True)
        if hasattr(self.video_encoder, 'shared_video'):
            frame_feat = self.video_encoder.shared_video(video_feat, word_feat)
        else:
            tiled = jnp.broadcast_to(video_feat,
                                     (Q,) + video_feat.shape[1:])
            frame_feat = self.video_encoder(tiled, word_feat, True)
        vmask = None
        if video_mask is not None:
            vmask = jnp.broadcast_to(video_mask, (Q, video_mask.shape[-1]))
        cross_feat = cmi_apply(self.cross_name, frame_feat, word_feat,
                               sent_embed)
        match_prob, _ = self.csmm(frame_feat, sent_embed, vmask, True)
        gated_feat = match_prob[:, :, None] * cross_feat
        start_prob, end_prob = self.span_predictor(
            gated_feat, v_mask=vmask if self.video_if_mask else None,
            deterministic=True)
        return {'start_prob': start_prob, 'end_prob': end_prob,
                'match_prob': match_prob}
