"""QAVE baseline model: encoder + CMI + span predictor, pure grounding loss
(no CSMM gating, no discriminator) — reference: grounding/model/Baseline.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from .components import (QueryAwareEncoder, SentenceRNNEncoder,
                         SpanPredictorBoundary, VideoRNNEncoder, cmi_apply)


class Baseline(nn.Module):
    sent_hidden: int = 256
    sent_layers: int = 2
    video_encoder_name: str = 'query_aware_encoder'
    video_hidden: int = 256
    video_layers: int = 2
    nblocks: int = 2
    cross_name: str = 'vs'
    predictor_name: str = 'mlp'
    mlp_hidden_dim: int = 256
    span_hidden_dim: int = 128
    video_if_mask: bool = False
    dropout: float = 0.5
    dtype: Any = jnp.float32
    fused_inference: Any = False
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

    def __call__(self, video_feat: jnp.ndarray, query_feat: jnp.ndarray,
                 video_mask: Optional[jnp.ndarray] = None,
                 query_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        word_feat, sent_embed = self.sentence_encoder(query_feat, deterministic)
        frame_feat = self.video_encoder(video_feat, word_feat, deterministic)
        cross_feat = cmi_apply(self.cross_name, frame_feat, word_feat, sent_embed)
        start_prob, end_prob = self.span_predictor(
            cross_feat,
            v_mask=video_mask if self.video_if_mask else None,
            deterministic=deterministic)
        return {'start_prob': start_prob, 'end_prob': end_prob}

    # the reference's eval_forward is identical to forward for the baseline
    eval_forward = __call__
