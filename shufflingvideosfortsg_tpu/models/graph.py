"""Sentence graph modeling over (subject, relation, object) triplets.

TPU-native counterpart of the reference's unused-but-present module
(grounding/model/components/SentenceGraphModeling.py): gather word
encodings at triplet indices, embed relations with a tri-linear message
step (hadamard or concat connect), and concatenate object-span embeddings
with the relation embeddings. Kept for component-inventory parity
(SURVEY.md §2 row 15); no default model path uses it.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from .components import TDense


def word_feat_from_idx(sent_feat: jnp.ndarray, inds: jnp.ndarray
                       ) -> List[jnp.ndarray]:
    """Gather word features at index columns.

    sent_feat: [B, N, D]; inds: [B, M, K] int — returns K arrays [B, M, D]
    (one per index column), replacing the reference's per-column loop with
    take_along_axis gathers."""
    out = []
    for i in range(inds.shape[-1]):
        idx = inds[:, :, i][..., None]
        out.append(jnp.take_along_axis(sent_feat, idx, axis=1))
    return out


class TriLinear(nn.Module):
    hidden_dim: int
    connect_type: str = 'hadamard product'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rl_feat, ob_feat, sub_feat):
        input_dim = rl_feat.shape[-1]
        r = TDense(self.hidden_dim, dtype=self.dtype, name='wr')(rl_feat)
        o = TDense(self.hidden_dim, dtype=self.dtype, name='wo')(ob_feat)
        s = TDense(self.hidden_dim, dtype=self.dtype, name='ws')(sub_feat)
        if self.connect_type == 'hadamard product':
            atten = TDense(input_dim, dtype=self.dtype, name='we')(r * o * s)
        else:
            atten = TDense(input_dim, dtype=self.dtype, name='we')(
                jnp.concatenate([r, o, s], axis=-1))
        return r + nn.relu(atten)


class GraphModelingTriplet(nn.Module):
    """Object-span head + relation message passing (SentenceGraphModeling
    .py:12-28). Span embedding is the head word's features, as in the
    reference's (identity) SpanEmbedding."""
    hidden_dim: int
    rl_connect: str = 'hadamard product'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, word_encoding: jnp.ndarray, obs: jnp.ndarray,
                 rls: jnp.ndarray) -> jnp.ndarray:
        object_feats = word_feat_from_idx(word_encoding, obs)
        object_embed = object_feats[0]  # SpanEmbedding == head features
        rl_feat, ob_feat, sub_feat = word_feat_from_idx(word_encoding, rls)
        triplet_embed = TriLinear(self.hidden_dim, self.rl_connect,
                                  dtype=self.dtype, name='message_passing')(
                                      rl_feat, ob_feat, sub_feat)
        return jnp.concatenate([object_embed, triplet_embed], axis=1)
