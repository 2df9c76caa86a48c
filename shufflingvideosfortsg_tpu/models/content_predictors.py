"""Content-predictor span head family.

TPU-native counterparts of the reference's experimental heads
(SpanPredictor.py:274-438): predictors that emit an additional per-frame
*content* distribution next to start/end, and the start-conditioned end
predictor. No shipped config constructs these (they are selectable only by
editing model code in the reference as well); they are provided for
component-inventory completeness and are fully functional.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.rnn import BiLSTM
from .components import TDense


def _softmax_t(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(x.astype(jnp.float32), axis=1)


class MLPContentPredictor(nn.Module):
    """Three tanh-MLP heads: start / end / content (SpanPredictor.py:274-302)."""
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        outs = []
        for head in ('start', 'end', 'content'):
            h = jnp.tanh(TDense(self.hidden_dim, dtype=self.dtype,
                                name=f'{head}_mlp_1')(feat))
            outs.append(_softmax_t(
                TDense(1, dtype=self.dtype, name=f'{head}_mlp_2')(h)[..., 0]))
        return tuple(outs)


class TiedLSTMContentPredictor(nn.Module):
    """Shared BiLSTM + three MLP heads (SpanPredictor.py:304-340)."""
    lstm_hidden_dim: int
    mlp_hidden_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        h, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                         dtype=self.dtype, name='cross_lstm')(feat,
                                                              deterministic)
        outs = []
        for head in ('start', 'end', 'content'):
            z = jnp.tanh(TDense(self.mlp_hidden_dim, dtype=self.dtype,
                                name=f'{head}_mlp_1')(h))
            outs.append(_softmax_t(
                TDense(1, dtype=self.dtype, name=f'{head}_mlp_2')(z)[..., 0]))
        return tuple(outs)


class ConditionalLSTMContentPredictor(nn.Module):
    """start-LSTM -> {end, content} LSTMs + linear heads
    (SpanPredictor.py:343-377)."""
    lstm_hidden_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        start_feat, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                                  dtype=self.dtype, name='start_lstm')(
                                      feat, deterministic)
        end_feat, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                                dtype=self.dtype, name='end_lstm')(
                                    start_feat, deterministic)
        content_feat, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                                    dtype=self.dtype, name='content_lstm')(
                                        start_feat, deterministic)
        s = _softmax_t(TDense(1, dtype=self.dtype,
                              name='start_fc')(start_feat)[..., 0])
        e = _softmax_t(TDense(1, dtype=self.dtype,
                              name='end_fc')(end_feat)[..., 0])
        c = _softmax_t(TDense(1, dtype=self.dtype,
                              name='content_fc')(content_feat)[..., 0])
        return s, e, c


class StartConditionedPredictor(nn.Module):
    """End prediction conditioned on the (GT or argmax) start position
    (SpanPredictor.py:380-438): gather the start frame's features, tile,
    concat, run an end-BiLSTM + MLP. ``__call__`` is the teacher-forced
    training path; ``inference`` conditions on the predicted start."""
    hidden_dim: int
    lstm_hidden_dim: int
    dropout: float
    dtype: Any = jnp.float32

    def setup(self):
        self.start_mlp_1 = TDense(self.hidden_dim, dtype=self.dtype,
                                  name='start_mlp_1')
        self.start_mlp_2 = TDense(1, dtype=self.dtype, name='start_mlp_2')
        self.end_lstm = BiLSTM(self.lstm_hidden_dim, 2, self.dropout,
                               dtype=self.dtype, name='end_lstm')
        self.end_mlp_1 = TDense(self.hidden_dim, dtype=self.dtype,
                                name='end_mlp_1')
        self.end_mlp_2 = TDense(1, dtype=self.dtype, name='end_mlp_2')

    def _start_logits(self, video_feat):
        return self.start_mlp_2(jnp.tanh(self.start_mlp_1(video_feat)))[..., 0]

    def _end_prob(self, video_feat, start_idx, deterministic):
        B, T, D = video_feat.shape
        cond = jnp.take_along_axis(
            video_feat, start_idx[:, None, None].astype(jnp.int32), axis=1)
        cond = jnp.broadcast_to(cond, (B, T, D))
        end_in = jnp.concatenate([video_feat, cond], axis=-1)
        end_feat, _, _ = self.end_lstm(end_in, deterministic)
        logits = self.end_mlp_2(jnp.tanh(self.end_mlp_1(end_feat)))[..., 0]
        return _softmax_t(logits)

    def __call__(self, video_feat: jnp.ndarray,
                 start_timestamp: jnp.ndarray,
                 deterministic: bool = True):
        start_prob = _softmax_t(self._start_logits(video_feat))
        end_prob = self._end_prob(video_feat, start_timestamp, deterministic)
        return start_prob, end_prob

    def inference(self, video_feat: jnp.ndarray):
        start_prob = _softmax_t(self._start_logits(video_feat))
        s_max = jnp.argmax(start_prob, axis=1)
        end_prob = self._end_prob(video_feat, s_max, True)
        return start_prob, end_prob
