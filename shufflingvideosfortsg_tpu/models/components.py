"""Model components (flax.linen), mirroring the reference component zoo.

Coverage map (reference file -> class/function here):
- components/SentenceEncoder.py:13-32   -> SentenceRNNEncoder
- components/VideoEncoder.py:17-39      -> VideoRNNEncoder
- components/VideoEncoder.py:41-114     -> RNNRecalibrationLayer, QueryAwareEncoder
- networks/attention.py:99-121          -> SCDMAttention (batched, loop-free)
- components/CrossModalInteraction.py   -> cmi_dim / cmi_apply ('a'/'vs'/'tall')
- components/SpanPredictor.py           -> MLPPredictor, TiedLSTMPredictor,
  CatTiedLSTMPredictor, ConditionalLSTMPredictor, CatConditionalLSTMPredictor,
  SelfAttentionPredictor (with a working MultiHead — the reference's is
  broken by a bad super() call), SpanPredictorBoundary selector
- components/DistributionAlign.py       -> VideoTextSemanticMatch
- components/TemporalOrderDiscriminator.py -> MomentPoolingTOD

Linear/LSTM initializers replicate torch defaults so training dynamics are
comparable; LayerNorm uses eps=1e-5 (torch default).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import (multi_head_attention, positional_encodings_like,
                             scdm_attention)
from ..ops.losses import mask_logits
from ..ops.rnn import BiLSTM


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    For kernels shape is [fan_in, fan_out]; biases get their own fan_in via
    :func:`torch_bias_init`."""
    k = 1.0 / (shape[0] ** 0.5)
    return jax.random.uniform(key, shape, dtype, -k, k)


def torch_bias_init(fan_in: int):
    k = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)

    return init


class TDense(nn.Module):
    """nn.Dense with torch nn.Linear initialization."""
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param('kernel', torch_linear_init, (fan_in, self.features))
        y = jnp.einsum('...i,io->...o', x.astype(self.dtype),
                       kernel.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            bias = self.param('bias', torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps=1e-5, elementwise affine)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (dim,))
        bias = self.param('bias', nn.initializers.zeros, (dim,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(self.dtype)


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

class SentenceRNNEncoder(nn.Module):
    """Linear word embed + 2-layer BiLSTM; sentence embedding is the concat
    of the last layer's final fwd/bwd hidden states."""
    hidden_dim: int
    n_layers: int
    dropout: float
    dtype: Any = jnp.float32
    fused: Any = False

    @property
    def textual_dim(self) -> int:
        return self.hidden_dim * 2

    @nn.compact
    def __call__(self, query_feat: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        word_embedding = TDense(query_feat.shape[-1], dtype=self.dtype,
                                name='word_embed')(query_feat)
        word_encoding, hn, _ = BiLSTM(self.hidden_dim, self.n_layers,
                                      self.dropout, dtype=self.dtype,
                                      fused=self.fused,
                                      name='rnn')(word_embedding, deterministic)
        sent_embedding = jnp.concatenate([hn[-2], hn[-1]], axis=-1)
        return word_encoding, sent_embedding


class VideoRNNEncoder(nn.Module):
    """Query-independent video encoder: BiLSTM + LayerNorm."""
    hidden_dim: int
    n_layers: int
    dropout: float
    dtype: Any = jnp.float32
    fused: Any = False

    @property
    def visual_dim(self) -> int:
        return self.hidden_dim * 2

    @nn.compact
    def __call__(self, video_feat: jnp.ndarray, word_feat=None,
                 deterministic: bool = True) -> jnp.ndarray:
        encoding, _, _ = BiLSTM(self.hidden_dim, self.n_layers, self.dropout,
                                dtype=self.dtype, fused=self.fused,
                                name='rnn')(video_feat, deterministic)
        return LayerNorm(dtype=self.dtype, name='norm')(encoding)


class SCDMAttention(nn.Module):
    """Additive word attention producing per-frame text context [B,T,D_s].

    With ``fused=True`` (TPU inference builds) the broadcast-tanh reduce
    runs as a Pallas kernel that never materializes the [B,T,N,Dh]
    intermediate (ops/pallas/scdm_fused.py)."""
    hidden_dim: int
    dtype: Any = jnp.float32
    fused: Any = False

    @nn.compact
    def __call__(self, video_feat: jnp.ndarray, sent_feat: jnp.ndarray
                 ) -> jnp.ndarray:
        sent_proj = TDense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                           name='W_s')(sent_feat)
        video_proj = TDense(self.hidden_dim, dtype=self.dtype,
                            name='W_a')(video_feat)
        w = self.param('w', torch_linear_init, (self.hidden_dim, 1))
        if self.fused and video_feat.shape[0] % 8 == 0:
            from ..ops.pallas.scdm_fused import (
                scdm_attention_fused, scdm_attention_fused_trainable)
            fn = (scdm_attention_fused_trainable if self.fused == 'train'
                  else scdm_attention_fused)
            return fn(video_proj, sent_proj,
                      w[:, 0].astype(self.dtype), sent_feat)
        return scdm_attention(video_proj, sent_proj,
                              w[:, 0].astype(self.dtype), sent_feat)


class RNNRecalibrationLayer(nn.Module):
    """One QAVE block: BiLSTM -> SCDM context -> sigmoid channel gate.

    Split into run_rnn/apply_gate so the multi-query serving path can run
    the query-independent recurrence once and gate per query."""
    hidden_dim: int
    n_layers: int
    ca_activ: str
    dropout: float
    dtype: Any = jnp.float32
    fused: Any = False

    def setup(self):
        self.rnn = BiLSTM(self.hidden_dim, self.n_layers, self.dropout,
                          dtype=self.dtype, fused=self.fused, name='rnn')
        self.attention = SCDMAttention(self.hidden_dim * 2, dtype=self.dtype,
                                       fused=self.fused, name='attention')
        self.sent_linear = TDense(self.hidden_dim * 2, dtype=self.dtype,
                                  name='sent_linear')

    def run_rnn(self, video_feat: jnp.ndarray,
                deterministic: bool = True) -> jnp.ndarray:
        rnn_output, _, _ = self.rnn(video_feat, deterministic)
        return rnn_output

    def apply_gate(self, rnn_output: jnp.ndarray,
                   word_feat: jnp.ndarray) -> jnp.ndarray:
        C = self.attention(rnn_output, word_feat)
        channel_attn = self.sent_linear(C)
        if self.ca_activ == 'sigmoid':
            channel_attn = jax.nn.sigmoid(channel_attn)
        elif self.ca_activ == 'relu':
            channel_attn = jax.nn.relu(channel_attn)
        elif self.ca_activ == 'tanh':
            channel_attn = jnp.tanh(channel_attn)
        return rnn_output * channel_attn

    def __call__(self, video_feat: jnp.ndarray, word_feat: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        return self.apply_gate(self.run_rnn(video_feat, deterministic),
                               word_feat)


class QueryAwareEncoder(nn.Module):
    """QAVE: a stack of recalibration blocks + final LayerNorm.

    ``remat=True`` wraps each block in ``nn.remat`` (jax.checkpoint):
    the backward recomputes block activations instead of saving them —
    trades ~1 extra forward of FLOPs for the saved-activation working
    set that spills HBM past B≈96 (docs/KERNELS.md B-sweep)."""
    hidden_dim: int
    n_layers: int
    nblocks: int
    dropout: float
    ca_activ: str = 'sigmoid'
    dtype: Any = jnp.float32
    fused: Any = False
    remat: bool = False

    @property
    def visual_dim(self) -> int:
        return self.hidden_dim * 2

    def setup(self):
        cls = RNNRecalibrationLayer
        if self.remat:
            # deterministic is a Python bool -> static (index 3: the
            # lifted core_fn counts the module itself as arg 0)
            cls = nn.remat(RNNRecalibrationLayer, static_argnums=(3,))
        self.blocks = tuple(
            cls(self.hidden_dim, self.n_layers,
                self.ca_activ, self.dropout,
                dtype=self.dtype, fused=self.fused,
                name=f'block{i}')
            for i in range(self.nblocks))
        self.norm = LayerNorm(dtype=self.dtype, name='norm')

    def __call__(self, video_feat: jnp.ndarray, word_feat: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        residual = video_feat
        for block in self.blocks:
            residual = block(residual, word_feat, deterministic)
        return self.norm(residual)

    def block0_rnn(self, video_feat: jnp.ndarray) -> jnp.ndarray:
        """Query-independent block-0 recurrence for a resident video.

        video_feat: [1, T, D]. BiLSTM handles the kernel's sublane
        alignment internally (the input projection runs at true B=1, only
        the recurrence's xw rows are zero-padded to 8 — the sublanes the
        hardware computes regardless), so no host-side tiling is needed."""
        return self.blocks[0].run_rnn(video_feat)

    def finish_from_rnn0(self, rnn0: jnp.ndarray,
                         word_feat: jnp.ndarray) -> jnp.ndarray:
        """Query-dependent completion given per-query block-0 recurrences
        rnn0 [Q, T, 2H] (possibly gathered from a multi-video bank)."""
        residual = self.blocks[0].apply_gate(rnn0, word_feat)
        for block in self.blocks[1:]:
            residual = block(residual, word_feat)
        return self.norm(residual)

    def shared_video_from_rnn0(self, rnn0: jnp.ndarray,
                               word_feat: jnp.ndarray) -> jnp.ndarray:
        """Finish the encoder given a precomputed block-0 recurrence
        (see :meth:`block0_rnn`); everything here is query-dependent."""
        Q = word_feat.shape[0]
        return self.finish_from_rnn0(
            jnp.broadcast_to(rnn0, (Q,) + rnn0.shape[1:]), word_feat)

    def shared_video(self, video_feat: jnp.ndarray, word_feat: jnp.ndarray
                     ) -> jnp.ndarray:
        """Serving path: one resident video [1, T, D] against Q queries.

        Block 0's BiLSTM is query-independent, so its recurrence (the most
        expensive scan — D=1024 input) runs ONCE and only the SCDM gate is
        evaluated per query; later blocks depend on the query and run
        batched over Q."""
        return self.shared_video_from_rnn0(self.block0_rnn(video_feat),
                                           word_feat)


# ---------------------------------------------------------------------------
# Cross-modal interaction (parameter-free)
# ---------------------------------------------------------------------------

def cmi_dim(name: str, video_dim: int, sent_dim: int) -> int:
    name = name.lower()
    if name in ('onlyvideo', 'a'):
        return video_dim
    if name in ('videosentconcat', 'vs', 'b'):
        return video_dim + sent_dim
    if name in ('tall', 'mm', 'c'):
        assert video_dim == sent_dim
        return video_dim * 4
    raise ValueError(f'unknown CMI: {name}')


def cmi_apply(name: str, video_feat: jnp.ndarray, word_feat: jnp.ndarray,
              sent_feat: jnp.ndarray) -> jnp.ndarray:
    name = name.lower()
    T = video_feat.shape[1]
    if name in ('onlyvideo', 'a'):
        return video_feat
    if name in ('videosentconcat', 'vs', 'b'):
        tiled = jnp.broadcast_to(sent_feat[:, None, :],
                                 (sent_feat.shape[0], T, sent_feat.shape[-1]))
        return jnp.concatenate([video_feat, tiled], axis=-1)
    if name in ('tall', 'mm', 'c'):
        tiled = jnp.broadcast_to(sent_feat[:, None, :],
                                 (sent_feat.shape[0], T, sent_feat.shape[-1]))
        return jnp.concatenate(
            [video_feat, tiled, video_feat * tiled, video_feat + tiled], axis=-1)
    raise ValueError(f'unknown CMI: {name}')


# ---------------------------------------------------------------------------
# Span predictors
# ---------------------------------------------------------------------------

def _finalize(start_logits: jnp.ndarray, end_logits: jnp.ndarray,
              v_mask: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if v_mask is not None:
        start_logits = mask_logits(start_logits, v_mask)
        end_logits = mask_logits(end_logits, v_mask)
    start_prob = jax.nn.softmax(start_logits.astype(jnp.float32), axis=1)
    end_prob = jax.nn.softmax(end_logits.astype(jnp.float32), axis=1)
    return start_prob, end_prob


class MLPPredictor(nn.Module):
    """Two tanh-MLP heads over the fused features (the default predictor)."""
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, v_mask=None, deterministic: bool = True):
        s = TDense(1, dtype=self.dtype, name='start_mlp_2')(
            jnp.tanh(TDense(self.hidden_dim, dtype=self.dtype,
                            name='start_mlp_1')(feat)))[..., 0]
        e = TDense(1, dtype=self.dtype, name='end_mlp_2')(
            jnp.tanh(TDense(self.hidden_dim, dtype=self.dtype,
                            name='end_mlp_1')(feat)))[..., 0]
        return _finalize(s, e, v_mask)


class ConvPredictor(nn.Module):
    """Temporal-conv span predictor.

    The reference's ConvPredictor (SpanPredictor.py:48-57) is an
    unfinished stub: it lacks ``super().__init__`` (crashes on
    construction), has no forward, and no dispatcher branch reaches it.
    This is the completed capability: per-boundary SAME-padded temporal
    convolutions (so T is preserved and v_mask stays aligned) + tanh +
    linear head, mirroring the MLP predictor's head structure but with a
    local temporal receptive field. kernel_size=3 matches the stub's
    intent of a small conv kernel; num_kernel <- mlp_hidden_dim (the
    dispatcher passes no conv-specific hyperparameters)."""
    hidden_dim: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, v_mask=None, deterministic: bool = True):
        conv = functools.partial(nn.Conv, features=self.hidden_dim,
                                 kernel_size=(self.kernel_size,),
                                 padding='SAME', dtype=self.dtype)
        s = TDense(1, dtype=self.dtype, name='start_fc')(
            jnp.tanh(conv(name='start_conv')(feat)))[..., 0]
        e = TDense(1, dtype=self.dtype, name='end_fc')(
            jnp.tanh(conv(name='end_conv')(feat)))[..., 0]
        return _finalize(s, e, v_mask)


class TiedLSTMPredictor(nn.Module):
    lstm_hidden_dim: int
    mlp_hidden_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, v_mask=None, deterministic: bool = True):
        h, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                         dtype=self.dtype, name='cross_lstm')(feat, deterministic)
        s = TDense(1, dtype=self.dtype, name='start_mlp_2')(
            jnp.tanh(TDense(self.mlp_hidden_dim, dtype=self.dtype,
                            name='start_mlp_1')(h)))[..., 0]
        e = TDense(1, dtype=self.dtype, name='end_mlp_2')(
            jnp.tanh(TDense(self.mlp_hidden_dim, dtype=self.dtype,
                            name='end_mlp_1')(h)))[..., 0]
        return _finalize(s, e, v_mask)


class CatTiedLSTMPredictor(nn.Module):
    lstm_hidden_dim: int
    mlp_hidden_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, v_mask=None, deterministic: bool = True):
        h, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                         dtype=self.dtype, name='cross_lstm')(feat, deterministic)
        h = jnp.concatenate([h, feat], axis=-1)
        s = TDense(1, dtype=self.dtype, name='start_mlp_2')(
            jnp.tanh(TDense(self.mlp_hidden_dim, dtype=self.dtype,
                            name='start_mlp_1')(h)))[..., 0]
        e = TDense(1, dtype=self.dtype, name='end_mlp_2')(
            jnp.tanh(TDense(self.mlp_hidden_dim, dtype=self.dtype,
                            name='end_mlp_1')(h)))[..., 0]
        return _finalize(s, e, v_mask)


class ConditionalLSTMPredictor(nn.Module):
    lstm_hidden_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, v_mask=None, deterministic: bool = True):
        start_feat, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                                  dtype=self.dtype, name='start_lstm')(
                                      feat, deterministic)
        end_feat, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                                dtype=self.dtype, name='end_lstm')(
                                    start_feat, deterministic)
        s = TDense(1, dtype=self.dtype, name='start_fc')(start_feat)[..., 0]
        e = TDense(1, dtype=self.dtype, name='end_fc')(end_feat)[..., 0]
        return _finalize(s, e, v_mask)


class CatConditionalLSTMPredictor(nn.Module):
    lstm_hidden_dim: int
    mlp_hidden_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, v_mask=None, deterministic: bool = True):
        start_feat, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                                  dtype=self.dtype, name='start_lstm')(
                                      feat, deterministic)
        end_feat, _, _ = BiLSTM(self.lstm_hidden_dim, 1, self.dropout,
                                dtype=self.dtype, name='end_lstm')(
                                    start_feat, deterministic)
        sf = jnp.concatenate([start_feat, feat], axis=-1)
        ef = jnp.concatenate([end_feat, feat], axis=-1)
        s = TDense(1, dtype=self.dtype, name='start_mlp_2')(
            jnp.tanh(TDense(self.mlp_hidden_dim, dtype=self.dtype,
                            name='start_mlp_1')(sf)))[..., 0]
        e = TDense(1, dtype=self.dtype, name='end_mlp_2')(
            jnp.tanh(TDense(self.mlp_hidden_dim, dtype=self.dtype,
                            name='end_mlp_1')(ef)))[..., 0]
        return _finalize(s, e, v_mask)


class MultiHead(nn.Module):
    """Working multi-head self-attention (the reference's never initialized
    nn.Module and would crash; fixed here as documented in SURVEY.md)."""
    n_heads: int
    dropout: float
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True):
        D = query.shape[-1]
        q = TDense(D, use_bias=False, dtype=self.dtype, name='wq')(query)
        k = TDense(D, use_bias=False, dtype=self.dtype, name='wk')(key)
        v = TDense(D, use_bias=False, dtype=self.dtype, name='wv')(value)
        out = multi_head_attention(q, k, v, self.n_heads, scale_dim=D,
                                   causal=self.causal)
        return TDense(D, use_bias=False, dtype=self.dtype, name='wo')(out)


class SelfAttentionPredictor(nn.Module):
    n_heads: int
    position_encoding: bool
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, v_mask=None, deterministic: bool = True):
        if self.position_encoding:
            feat = feat + positional_encodings_like(feat)[None]
        start_feat = MultiHead(self.n_heads, self.dropout, dtype=self.dtype,
                               name='start_selfattn')(feat, feat, feat,
                                                      deterministic)
        end_feat = MultiHead(self.n_heads, self.dropout, dtype=self.dtype,
                             name='end_selfattn')(feat, feat, feat,
                                                  deterministic)
        s = TDense(1, dtype=self.dtype, name='start_fc')(start_feat)[..., 0]
        e = TDense(1, dtype=self.dtype, name='end_fc')(end_feat)[..., 0]
        # NOTE: the reference's self-attn predictor ignores v_mask
        # (SpanPredictor.py:244-266 takes no mask arg); preserved.
        return _finalize(s, e, None)


class SpanPredictorBoundary(nn.Module):
    """Name-dispatching wrapper (SpanPredictor.py:7-46)."""
    predictor_name: str
    mlp_hidden_dim: int
    lstm_hidden_dim: int
    dropout: float
    attention_nheads: int = 4
    position_encoding: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, v_mask=None, deterministic: bool = True):
        name = self.predictor_name
        if name in ('mlp', 'a'):
            p = MLPPredictor(self.mlp_hidden_dim, dtype=self.dtype,
                             name='predictor')
        elif name in ('tied_lstm', 'b'):
            p = TiedLSTMPredictor(self.lstm_hidden_dim, self.mlp_hidden_dim,
                                  self.dropout, dtype=self.dtype, name='predictor')
        elif name in ('cat_tied_lstm', 'b2'):
            p = CatTiedLSTMPredictor(self.lstm_hidden_dim, self.mlp_hidden_dim,
                                     self.dropout, dtype=self.dtype,
                                     name='predictor')
        elif name in ('condi_lstm', 'c'):
            p = ConditionalLSTMPredictor(self.lstm_hidden_dim, self.dropout,
                                         dtype=self.dtype, name='predictor')
        elif name in ('cat_condi_lstm', 'c2'):
            p = CatConditionalLSTMPredictor(self.lstm_hidden_dim,
                                            self.mlp_hidden_dim, self.dropout,
                                            dtype=self.dtype, name='predictor')
        elif name in ('conv', 'e'):
            p = ConvPredictor(self.mlp_hidden_dim, dtype=self.dtype,
                              name='predictor')
        elif name in ('self_attn', 'd'):
            p = SelfAttentionPredictor(self.attention_nheads,
                                       self.position_encoding, self.dropout,
                                       dtype=self.dtype, name='predictor')
        else:
            raise ValueError(f'unknown predictor: {name}')
        return p(feat, v_mask, deterministic)


# ---------------------------------------------------------------------------
# Cross-modal semantic matching (CSMM)
# ---------------------------------------------------------------------------

def _activation(name: str):
    name = name.lower()
    if name == 'tanh':
        return jnp.tanh
    if name == 'sigmoid':
        return jax.nn.sigmoid
    return jax.nn.relu


class VideoTextSemanticMatch(nn.Module):
    """cross(concat tiled sentence) -> temporal(none|lstm) -> 2-layer MLP
    per-frame match logit (DistributionAlign.py:97-118)."""
    temporal_name: str
    temporal_hidden: int
    temporal_layers: int
    predict_hidden: int
    predict_activation: str
    dropout: float
    dtype: Any = jnp.float32
    fused: Any = False

    @nn.compact
    def __call__(self, video_feat, query_feat, video_mask=None,
                 deterministic: bool = True):
        B, T, _ = video_feat.shape
        if query_feat.ndim == 2:
            q = jnp.broadcast_to(query_feat[:, None, :],
                                 (B, T, query_feat.shape[-1]))
        else:
            q = jnp.broadcast_to(query_feat, (B, T, query_feat.shape[-1]))
        cross_feat = jnp.concatenate([video_feat, q], axis=-1)
        if self.temporal_name.lower() == 'lstm':
            temporal_feat, _, _ = BiLSTM(self.temporal_hidden,
                                         self.temporal_layers, self.dropout,
                                         dtype=self.dtype, fused=self.fused,
                                         name='temporal')(
                                             cross_feat, deterministic)
        else:
            temporal_feat = cross_feat
        act = _activation(self.predict_activation)
        h = act(TDense(self.predict_hidden, dtype=self.dtype,
                       name='predict_1')(temporal_feat))
        pred_score = TDense(1, dtype=self.dtype, name='predict_2')(h)[..., 0]
        return pred_score, temporal_feat


# ---------------------------------------------------------------------------
# Temporal order discriminator
# ---------------------------------------------------------------------------

class MomentPoolingTOD(nn.Module):
    """Masked mean-pool of target/fore/back regions -> shared fore/back MLP
    -> 2-way original-vs-pseudo classifier (TemporalOrderDiscriminator.py:
    15-45). Trained jointly (no gradient reversal). ``dropout`` defaults to
    the reference's hardcoded p=0.5 (TemporalOrderDiscriminator.py:23);
    configurable so deterministic-training tests can switch it off."""
    visual_dim: int
    dtype: Any = jnp.float32
    dropout: float = 0.5

    @staticmethod
    def average_mask(feat: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        m = mask.astype(feat.dtype)
        return (jnp.sum(feat * m[..., None], axis=1)
                / (jnp.sum(m, axis=1, keepdims=True) + 1e-6))

    @nn.compact
    def __call__(self, feat, target_mask, fore_mask, back_mask,
                 deterministic: bool = True):
        target = self.average_mask(feat, target_mask)
        fore = self.average_mask(feat, fore_mask)
        back = self.average_mask(feat, back_mask)
        foreback = TDense(self.visual_dim, dtype=self.dtype, name='foreback')
        fore_feat = jax.nn.relu(foreback(jnp.concatenate([fore, target], axis=-1)))
        back_feat = jax.nn.relu(foreback(jnp.concatenate([target, back], axis=-1)))
        concat = jnp.concatenate([target, fore_feat, back_feat], axis=-1)
        concat = nn.Dropout(rate=self.dropout)(concat,
                                               deterministic=deterministic)
        return TDense(2, dtype=self.dtype, name='classifier')(concat)
