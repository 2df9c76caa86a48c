"""Transformer encoder/decoder blocks (optional encoder variants).

Parity with the reference's unused-but-present block zoo
(grounding/model/networks/transformer.py): residual pre-activation blocks,
feed-forward with ReLU, encoder/decoder layers over the (fixed) MultiHead
attention, and the MHAttLayer wrappers. Nothing on the default model path
uses these; they exist so every reference component has a working
TPU-native counterpart (SURVEY.md §2 row 14).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .components import LayerNorm, MultiHead, TDense


class ResidualBlock(nn.Module):
    """x + dropout(layer(norm(x), *args)) — pre-norm residual wrapper
    (transformer.py:20-32)."""
    layer: nn.Module
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *args, deterministic: bool = True):
        y = self.layer(LayerNorm(dtype=self.dtype, name='norm')(x), *args,
                       deterministic=deterministic)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        return x + y


class FeedForward(nn.Module):
    d_hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_model = x.shape[-1]
        h = nn.relu(TDense(self.d_hidden, dtype=self.dtype, name='linear1')(x))
        return TDense(d_model, dtype=self.dtype, name='linear2')(h)


class EncoderLayer(nn.Module):
    d_model: int
    d_hidden: int
    n_heads: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = MultiHead(self.n_heads, self.dropout, dtype=self.dtype,
                         name='selfattn')
        x = x + nn.Dropout(rate=self.dropout)(
            attn(LayerNorm(dtype=self.dtype, name='norm1')(x),
                 LayerNorm(dtype=self.dtype, name='norm1_kv')(x),
                 LayerNorm(dtype=self.dtype, name='norm1_kv2')(x),
                 deterministic), deterministic=deterministic)
        ff = FeedForward(self.d_hidden, dtype=self.dtype, name='ff')
        x = x + nn.Dropout(rate=self.dropout)(
            ff(LayerNorm(dtype=self.dtype, name='norm2')(x), deterministic),
            deterministic=deterministic)
        return x


class DecoderLayer(nn.Module):
    d_model: int
    d_hidden: int
    n_heads: int
    dropout: float
    causal: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, encoding, deterministic: bool = True):
        self_attn = MultiHead(self.n_heads, self.dropout, causal=self.causal,
                              dtype=self.dtype, name='selfattn')
        xn = LayerNorm(dtype=self.dtype, name='norm1')(x)
        x = x + nn.Dropout(rate=self.dropout)(
            self_attn(xn, xn, xn, deterministic), deterministic=deterministic)
        cross = MultiHead(self.n_heads, self.dropout, dtype=self.dtype,
                          name='crossattn')
        x = x + nn.Dropout(rate=self.dropout)(
            cross(LayerNorm(dtype=self.dtype, name='norm2')(x), encoding,
                  encoding, deterministic), deterministic=deterministic)
        ff = FeedForward(self.d_hidden, dtype=self.dtype, name='ff')
        x = x + nn.Dropout(rate=self.dropout)(
            ff(LayerNorm(dtype=self.dtype, name='norm3')(x), deterministic),
            deterministic=deterministic)
        return x


class MHAttLayer(nn.Module):
    """Standalone cross-attention layer (transformer.py:75-120): q attends
    over k/v with a residual + feed-forward stack."""
    d_model: int
    d_hidden: int
    n_heads: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, kv, deterministic: bool = True):
        attn = MultiHead(self.n_heads, self.dropout, dtype=self.dtype,
                         name='attn')
        x = q + nn.Dropout(rate=self.dropout)(
            attn(LayerNorm(dtype=self.dtype, name='norm1')(q), kv, kv,
                 deterministic), deterministic=deterministic)
        ff = FeedForward(self.d_hidden, dtype=self.dtype, name='ff')
        x = x + nn.Dropout(rate=self.dropout)(
            ff(LayerNorm(dtype=self.dtype, name='norm2')(x), deterministic),
            deterministic=deterministic)
        return x
