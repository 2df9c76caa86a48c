"""Attention primitives, batched for TPU.

``scdm_attention`` replaces the reference's per-word Python loop
(reference: grounding/model/networks/attention.py:99-121) with a single
broadcast-tanh contraction: P[b,t,n] = w . tanh(W_s s_n + W_a v_t), softmax
over words, then C = P @ S — two MXU matmuls and one fused elementwise tanh.

``multi_head_attention`` is the (fixed) equivalent of the reference's
MultiHead (attention.py:57-97, which never ran due to a broken super()
call); used by the self-attention span predictor variant.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def scdm_attention_scores(video_proj: jnp.ndarray, sent_proj: jnp.ndarray,
                          w: jnp.ndarray) -> jnp.ndarray:
    """Additive-attention logits.

    video_proj: [B, T, Dh] (= W_a v + b_a), sent_proj: [B, N, Dh] (= W_s s),
    w: [Dh]. Returns [B, T, N] logits before the softmax over N.
    """
    # tanh(sent_proj[b,n] + video_proj[b,t]) . w
    act = jnp.tanh(video_proj[:, :, None, :] + sent_proj[:, None, :, :])
    return jnp.einsum('btnh,h->btn', act, w,
                      preferred_element_type=jnp.float32).astype(video_proj.dtype)


def scdm_attention(video_proj: jnp.ndarray, sent_proj: jnp.ndarray,
                   w: jnp.ndarray, sent_feat: jnp.ndarray) -> jnp.ndarray:
    """Per-frame text context C [B, T, D_s] (softmax over words, then mix).

    Matches the reference exactly, including its quirk of softmaxing over
    *all* N word slots (padded positions included — attention.py:118 has no
    mask)."""
    logits = scdm_attention_scores(video_proj, sent_proj, w)
    P = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(sent_feat.dtype)
    return jnp.einsum('btn,bnd->btd', P, sent_feat,
                      preferred_element_type=jnp.float32).astype(sent_feat.dtype)


def positional_encodings_like(x: jnp.ndarray) -> jnp.ndarray:
    """Sin/cos positional encodings of shape x.shape[1:] (attention.py:16-35
    semantics: even channels sin, odd cos, 10000^(c/D) frequency)."""
    T, D = x.shape[1], x.shape[2]
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    chan = jnp.arange(D, dtype=jnp.float32)[None, :]
    even = (jnp.arange(D) % 2 == 0)
    angle_even = pos / jnp.power(10000.0, chan / D)
    angle_odd = pos / jnp.power(10000.0, (chan - 1.0) / D)
    enc = jnp.where(even[None, :], jnp.sin(angle_even), jnp.cos(angle_odd))
    return enc.astype(x.dtype)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         n_heads: int, scale_dim: int,
                         causal: bool = False,
                         mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Plain multi-head scaled dot-product attention over [B, T, D] inputs.

    The reference scales by sqrt(d_model) (not per-head d_k) — preserved via
    ``scale_dim``. Projections live in the calling module; this is the
    parameter-free core."""
    B, Tq, D = q.shape
    Dh = D // n_heads
    qh = q.reshape(B, Tq, n_heads, Dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, k.shape[1], n_heads, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, v.shape[1], n_heads, Dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(scale_dim))
    if causal:
        Tk = k.shape[1]
        tri = jnp.tril(jnp.ones((Tq, Tk), dtype=bool))
        logits = jnp.where(tri[None, None], logits, -1e10)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :].astype(bool), logits, -1e10)
    A = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum('bhqk,bhkd->bhqd', A, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
