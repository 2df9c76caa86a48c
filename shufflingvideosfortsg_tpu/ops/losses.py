"""Loss library: vectorized equivalents of the reference loss semantics.

All functions are pure, jittable, and batch-vectorized — the reference's
Python per-sample loops (grounding/loss.py:22-28,42-51) become gathers and
masked reductions. Numerical details (DELTA=1e-4, the naive exp in
masked_softmax, span-aligned KL) are preserved exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DELTA = 1e-4


def mask_logits(inputs: jnp.ndarray, mask: jnp.ndarray,
                mask_value: float = -1e30) -> jnp.ndarray:
    """inputs*mask + mask_value*(1-mask); broadcasts a [..., T] mask over a
    trailing feature dim if needed (reference: attention.py:129-133)."""
    mask = mask.astype(inputs.dtype)
    if mask.ndim == inputs.ndim - 1:
        mask = mask[..., None]
    return inputs * mask + mask_value * (1.0 - mask)


def masked_softmax(vec: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = 1, epsilon: float = 1e-4) -> jnp.ndarray:
    """exp(vec)*mask / (sum + eps) — deliberately replicates the reference's
    un-shifted exponent (attention.py:123-127) in float32. Inputs here are
    bounded match logits, so the f32 range is never a concern.
    """
    exps = jnp.exp(vec.astype(jnp.float32))
    masked_exps = exps * mask.astype(jnp.float32)
    masked_sums = jnp.sum(masked_exps, axis=axis, keepdims=True) + epsilon
    return masked_exps / masked_sums


def span_ground_nll(start_prob: jnp.ndarray, end_prob: jnp.ndarray,
                    framestps: jnp.ndarray) -> jnp.ndarray:
    """Per-sample -log p_start[s] - log p_end[e], shape [B] (the
    grouped eval steps mean this over each loader batch separately)."""
    s = framestps[:, 0]
    e = framestps[:, 1]
    ps = jnp.take_along_axis(start_prob, s[:, None], axis=1)[:, 0]
    pe = jnp.take_along_axis(end_prob, e[:, None], axis=1)[:, 0]
    return -jnp.log(ps) - jnp.log(pe)


def span_ground_loss(start_prob: jnp.ndarray, end_prob: jnp.ndarray,
                     framestps: jnp.ndarray) -> jnp.ndarray:
    """Mean over batch of -log p_start[s] - log p_end[e].

    framestps: [B, 2] int. The reference loops over the batch
    (loss.py:22-28); here it is a pair of gathers.
    """
    return jnp.mean(span_ground_nll(start_prob, end_prob, framestps))


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean binary cross-entropy with logits (loss.py:30-36).

    Uses the numerically stable max(x,0) - x*z + log1p(exp(-|x|)) form (the
    same as torch's BCEWithLogits).
    """
    x = logits.astype(jnp.float32)
    z = labels.astype(jnp.float32)
    per_loc = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    m = mask.astype(jnp.float32)
    return jnp.sum(per_loc * m) / (jnp.sum(m) + DELTA)


def matching_kl_divergence(prob1: jnp.ndarray, prob2: jnp.ndarray,
                           framestps1: jnp.ndarray, framestps2: jnp.ndarray,
                           epsilon: float = 1e-4) -> jnp.ndarray:
    """Span-aligned KL between two masked-softmax distributions.

    The reference slices prob1[s1:e1+1] against prob2[s2:e2+1] per sample
    (loss.py:42-51); gt_translate preserves the span length so the slices
    align position-by-position *within* the span. Vectorized as clipped
    gathers at s+k with a k <= e-s validity mask. Mean over batch.
    """
    B, T = prob1.shape
    k = jnp.arange(T, dtype=jnp.int32)[None, :]
    s1, e1 = framestps1[:, :1], framestps1[:, 1:2]
    s2 = framestps2[:, :1]
    valid = (k <= (e1 - s1)).astype(jnp.float32)
    idx1 = jnp.clip(s1 + k, 0, T - 1)
    idx2 = jnp.clip(s2 + k, 0, T - 1)
    p1 = jnp.take_along_axis(prob1, idx1, axis=1)
    p2 = jnp.take_along_axis(prob2, idx2, axis=1)
    kl = p1 * jnp.log((p1 + epsilon) / (p2 + epsilon))
    return jnp.mean(jnp.sum(kl * valid, axis=1))


def temporal_order_discrimination_loss(original_logits: jnp.ndarray,
                                       pseudo_logits: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over [original; pseudo] with labels 0 / 1 (loss.py:6-20).

    logits: [B, 2] two-way classifier outputs.
    """
    logp_ori = jax.nn.log_softmax(original_logits.astype(jnp.float32), axis=-1)
    logp_pse = jax.nn.log_softmax(pseudo_logits.astype(jnp.float32), axis=-1)
    # label 0 for originals, label 1 for pseudo videos
    loss = -(jnp.sum(logp_ori[:, 0]) + jnp.sum(logp_pse[:, 1]))
    return loss / (original_logits.shape[0] + pseudo_logits.shape[0])
