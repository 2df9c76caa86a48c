"""Loss library vs. independently-written torch/numpy oracles.

The oracles re-state the published loss formulas (per-sample slicing loops)
so the vectorized JAX versions are checked against straightforward,
obviously-correct implementations.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from shufflingvideosfortsg_tpu.ops.losses import (
    bce_loss, mask_logits, masked_softmax, matching_kl_divergence,
    span_ground_loss, temporal_order_discrimination_loss)

B, T, N = 6, 32, 9


def random_probs(rs, shape):
    x = rs.rand(*shape).astype(np.float32) + 1e-3
    return x / x.sum(-1, keepdims=True)


def random_spans(rs, batch, length):
    s = rs.randint(0, length - 1, size=batch)
    e = np.array([rs.randint(lo, length) for lo in s])
    return np.stack([s, e], axis=-1).astype(np.int32)


def test_span_ground_loss(rng):
    start = random_probs(rng, (B, T))
    end = random_probs(rng, (B, T))
    spans = random_spans(rng, B, T)
    got = float(span_ground_loss(jnp.array(start), jnp.array(end), jnp.array(spans)))
    # oracle: per-sample loop
    want = 0.0
    for b in range(B):
        want += -np.log(start[b, spans[b, 0]]) - np.log(end[b, spans[b, 1]])
    want /= B
    assert got == pytest.approx(want, rel=1e-6)


def test_bce_loss_vs_torch(rng):
    logits = rng.randn(B, T).astype(np.float32) * 3
    labels = (rng.rand(B, T) > 0.5).astype(np.float32)
    mask = (rng.rand(B, T) > 0.3).astype(np.float32)
    got = float(bce_loss(jnp.array(logits), jnp.array(labels), jnp.array(mask)))
    per = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(labels), reduction='none')
    want = float((per * torch.from_numpy(mask)).sum() / (mask.sum() + 1e-4))
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_softmax_naive_exp(rng):
    vec = rng.randn(B, T).astype(np.float32)
    mask = (rng.rand(B, T) > 0.4).astype(np.float32)
    got = np.asarray(masked_softmax(jnp.array(vec), jnp.array(mask)))
    exps = np.exp(vec) * mask
    want = exps / (exps.sum(1, keepdims=True) + 1e-4)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mask_logits(rng):
    x = rng.randn(B, T).astype(np.float32)
    m = (rng.rand(B, T) > 0.5).astype(np.float32)
    got = np.asarray(mask_logits(jnp.array(x), jnp.array(m)))
    want = x * m + (-1e30) * (1 - m)
    np.testing.assert_allclose(got, want)
    # 3D broadcast: [B,T] mask over [B,T,D]
    x3 = rng.randn(B, T, 4).astype(np.float32)
    got3 = np.asarray(mask_logits(jnp.array(x3), jnp.array(m)))
    want3 = x3 * m[..., None] + (-1e30) * (1 - m[..., None])
    np.testing.assert_allclose(got3, want3)


def test_matching_kl_span_aligned(rng):
    prob1 = random_probs(rng, (B, T))
    prob2 = random_probs(rng, (B, T))
    # equal-length spans at different offsets (gt_translate invariant)
    lengths = rng.randint(1, 10, size=B)
    s1 = np.array([rng.randint(0, T - L) for L in lengths])
    s2 = np.array([rng.randint(0, T - L) for L in lengths])
    f1 = np.stack([s1, s1 + lengths - 1], -1).astype(np.int32)
    f2 = np.stack([s2, s2 + lengths - 1], -1).astype(np.int32)
    got = float(matching_kl_divergence(
        jnp.array(prob1), jnp.array(prob2), jnp.array(f1), jnp.array(f2)))
    eps = 1e-4
    want = 0.0
    for b in range(B):
        a = prob1[b, f1[b, 0]:f1[b, 1] + 1]
        c = prob2[b, f2[b, 0]:f2[b, 1] + 1]
        want += np.sum(a * np.log((a + eps) / (c + eps)))
    want /= B
    assert got == pytest.approx(want, rel=1e-5)


def test_temporal_order_disc_vs_torch(rng):
    ori = rng.randn(B, 2).astype(np.float32)
    pse = rng.randn(B, 2).astype(np.float32)
    got = float(temporal_order_discrimination_loss(jnp.array(ori), jnp.array(pse)))
    pred = torch.from_numpy(np.concatenate([ori, pse], 0))
    labels = torch.cat([torch.zeros(B), torch.ones(B)]).long()
    want = float(F.cross_entropy(pred, labels))
    assert got == pytest.approx(want, rel=1e-4)  # f32 log-softmax rounding
