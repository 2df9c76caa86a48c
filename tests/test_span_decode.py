"""Span decode: O(T) suffix-max path vs quadratic path vs torch oracle,
including adversarial tie cases (the reference decodes with torch CPU max,
whose tie-breaking is first-occurrence)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from shufflingvideosfortsg_tpu.ops.span import (
    compute_mean_iou, span_decode, span_decode_matrix)


def torch_oracle(start_prob, end_prob):
    """Fresh torch restatement of the published decode: triu(start_i+end_j),
    row max over end then column max over start (loss.py:53-70)."""
    sp = torch.from_numpy(start_prob)
    ep = torch.from_numpy(end_prob)
    Bt, Tt = sp.shape
    mat = (sp.unsqueeze(-1) + ep.unsqueeze(1)).triu(diagonal=0)
    row_max, row_idx = mat.max(dim=2)
    prob_max, col_idx = row_max.max(dim=1)
    start = col_idx
    end = row_idx[torch.arange(Bt), col_idx]
    return torch.stack([start, end], -1).numpy(), prob_max.numpy()


def softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("T", [8, 128, 240])
def test_decode_matches_torch_random(rng, T):
    B = 16
    start = softmax_np(rng.randn(B, T) * 2)
    end = softmax_np(rng.randn(B, T) * 2)
    pred, score = span_decode(jnp.array(start), jnp.array(end))
    want_pred, want_score = torch_oracle(start, end)
    np.testing.assert_array_equal(np.asarray(pred), want_pred)
    np.testing.assert_allclose(np.asarray(score), want_score, rtol=1e-6)


def test_decode_tie_breaking():
    # exact ties everywhere: uniform distributions
    B, T = 4, 16
    start = np.full((B, T), 1.0 / T, np.float32)
    end = np.full((B, T), 1.0 / T, np.float32)
    pred, score = span_decode(jnp.array(start), jnp.array(end))
    want_pred, want_score = torch_oracle(start, end)
    np.testing.assert_array_equal(np.asarray(pred), want_pred)
    # duplicated maxima at specific spots
    start = np.zeros((1, 8), np.float32) + 0.1
    end = np.zeros((1, 8), np.float32) + 0.1
    start[0, 2] = start[0, 5] = 0.3
    end[0, 3] = end[0, 6] = 0.3
    pred, _ = span_decode(jnp.array(start), jnp.array(end))
    want_pred, _ = torch_oracle(start, end)
    np.testing.assert_array_equal(np.asarray(pred), want_pred)


def test_decode_paths_agree(rng):
    B, T = 8, 64
    start = softmax_np(rng.randn(B, T))
    end = softmax_np(rng.randn(B, T))
    p1, s1 = span_decode(jnp.array(start), jnp.array(end))
    p2, s2 = span_decode_matrix(jnp.array(start), jnp.array(end))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_end_geq_start(rng):
    B, T = 32, 50
    start = softmax_np(rng.randn(B, T) * 3)
    end = softmax_np(rng.randn(B, T) * 3)
    pred, _ = span_decode(jnp.array(start), jnp.array(end))
    pred = np.asarray(pred)
    assert (pred[:, 1] >= pred[:, 0]).all()


def test_compute_mean_iou_vs_oracle(rng):
    B = 20
    pred = np.sort(rng.rand(B, 2) * 30, axis=1).astype(np.float32)
    gt = np.sort(rng.rand(B, 2) * 30, axis=1).astype(np.float32)
    got = float(compute_mean_iou(jnp.array(pred), jnp.array(gt)))
    inter = np.clip(np.minimum(pred[:, 1], gt[:, 1]) - np.maximum(pred[:, 0], gt[:, 0]), 0, None)
    union = np.maximum(pred[:, 1], gt[:, 1]) - np.minimum(pred[:, 0], gt[:, 0])
    want = float(np.mean(inter / (union + 1e-4)))
    assert got == pytest.approx(want, rel=1e-5)
