"""Span decoding and IoU statistics, fully vectorized for TPU.

The reference decodes a span by materializing the B×T×T upper-triangular
``start_i + end_j`` matrix and taking a row-max then column-max with
first-occurrence tie-breaking on CPU (reference: grounding/loss.py:53-70).

Here the same decode runs in O(T) per sample: for each start index i the
best end is the *suffix* maximum of ``end_prob`` (first occurrence), so the
T×T matrix never exists. ``span_decode_matrix`` keeps the quadratic
formulation for cross-checking; both reproduce the reference's tie-breaking
exactly (torch CPU ``max(dim)`` returns the first maximal index, as does
``jnp.argmax``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DELTA = 1e-4


def _suffix_max_and_first_argmax(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per row: M[i] = max_{j>=i} x[j]; A[i] = smallest j>=i attaining M[i].

    x: [B, T]. Uses two reversed cumulative scans (O(T)).
    """
    B, T = x.shape
    rev = x[:, ::-1]
    M = jax.lax.cummax(rev, axis=1)[:, ::-1]
    # i attains its own suffix max  <=>  x[i] == M[i]; the first such j >= i
    # is the first-occurrence argmax of the suffix (proof: an earlier hit in
    # [i, p) would itself attain M[i], contradicting minimality of p).
    hit = x >= M  # == M, written >= for float safety (x <= M always)
    idx = jnp.where(hit, jnp.arange(T, dtype=jnp.int32)[None, :], jnp.int32(T))
    A = jax.lax.cummin(idx[:, ::-1], axis=1)[:, ::-1]
    return M, A


def span_decode(start_prob: jnp.ndarray, end_prob: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best (start, end) span with end >= start, maximizing start+end prob.

    Returns (pred [B, 2] int32, score [B] float) with the reference's exact
    tie-breaking (loss.py:53-70): per-row first-occurrence max over end, then
    first-occurrence max over start rows.
    """
    start_prob = start_prob.astype(jnp.float32)
    end_prob = end_prob.astype(jnp.float32)
    B, T = start_prob.shape
    M, A = _suffix_max_and_first_argmax(end_prob)
    row_max = start_prob + M  # [B, T]
    # Degenerate exactness: the reference zero-fills below the diagonal, so a
    # row whose true entries are all exactly 0 reports index 0 (first zero)
    # for rows i > 0. Softmax outputs are positive, so this matters only for
    # pathological inputs, but we replicate it.
    i_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    row_idx = jnp.where((row_max <= 0) & (i_idx > 0), jnp.int32(0), A)
    best_start = jnp.argmax(row_max, axis=1).astype(jnp.int32)  # first occurrence
    score = jnp.take_along_axis(row_max, best_start[:, None], axis=1)[:, 0]
    best_end = jnp.take_along_axis(row_idx, best_start[:, None], axis=1)[:, 0]
    pred = jnp.stack([best_start, best_end], axis=-1)
    return pred, score


def span_decode_matrix(start_prob: jnp.ndarray, end_prob: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quadratic cross-check: materializes the triu start_i+end_j matrix."""
    start_prob = start_prob.astype(jnp.float32)
    end_prob = end_prob.astype(jnp.float32)
    B, T = start_prob.shape
    mat = start_prob[:, :, None] + end_prob[:, None, :]
    tri = jnp.triu(jnp.ones((T, T), dtype=bool))
    mat = jnp.where(tri[None], mat, 0.0)
    row_max = jnp.max(mat, axis=2)
    row_idx = jnp.argmax(mat, axis=2).astype(jnp.int32)
    best_start = jnp.argmax(row_max, axis=1).astype(jnp.int32)
    score = jnp.take_along_axis(row_max, best_start[:, None], axis=1)[:, 0]
    best_end = jnp.take_along_axis(row_idx, best_start[:, None], axis=1)[:, 0]
    return jnp.stack([best_start, best_end], axis=-1), score


def compute_mean_iou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean temporal IoU of [B, 2] (s, e) segments (loss.py:72-91 semantics:
    non-negative intersection, union + 1e-4, no union clamp)."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    inter = jnp.minimum(pred[:, 1], gt[:, 1]) - jnp.maximum(pred[:, 0], gt[:, 0])
    inter = jnp.maximum(inter, 0.0)
    union = jnp.maximum(pred[:, 1], gt[:, 1]) - jnp.minimum(pred[:, 0], gt[:, 0])
    return jnp.mean(inter / (union + DELTA))
