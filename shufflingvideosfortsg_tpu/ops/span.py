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


def span_topk(start_prob: jnp.ndarray, end_prob: jnp.ndarray, k: int,
              row_block: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k (start, end) spans with end >= start by start+end score.

    Beyond-parity extension (the reference decodes only the argmax span,
    grounding/loss.py:53-70); used for R@k evaluation and multi-proposal
    serving. Runs blockwise over start rows so peak memory is
    O(B * row_block * T) instead of the O(B * T^2) full matrix — at the
    T=1024 serving shape the full f32 matrix would be 4 MB/query; a
    64-row block is 256 KB/query regardless of T.

    Invalid cells (end < start) score -inf, so for k larger than the number
    of valid spans the tail is (-inf, [0, 0]). (``span_decode`` instead
    replicates the reference's 0-fill quirk for its degenerate all-zero
    case; softmax outputs are positive so the two agree at k=1 on any real
    model output — asserted in tests.)

    Returns (spans [B, k, 2] int32, scores [B, k] f32), sorted by score
    descending; ties broken by smaller flattened start*T+end index (the
    row-major order of the reference's matrix formulation).
    """
    start_prob = start_prob.astype(jnp.float32)
    end_prob = end_prob.astype(jnp.float32)
    B, T = start_prob.shape
    k = int(k)
    row_block = max(1, min(int(row_block), T))
    n_blocks = -(-T // row_block)
    pad_t = n_blocks * row_block
    neg_inf = jnp.float32(-jnp.inf)
    start_pad = jnp.pad(start_prob, ((0, 0), (0, pad_t - T)),
                        constant_values=-jnp.inf)
    j_idx = jnp.arange(T, dtype=jnp.int32)

    def body(carry, i0):
        c_scores, c_flat = carry  # [B, k] desc, ties by flat asc
        rows = jax.lax.dynamic_slice(start_pad, (0, i0 * row_block),
                                     (B, row_block))
        i_idx = i0 * row_block + jnp.arange(row_block, dtype=jnp.int32)
        blk = rows[:, :, None] + end_prob[:, None, :]  # [B, Rb, T]
        valid = j_idx[None, :] >= i_idx[:, None]       # [Rb, T]
        blk = jnp.where(valid[None], blk, neg_inf)
        flat_local = (i_idx[:, None] * T + j_idx[None, :]).reshape(-1)
        kk = min(k, row_block * T)
        b_scores, b_pos = jax.lax.top_k(blk.reshape(B, -1), kk)
        b_flat = flat_local[b_pos]
        if kk < k:
            b_scores = jnp.pad(b_scores, ((0, 0), (0, k - kk)),
                               constant_values=-jnp.inf)
            b_flat = jnp.pad(b_flat, ((0, 0), (0, k - kk)))
        # Merge: carry candidates precede block candidates, so equal scores
        # resolve to the earlier (smaller-flat) entry under top_k's
        # first-occurrence tie rule; the carry invariant is inductive.
        m_scores = jnp.concatenate([c_scores, b_scores], axis=1)
        m_flat = jnp.concatenate([c_flat, b_flat], axis=1)
        c_scores, m_pos = jax.lax.top_k(m_scores, k)
        c_flat = jnp.take_along_axis(m_flat, m_pos, axis=1)
        return (c_scores, c_flat), None

    init = (jnp.full((B, k), -jnp.inf, dtype=jnp.float32),
            jnp.zeros((B, k), dtype=jnp.int32))
    (scores, flat), _ = jax.lax.scan(body, init,
                                     jnp.arange(n_blocks, dtype=jnp.int32))
    ok = jnp.isfinite(scores)
    flat = jnp.where(ok, flat, 0)
    spans = jnp.stack([flat // T, flat % T], axis=-1).astype(jnp.int32)
    return spans, scores


def span_topk_nms(start_prob: jnp.ndarray, end_prob: jnp.ndarray, k: int,
                  iou_threshold: float = 0.5, pool: int = 0,
                  row_block: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k spans after greedy non-maximum suppression.

    Exact top-k proposals are often near-duplicates of the argmax span
    (adjacent cells of the score matrix); for meaningful R@k each proposal
    should be a distinct moment hypothesis. Greedy NMS over a candidate
    pool (default 8*k highest-scoring spans): repeatedly take the best
    remaining candidate and suppress candidates with temporal IoU >
    ``iou_threshold`` against it. If suppression exhausts the pool the tail
    repeats the last kept span (score -inf), so R@k can only improve with k.

    Returns (spans [B, k, 2] int32, scores [B, k] f32).
    """
    pool = int(pool) if pool else 8 * int(k)
    cand, cand_scores = span_topk(start_prob, end_prob, pool, row_block)
    return _greedy_nms(cand, cand_scores, int(k), float(iou_threshold))


def _greedy_nms(cand: jnp.ndarray, cand_scores: jnp.ndarray, k: int,
                iou_threshold: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over [B, P, 2] candidates sorted by score desc."""
    B, P, _ = cand.shape
    s = cand[..., 0].astype(jnp.float32)
    e = cand[..., 1].astype(jnp.float32)

    def select(carry, _):
        alive, = carry
        score_alive = jnp.where(alive, cand_scores, -jnp.inf)
        best = jnp.argmax(score_alive, axis=1)  # first occurrence = best rank
        best_score = jnp.take_along_axis(score_alive, best[:, None], 1)[:, 0]
        bs = jnp.take_along_axis(s, best[:, None], 1)
        be = jnp.take_along_axis(e, best[:, None], 1)
        inter = jnp.maximum(
            jnp.minimum(e, be) - jnp.maximum(s, bs), 0.0)
        union = (e - s) + (be - bs) - inter
        iou = inter / (union + DELTA)
        alive = alive & (iou <= iou_threshold)
        # The selected candidate is always consumed: a zero-length span
        # ([t, t]) has self-IoU 0/(0+DELTA) = 0 and would otherwise stay
        # alive and be re-selected on every subsequent step.
        alive = alive & (jnp.arange(P)[None, :] != best[:, None])
        span = jnp.concatenate([bs, be], axis=1).astype(jnp.int32)
        return (alive,), (span, best_score)

    alive0 = jnp.isfinite(cand_scores)
    (_,), (spans, scores) = jax.lax.scan(select, (alive0,), None, length=k)
    spans = jnp.swapaxes(spans, 0, 1)   # [B, k, 2]
    scores = jnp.swapaxes(scores, 0, 1)
    # Exhausted pool: repeat the last kept span with -inf score.
    ok = jnp.isfinite(scores)
    last_ok = jnp.maximum(jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1, 0)
    spans = jnp.take_along_axis(spans, last_ok[..., None], axis=1)
    return spans, scores


def iou_per_sample(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-sample temporal IoU of [B, 2] (s, e) segments, shape [B]
    (loss.py:72-91 semantics: non-negative intersection, union + 1e-4,
    no union clamp)."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    inter = jnp.minimum(pred[:, 1], gt[:, 1]) - jnp.maximum(pred[:, 0], gt[:, 0])
    inter = jnp.maximum(inter, 0.0)
    union = jnp.maximum(pred[:, 1], gt[:, 1]) - jnp.minimum(pred[:, 0], gt[:, 0])
    return inter / (union + DELTA)


def compute_mean_iou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean temporal IoU of [B, 2] (s, e) segments."""
    return jnp.mean(iou_per_sample(pred, gt))
