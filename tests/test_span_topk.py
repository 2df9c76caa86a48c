"""Top-k span decode (beyond-parity): blockwise exact top-k vs a NumPy
full-matrix oracle (including tie order), k=1 agreement with span_decode,
and greedy-NMS invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from shufflingvideosfortsg_tpu.ops.span import (
    span_decode, span_topk, span_topk_nms)


def softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)).astype(np.float32)


def topk_oracle(start, end, k):
    """Full-matrix NumPy top-k: scores desc, ties by flat row-major index."""
    B, T = start.shape
    mat = start[:, :, None].astype(np.float64) + end[:, None, :]
    i, j = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    mat = np.where(j >= i, mat, -np.inf)
    flat = mat.reshape(B, -1)
    # stable sort on -score keeps flat-index ascending among ties
    order = np.argsort(-flat, axis=1, kind="stable")[:, :k]
    scores = np.take_along_axis(flat, order, axis=1)
    spans = np.stack([order // T, order % T], axis=-1)
    spans = np.where(np.isfinite(scores)[..., None], spans, 0)
    return spans.astype(np.int32), scores.astype(np.float32)


@pytest.mark.parametrize("T,block", [(8, 3), (50, 64), (128, 32), (240, 64)])
def test_topk_matches_oracle(rng, T, block):
    B, k = 6, 5
    start = softmax_np(rng.randn(B, T) * 2)
    end = softmax_np(rng.randn(B, T) * 2)
    spans, scores = span_topk(jnp.array(start), jnp.array(end), k, block)
    want_spans, want_scores = topk_oracle(start, end, k)
    np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(spans), want_spans)


def test_topk_tie_order_matches_oracle():
    # integer-valued probs force exact score ties across many cells
    B, T, k = 3, 12, 8
    rng = np.random.RandomState(7)
    start = rng.randint(0, 3, (B, T)).astype(np.float32)
    end = rng.randint(0, 3, (B, T)).astype(np.float32)
    spans, scores = span_topk(jnp.array(start), jnp.array(end), k, row_block=5)
    want_spans, want_scores = topk_oracle(start, end, k)
    np.testing.assert_array_equal(np.asarray(scores), want_scores)
    np.testing.assert_array_equal(np.asarray(spans), want_spans)


def test_topk_k1_equals_span_decode(rng):
    B, T = 16, 64
    start = softmax_np(rng.randn(B, T) * 3)
    end = softmax_np(rng.randn(B, T) * 3)
    spans, scores = span_topk(jnp.array(start), jnp.array(end), 1)
    pred, score = span_decode(jnp.array(start), jnp.array(end))
    np.testing.assert_array_equal(np.asarray(spans)[:, 0], np.asarray(pred))
    np.testing.assert_allclose(np.asarray(scores)[:, 0], np.asarray(score),
                               rtol=1e-6)


def test_topk_k_exceeds_valid_spans():
    # T=3 has 6 valid spans; ask for 10
    start = softmax_np(np.arange(3, dtype=np.float32)[None])
    end = softmax_np(np.arange(3, dtype=np.float32)[None])
    spans, scores = span_topk(jnp.array(start), jnp.array(end), 10, 2)
    scores = np.asarray(scores)
    spans = np.asarray(spans)
    assert np.isfinite(scores[0, :6]).all()
    assert not np.isfinite(scores[0, 6:]).any()
    assert (spans[0, 6:] == 0).all()
    assert (spans[0, :6, 1] >= spans[0, :6, 0]).all()


def test_nms_suppresses_overlaps(rng):
    B, T, k = 8, 64, 5
    start = softmax_np(rng.randn(B, T) * 3)
    end = softmax_np(rng.randn(B, T) * 3)
    spans, scores = span_topk_nms(jnp.array(start), jnp.array(end), k,
                                  iou_threshold=0.5)
    spans = np.asarray(spans, dtype=np.float64)
    scores = np.asarray(scores)
    # top-1 of NMS == argmax span
    pred, _ = span_decode(jnp.array(start), jnp.array(end))
    np.testing.assert_array_equal(spans[:, 0].astype(np.int32),
                                  np.asarray(pred))
    # kept spans are mutually below the IoU threshold
    for b in range(B):
        kept = [spans[b, i] for i in range(k) if np.isfinite(scores[b, i])]
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                s1, e1 = kept[i]
                s2, e2 = kept[j]
                inter = max(0.0, min(e1, e2) - max(s1, s2))
                union = (e1 - s1) + (e2 - s2) - inter
                assert inter / (union + 1e-4) <= 0.5 + 1e-6
    # scores are non-increasing over the finite prefix
    for b in range(B):
        fin = scores[b][np.isfinite(scores[b])]
        assert (np.diff(fin) <= 1e-6).all()


def test_nms_zero_length_best_is_consumed():
    """A zero-length best span ([t, t], self-IoU 0/(0+DELTA)=0) must still
    be consumed by the greedy loop, not re-selected on every step."""
    T = 16
    start = np.full((1, T), 1e-3, np.float32)
    end = np.full((1, T), 1e-3, np.float32)
    start[0, 5] = 0.9   # argmax span is exactly [5, 5]
    end[0, 5] = 0.9
    start[0, 1] = 0.5
    end[0, 12] = 0.5
    spans, scores = span_topk_nms(jnp.array(start), jnp.array(end), k=4,
                                  iou_threshold=0.5)
    spans = np.asarray(spans)
    scores = np.asarray(scores)
    assert (spans[0, 0] == [5, 5]).all()
    # finite-score proposals are all distinct (s, e) cells
    fin = [tuple(spans[0, i]) for i in range(4) if np.isfinite(scores[0, i])]
    assert len(fin) >= 2
    assert len(set(fin)) == len(fin)


def test_nms_exhausted_pool_repeats_last():
    # One dominant span; tiny pool so suppression exhausts it.
    T = 16
    start = np.full((1, T), 1e-3, np.float32)
    end = np.full((1, T), 1e-3, np.float32)
    start[0, 2] = 0.9
    end[0, 10] = 0.9
    spans, scores = span_topk_nms(jnp.array(start), jnp.array(end), k=4,
                                  iou_threshold=0.99, pool=3)
    spans = np.asarray(spans)
    scores = np.asarray(scores)
    assert np.isfinite(scores[0, 0])
    # tail entries repeat a previously kept span with -inf score
    last_fin = np.max(np.where(np.isfinite(scores[0]))[0])
    for i in range(last_fin + 1, 4):
        assert not np.isfinite(scores[0, i])
        assert (spans[0, i] == spans[0, last_fin]).all()


def test_evaluate_topk_rows():
    """R@k evaluator: hand-built predictions where rank 2 rescues a miss."""
    from shufflingvideosfortsg_tpu.eval.iou import (evaluate_predictions,
                                                    evaluate_topk)
    pred_dict = {
        "version": "V0", "external_data": {},
        "results": {
            "v1": [
                {"sentence": "a", "timestamp": [10.0, 20.0],
                 "gt_timestamp": [10.0, 20.0], "score": 1.0,
                 "video_duration": 30.0,
                 "timestamps_topk": [[10.0, 20.0], [0.0, 5.0]],
                 "scores_topk": [1.0, 0.5]},
                {"sentence": "b", "timestamp": [0.0, 5.0],
                 "gt_timestamp": [10.0, 20.0], "score": 1.0,
                 "video_duration": 30.0,
                 "timestamps_topk": [[0.0, 5.0], [10.0, 20.0]],
                 "scores_topk": [1.0, 0.5]},
            ],
        },
    }
    base = evaluate_predictions(pred_dict)
    rows = evaluate_topk(pred_dict)
    assert sorted(rows) == [1, 2]
    # rank-1 row reproduces the standard table
    assert rows[1]["mIoU"] == base["mIoU"]
    for t in (0.1, 0.3, 0.5, 0.7, 0.9):
        assert rows[1][f"R1@{t}"] == base[f"R1@{t}"]
    # sentence b's rank-2 proposal is exact: R2@0.9 = 100, oracle mIoU = 100
    assert rows[2]["R2@0.9"] == 100.0
    assert rows[2]["mIoU"] == 100.0
    # entries without topk fields -> no rows
    for entries in pred_dict["results"].values():
        for e in entries:
            e.pop("timestamps_topk")
            e.pop("scores_topk")
    assert evaluate_topk(pred_dict) == {}


def test_retrieval_eval_default_output_unchanged(tmp_path, capsys):
    """Without topk fields the printed table is byte-identical to the
    reference format (no extra rows)."""
    import json
    from shufflingvideosfortsg_tpu.eval.iou import retrieval_eval
    pred_dict = {
        "version": "V0", "external_data": {},
        "results": {"v": [{"sentence": "a", "timestamp": [1.0, 2.0],
                           "gt_timestamp": [1.0, 2.0], "score": 1.0,
                           "video_duration": 4.0}]},
    }
    f = tmp_path / "sub.json"
    f.write_text(json.dumps(pred_dict))
    retrieval_eval(str(f))
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    # header, ' => ', one rank row, final mIoU line — nothing else
    assert len(lines) == 5 and lines[-1].startswith("mIoU\t")
