"""Golden-file regression: our evaluator must reproduce the reference's
bundled eval logs exactly (reference: grounding/ckp/*/test.log)."""

import json
import os

import numpy as np
import pytest

from shufflingvideosfortsg_tpu.eval.iou import (
    evaluate_predictions, retrieval_eval, segment_iou, batched_segment_iou)

GOLDEN = {
    "charades_cd": {
        "file": "grounding/ckp/charades_cd/prediction_results_test_ood.json",
        "mIoU": 44.28,
        "R1": [75.35, 63.85, 46.84, 27.47, 6.64],
        "n": 3375,
    },
    "anet_cd": {
        "file": "grounding/ckp/anet_cd/prediction_results_test_ood.json",
        "mIoU": 30.21,
        "R1": [66.05, 42.14, 24.58, 13.47, 4.52],
        "n": 13578,
    },
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_metrics(reference_root, name):
    spec = GOLDEN[name]
    path = os.path.join(reference_root, spec["file"])
    if not os.path.isfile(path):
        pytest.skip(f"golden file missing: {path}")
    metrics = retrieval_eval(path, quiet=True)
    assert metrics["mIoU"] == spec["mIoU"]
    for t, want in zip((0.1, 0.3, 0.5, 0.7, 0.9), spec["R1"]):
        assert metrics[f"R1@{t}"] == want
    assert metrics["num_sentences"] == spec["n"]


def test_segment_iou_basics():
    target = np.array([2.0, 6.0])
    cands = np.array([[2.0, 6.0], [0.0, 2.0], [4.0, 8.0], [10.0, 12.0]])
    iou = segment_iou(target, cands)
    assert iou[0] == pytest.approx(4.0 / 4.0001, abs=1e-9)
    assert iou[1] == pytest.approx(0.0)
    assert iou[2] == pytest.approx(2.0 / 6.0001, abs=1e-9)
    assert iou[3] == pytest.approx(0.0)


def test_batched_matches_single():
    rs = np.random.RandomState(7)
    gts = np.sort(rs.rand(50, 2) * 30, axis=1)
    preds = np.sort(rs.rand(50, 2) * 30, axis=1)
    batched = batched_segment_iou(gts, preds)
    single = np.array([segment_iou(g, p[None, :])[0] for g, p in zip(gts, preds)])
    np.testing.assert_allclose(batched, single, rtol=1e-12)


def test_strict_threshold_semantics():
    # R@1 counts iou strictly greater than the threshold (IoU_eval.py:138).
    pred = {
        "version": "V0",
        "external_data": {},
        "results": {
            "v1": [{"timestamp": [0.0, 1.0], "gt_timestamp": [0.0, 1.0],
                    "sentence": "", "score": 1, "video_duration": 1.0}],
        },
    }
    m = evaluate_predictions(pred, tiou_thresholds=(1.0 / 1.0001,))
    # IoU == 1/1.0001 exactly -> not strictly greater -> recall 0
    assert m["recall_fractions"][0] == 0.0
