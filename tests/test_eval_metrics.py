"""COCO-style mAP evaluator: hand-computed cases + CLI smoke.

The evaluator is dependency-free (no pycocotools); these tests pin the
protocol details — greedy score-ordered matching, 101-point interpolated
AP, per-threshold averaging — against values computed by hand.
"""

import numpy as np
import pytest

from realtime_analytics_tpu.eval import (
    DetectionSample,
    average_precision,
    evaluate_detections,
    match_detections,
)


def box(x, y, w=10.0, h=10.0):
    return [x, y, x + w, y + h]


def test_perfect_detections_map_one():
    gt = np.array([box(0, 0), box(100, 100)], np.float32)
    s = DetectionSample(
        det_boxes=gt.copy(),
        det_scores=np.array([0.9, 0.8]),
        det_classes=np.array([0, 1]),
        gt_boxes=gt,
        gt_classes=np.array([0, 1]),
    )
    m = evaluate_detections([s])
    assert m["map"] == pytest.approx(1.0)
    assert m["map50"] == pytest.approx(1.0)
    assert m["map75"] == pytest.approx(1.0)


def test_ap_hand_computed_tp_fp_tp():
    # 2 GT; detections by score: TP, FP, TP
    # recall [0.5, 0.5, 1.0]; precision [1, 0.5, 2/3] -> envelope [1, 2/3, 2/3]
    # 101-pt AP = (51 * 1 + 50 * 2/3) / 101
    ap = average_precision(
        tp=np.array([True, False, True]),
        scores=np.array([0.9, 0.8, 0.7]),
        n_gt=2,
    )
    assert ap == pytest.approx((51 + 50 * 2 / 3) / 101, abs=1e-9)


def test_ap_no_detections_is_zero_and_no_gt_is_nan():
    assert average_precision(np.zeros((0,), bool), np.zeros((0,)), 3) == 0.0
    assert np.isnan(average_precision(np.array([True]), np.array([0.9]), 0))


def test_greedy_matching_one_gt_per_detection():
    gt = np.array([box(0, 0)], np.float32)
    dets = np.array([box(0, 0), box(1, 1)], np.float32)  # both overlap the GT
    tp = match_detections(dets, np.array([0.9, 0.8]), gt, 0.5)
    assert tp.tolist() == [True, False]  # second det can't reuse the GT


def test_greedy_matching_prefers_best_iou():
    gt = np.array([box(0, 0), box(6, 0)], np.float32)
    # one detection halfway: IoU higher with gt[0]
    d = np.array([box(1, 0)], np.float32)
    tp = match_detections(d, np.array([0.9]), gt, 0.3)
    assert tp.tolist() == [True]


def test_localization_quality_separates_map50_from_map75():
    gt = np.array([[0, 0, 10, 10]], np.float32)
    # shifted box: IoU = (8*10) / (2*10*10 - 80) = 80/120 = 0.667
    s = DetectionSample(
        det_boxes=np.array([[2, 0, 12, 10]], np.float32),
        det_scores=np.array([0.9]),
        det_classes=np.array([0]),
        gt_boxes=gt,
        gt_classes=np.array([0]),
    )
    m = evaluate_detections([s])
    assert m["map50"] == pytest.approx(1.0)
    assert m["map75"] == pytest.approx(0.0)
    # thresholds 0.5, 0.55, 0.6, 0.65 pass (4 of 10)
    assert m["map"] == pytest.approx(0.4)


def test_classes_without_gt_are_excluded_from_map():
    gt = np.array([box(0, 0)], np.float32)
    s = DetectionSample(
        det_boxes=np.array([box(0, 0), box(50, 50)], np.float32),
        det_scores=np.array([0.9, 0.8]),
        det_classes=np.array([0, 7]),  # class 7 has no GT anywhere
        gt_boxes=gt,
        gt_classes=np.array([0]),
    )
    m = evaluate_detections([s])
    assert m["map"] == pytest.approx(1.0)  # class 7 (no GT) excluded
    assert np.isnan(m["per_class"][7]["ap"])


def test_aggregation_across_images():
    gt = np.array([box(0, 0)], np.float32)
    hit = DetectionSample(
        det_boxes=gt.copy(), det_scores=np.array([0.9]),
        det_classes=np.array([0]), gt_boxes=gt, gt_classes=np.array([0]),
    )
    miss = DetectionSample(gt_boxes=gt, gt_classes=np.array([0]))
    m = evaluate_detections([hit, miss])
    # recall tops out at 0.5 with perfect precision:
    # 101-pt AP = 51/101
    assert m["map50"] == pytest.approx(51 / 101)
    assert m["n_images"] == 2 and m["n_gt"] == 2


def test_eval_cli_synthetic_smoke():
    """Full CLI path: synthetic labeled frames through a real (random-init)
    engine on the CPU backend; metrics come out well-formed."""
    import json

    from realtime_analytics_tpu.scripts.eval_detections import main

    out = []
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "--model-path", "/nonexistent-random-init.pt",
            "--synthetic", "4",
            "--synthetic-hw", "64", "96",
            "--input-size", "64", "64",
            "--batch", "4",
            "--json",
        ])
    assert rc == 0
    metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
    out.append(metrics)
    assert metrics["n_images"] == 4
    assert metrics["n_gt"] == 16  # 4 boxes per synthetic frame
    assert 0.0 <= (metrics["map"] if metrics["map"] == metrics["map"] else 0.0) <= 1.0
