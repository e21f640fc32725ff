"""End-to-end train -> serve -> evaluate integration.

Ties three subsystems together: the in-framework training CLI
(scripts/train.py) on labeled synthetic video, the serving engine loading
the resulting .npz pytree, and the COCO-style evaluator
(eval/detection_metrics.py). The reference has no counterpart for any of
the three (inference-only, no tests, no evaluator) — this guards the
whole loop the TPU build added.
"""

import numpy as np

from realtime_analytics_tpu.config import DetectorConfig
from realtime_analytics_tpu.engine.detector import JaxYoloEngine
from realtime_analytics_tpu.eval.detection_metrics import (
    DetectionSample,
    evaluate_detections,
)
from realtime_analytics_tpu.ingest.synthetic import SyntheticSource


def _engine(path: str) -> JaxYoloEngine:
    return JaxYoloEngine(DetectorConfig(
        model_path=path, model_type="yolov8", num_classes=4,
        input_size=[64, 64], warmup=False, precision="fp32",
        max_batch_size=1, batch_buckets=[1], pre_nms_topk=64,
        max_detections=8, confidence_threshold=0.05,
    ))


def _eval_map(eng: JaxYoloEngine, seed: int = 7, frames: int = 12) -> dict:
    src = SyntheticSource(width=64, height=64, boxes=2, seed=seed)
    samples = []
    for _ in range(frames):
        ok, frame, gt, cls = src.read_labeled()
        assert ok
        br = eng.predict_arrays(frame[None])
        nv = int(br.num_valid[0])
        samples.append(DetectionSample(
            det_boxes=br.boxes_xyxy[0, :nv],
            det_scores=br.scores[0, :nv],
            det_classes=br.class_ids[0, :nv],
            gt_boxes=np.asarray(gt),
            gt_classes=np.asarray(cls),
        ))
    return evaluate_detections(samples)


def test_training_lifts_map_over_random_init(tmp_path):
    from realtime_analytics_tpu.scripts.train import main

    out = tmp_path / "trained.npz"
    rc = main([
        "--steps", "400", "--batch", "4", "--nc", "4",
        "--boxes-per-image", "2", "--input-size", "64", "64",
        "--log-every", "100", "--out", str(out), "--seed", "1",
    ])
    assert rc == 0

    trained = _eval_map(_engine(str(out)))
    random_init = _eval_map(_engine("__random__.pt"))
    # 400 synthetic steps reach mAP50 ~0.1+; random init detects nothing
    assert trained["map50"] >= 0.05, trained
    assert random_init["map50"] <= 0.01, random_init
    assert trained["map50"] > random_init["map50"] + 0.04
